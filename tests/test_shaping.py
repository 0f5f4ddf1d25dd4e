"""Shaping operator semantics over an OnaData-style fixture (FIXTURES.md
§2): the settings matrix from app/schemas/configuration.py:6-14."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duva_spark.shaping import (
    ExportSettings,
    apply_export_settings,
    flatten_group_names,
    rename_to_labels,
    split_select_multiple,
    unsplit_select_multiple,
)
from duva_spark.shaping.ops import join_reviews, show_choice_labels, unflatten_groups


@pytest.fixture(scope="module")
def submissions(spark):
    return spark.createDataFrame(
        [
            (1, "alice", "water health", "f", "district-1"),
            (2, "bob", "edu", "m", "district-2"),
            (3, "carol", None, "f", "district-1"),
        ],
        "`_id` long, respondent string, services_used string, "
        "`demographics/gender` string, `demographics/location/district` string",
    )


CHOICES = ["water", "health", "edu"]


def test_split_binary(spark, submissions):
    out = split_select_multiple(submissions, "services_used", CHOICES, binary_select_multiples=True)
    r = {row._id: row for row in out.collect()}
    assert (r[1]["services_used/water"], r[1]["services_used/health"], r[1]["services_used/edu"]) == (1, 1, 0)
    assert r[3]["services_used/water"] == 0  # null multi-select → 0 flags


def test_split_value_and_choice_labels(spark, submissions):
    out = split_select_multiple(
        submissions,
        "services_used",
        CHOICES,
        value_select_multiples=True,
        choice_labels={"water": "Clean water"},
    )
    r = {row._id: row for row in out.collect()}
    assert r[1]["services_used/water"] == "Clean water"
    assert r[1]["services_used/edu"] is None
    assert r[2]["services_used/edu"] == "edu"


def test_split_boolean_mode(spark, submissions):
    out = split_select_multiple(
        submissions, "services_used", CHOICES,
        value_select_multiples=False, binary_select_multiples=False,
    )
    r = {row._id: row for row in out.collect()}
    assert r[1]["services_used/water"] is True
    assert r[2]["services_used/water"] is False


def test_unsplit_roundtrip(spark, submissions):
    split = split_select_multiple(submissions, "services_used", CHOICES, binary_select_multiples=True)
    back = unsplit_select_multiple(split.drop("services_used"), "services_used", CHOICES)
    r = {row._id: row["services_used"] for row in back.collect()}
    assert r[1] == ["water", "health"]
    assert r[2] == ["edu"]
    assert r[3] == []


def test_flatten_group_names(submissions):
    out = flatten_group_names(submissions)
    assert "gender" in out.columns and "district" in out.columns
    assert "demographics/gender" not in out.columns


def test_flatten_collision_keeps_qualified_name(spark):
    df = spark.createDataFrame([(1, "a", "b")], "id long, `g1/x` string, `g2/x` string")
    out = flatten_group_names(df)
    assert "x" in out.columns and "g2/x" in out.columns  # second keeps prefix


def test_unflatten_groups(submissions):
    out = unflatten_groups(submissions)
    assert "demographics" in out.columns
    row = out.filter(F.col("_id") == 1).collect()[0]
    assert row.demographics.gender == "f"


def test_rename_to_labels(submissions):
    out = rename_to_labels(submissions, {"respondent": "What is your name?"})
    assert "What is your name?" in out.columns


def test_show_choice_labels(spark):
    df = spark.createDataFrame([(1, "f"), (2, "m"), (3, "x")], "id long, gender string")
    out = show_choice_labels(df, "gender", {"f": "Female", "m": "Male"})
    vals = {r.id: r.gender for r in out.collect()}
    assert vals == {1: "Female", 2: "Male", 3: "x"}  # unmapped passes through


def test_join_reviews(spark, submissions):
    reviews = spark.createDataFrame([(1, "approved")], "`_id` long, review_status string")
    out = join_reviews(submissions, reviews)
    r = {row._id: row.review_status for row in out.collect()}
    assert r[1] == "approved" and r[2] is None


def test_apply_export_settings_default_bundle(spark, submissions):
    out = apply_export_settings(
        submissions,
        ExportSettings(binary_select_multiples=False),
        question_labels={"respondent": "Name"},
        select_multiples={"services_used": CHOICES},
        choice_labels={"services_used": {"water": "Clean water"}},
    )
    cols = out.columns
    assert "Name" in cols
    assert "gender" in cols  # groups flattened
    # split columns flattened from services_used/water → water
    assert "water" in cols
    r = {row._id: row for row in out.collect()}
    assert r[1]["water"] == "Clean water"  # value mode + choice label


def test_labels_metadata_roundtrip(spark, submissions, tmp_path):
    from duva_spark.shaping.ops import attach_labels_metadata, labels_of

    out = attach_labels_metadata(submissions, {"respondent": "What is your name?"})
    assert labels_of(out) == {"respondent": "What is your name?"}
    # survives a Parquet round-trip (label metadata is part of the schema)
    p = str(tmp_path / "labeled")
    out.write.parquet(p)
    back = spark.read.parquet(p)
    assert labels_of(back) == {"respondent": "What is your name?"}
