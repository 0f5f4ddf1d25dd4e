"""Oracle-checked queries for the XLSForm shaping operators (SURVEY
§2a-ii), driven over the shared testdata.

The shaping library's real domain is OnaData submission exports (unit
tests cover that with fixture CSVs, tests/test_shaping.py); here each
operator is additionally exercised through the driver's oracle gate by
synthesizing its input shape from the documents table: a space-delimited
multi-select column (built from content flags) and group-prefixed column
names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duva_spark.catalog import load_table
from duva_spark.queries import register
from duva_spark.shaping import ops

_CHOICES = ("spark", "join", "agg")

# The synthetic select-multiple: space-joined subset of _CHOICES present
# in the document text, NULL when none match (duva null semantics).
_SM_SQL = """
    NULLIF(concat_ws(' ',
        CASE WHEN list_contains(string_split(text,' '), 'spark') THEN 'spark' END,
        CASE WHEN list_contains(string_split(text,' '), 'join')  THEN 'join'  END,
        CASE WHEN list_contains(string_split(text,' '), 'agg')   THEN 'agg'   END), '')
"""


def _with_multiselect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    parts = [F.when(F.array_contains(words, c), F.lit(c)) for c in _CHOICES]
    sm = F.nullif(F.concat_ws(" ", *parts), F.lit(""))
    return docs.select("doc_id", sm.alias("topics"))


@register(
    "q_shape_split_multiple_binary",
    oracle=f"""
    WITH src AS (SELECT doc_id, {_SM_SQL} AS topics FROM documents)
    SELECT doc_id,
           CASE WHEN topics IS NOT NULL AND list_contains(string_split(topics,' '), 'spark') THEN 1 ELSE 0 END AS topics_spark,
           CASE WHEN topics IS NOT NULL AND list_contains(string_split(topics,' '), 'join')  THEN 1 ELSE 0 END AS topics_join,
           CASE WHEN topics IS NOT NULL AND list_contains(string_split(topics,' '), 'agg')   THEN 1 ELSE 0 END AS topics_agg
    FROM src
    """,
    description="Select-multiple split, binary mode (binary_select_multiples=True): one 1/0 column per declared choice.",
)
def q_shape_split_multiple_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _with_multiselect(spark, sf_dir)
    out = ops.split_select_multiple(
        src, "topics", list(_CHOICES), binary_select_multiples=True, sep="_"
    )
    return out.select(
        "doc_id",
        F.coalesce("topics_spark", F.lit(0)).alias("topics_spark"),
        F.coalesce("topics_join", F.lit(0)).alias("topics_join"),
        F.coalesce("topics_agg", F.lit(0)).alias("topics_agg"),
    )


@register(
    "q_shape_split_multiple_value",
    oracle=f"""
    WITH src AS (SELECT doc_id, {_SM_SQL} AS topics FROM documents)
    SELECT doc_id,
           CASE WHEN topics IS NOT NULL AND list_contains(string_split(topics,' '), 'spark') THEN 'Spark Core' END AS topics_spark,
           CASE WHEN topics IS NOT NULL AND list_contains(string_split(topics,' '), 'join')  THEN 'join'  END AS topics_join,
           CASE WHEN topics IS NOT NULL AND list_contains(string_split(topics,' '), 'agg')   THEN 'agg'   END AS topics_agg
    FROM src
    """,
    description="Select-multiple split, value mode with choice labels (value_select_multiples + show_choice_labels).",
)
def q_shape_split_multiple_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _with_multiselect(spark, sf_dir)
    out = ops.split_select_multiple(
        src,
        "topics",
        list(_CHOICES),
        value_select_multiples=True,
        choice_labels={"spark": "Spark Core"},
        sep="_",
    )
    return out.select("doc_id", "topics_spark", "topics_join", "topics_agg")


@register(
    "q_shape_group_flatten",
    oracle="""
    SELECT doc_id, lang AS lang, source AS source, n_chars AS n_chars
    FROM documents
    WHERE doc_id <= 200
    """,
    description="Group-name flattening (remove_group_name=True): meta/lang → lang etc.",
)
def q_shape_group_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    grouped = docs.select(
        "doc_id",
        F.col("lang").alias("meta/lang"),
        F.col("source").alias("meta/source"),
        F.col("n_chars").alias("stats/n_chars"),
    )
    return ops.flatten_group_names(grouped)


@register(
    "q_shape_labels_only",
    oracle="""
    SELECT doc_id AS "Document ID", lang AS "Language", n_chars AS "Character count"
    FROM documents
    WHERE doc_id <= 200
    """,
    description="Label substitution (include_labels_only=True): column names replaced by question labels.",
)
def q_shape_labels_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    return ops.rename_to_labels(
        docs.select("doc_id", "lang", "n_chars"),
        {"doc_id": "Document ID", "lang": "Language", "n_chars": "Character count"},
    )


@register(
    "q_shape_choice_labels",
    oracle="""
    SELECT doc_id,
           CASE lang WHEN 'en' THEN 'English' WHEN 'es' THEN 'Spanish'
                     WHEN 'fr' THEN 'French' ELSE lang END AS lang
    FROM documents
    WHERE doc_id <= 200
    """,
    description="show_choice_labels for select-one: literal-map label rendering with passthrough for unmapped values.",
)
def q_shape_choice_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    return ops.show_choice_labels(
        docs.select("doc_id", "lang"),
        "lang",
        {"en": "English", "es": "Spanish", "fr": "French"},
    )


@register(
    "q_shape_reviews_join",
    oracle="""
    SELECT d.doc_id, d.lang, r.review_status
    FROM (SELECT doc_id, lang FROM documents) d
    LEFT JOIN (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'approved' ELSE 'pending' END AS review_status
               FROM documents WHERE doc_id % 2 = 0) r
      ON d.doc_id = r.doc_id
    """,
    description="include_reviews=True: broadcast left join of review columns onto submissions.",
)
def q_shape_reviews_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    reviews = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 3 == 0, "approved").otherwise("pending").alias(
                "review_status"
            ),
        )
    )
    return ops.join_reviews(docs.select("doc_id", "lang"), reviews, key="doc_id")
