"""Shaping operators over XLSForm submission DataFrames.

Semantics per setting (SURVEY §2a-ii; reference citations inline). All
operators are pure column projections/renames — zero shuffles — except
join_reviews (a broadcast left join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_group_names(df: DataFrame, sep: str = "/") -> DataFrame:
    """remove_group_name=True: strip XLSForm group prefixes
    (``demographics/gender`` → ``gender``; app/schemas/configuration.py:9).

    On collision (two groups with a same-named child) the prefix is kept
    for the later duplicates so the result stays unambiguous.
    """
    seen: set[str] = set()
    mapping: dict[str, str] = {}
    for c in df.columns:
        short = c.rsplit(sep, 1)[-1]
        if short in seen:
            short = c  # keep qualified name on collision
        seen.add(short)
        mapping[c] = short
    return df.withColumnsRenamed(mapping)


def unflatten_groups(df: DataFrame, sep: str = "/") -> DataFrame:
    """Inverse of group flattening: ``a/b`` columns → nested struct ``a.b``
    (the ArrayType/StructType model the reference's flat CSV lacks,
    SURVEY §1.1)."""
    top: dict[str, list[str]] = {}
    plain: list[str] = []
    for c in df.columns:
        if sep in c:
            top.setdefault(c.split(sep, 1)[0], []).append(c)
        else:
            plain.append(c)
    cols = [F.col(f"`{c}`") for c in plain]
    for g, children in top.items():
        cols.append(
            F.struct(
                *[F.col(f"`{c}`").alias(c.split(sep, 1)[1]) for c in children]
            ).alias(g)
        )
    return df.select(*cols)


def rename_to_labels(df: DataFrame, labels: dict[str, str]) -> DataFrame:
    """include_labels_only=True: replace column names with question labels
    entirely (app/schemas/configuration.py:8; release note v0.0.5
    "Include question labels as headers")."""
    return df.withColumnsRenamed({c: labels[c] for c in df.columns if c in labels})


def split_select_multiple(
    df: DataFrame,
    question: str,
    choices: list[str],
    value_select_multiples: bool = True,
    binary_select_multiples: bool = False,
    choice_labels: dict[str, str] | None = None,
    sep: str = "/",
) -> DataFrame:
    """Default export behavior (do_not_split_select_multiple=False): one
    column per declared choice of a space-delimited select-multiple
    (app/schemas/configuration.py:9-14).

    Column value per mode:
    - binary_select_multiples: 1/0 int flags;
    - value_select_multiples: the choice value (or its label when
      show_choice_labels via `choice_labels`) when selected, else NULL;
    - neither: true/false.

    The choice universe comes from form metadata, NOT from the data — so
    the output schema is deterministic and stable across syncs (the
    schema-drift hazard called out in SURVEY §7).
    """
    arr = F.split(F.col(question), " ")
    selected = lambda choice: F.array_contains(arr, choice) & F.col(question).isNotNull()  # noqa: E731
    out = df
    for choice in choices:
        col_name = f"{question}{sep}{choice}"
        if binary_select_multiples:
            expr = selected(choice).cast("int")
        elif value_select_multiples:
            shown = (choice_labels or {}).get(choice, choice)
            expr = F.when(selected(choice), F.lit(shown))
        else:
            expr = selected(choice)
        out = out.withColumn(col_name, expr)
    return out


def unsplit_select_multiple(
    df: DataFrame, question: str, choices: list[str], sep: str = "/"
) -> DataFrame:
    """Inverse: per-choice columns → ArrayType column of selected values
    (the native Spark model for select-multiple, SURVEY §1.1)."""
    parts = [
        F.when(
            F.col(f"`{question}{sep}{c}`").isNotNull()
            & (F.col(f"`{question}{sep}{c}`").cast("string") != "0"),
            F.lit(c),
        )
        for c in choices
    ]
    arr = F.filter(F.array(*parts), lambda x: x.isNotNull())
    return df.withColumn(question, arr).drop(*[f"{question}{sep}{c}" for c in choices])


def show_choice_labels(df: DataFrame, question: str, labels: dict[str, str]) -> DataFrame:
    """show_choice_labels=True for select-one questions: render labels
    instead of underlying values via a literal map lookup (broadcast-free;
    app/schemas/configuration.py:13)."""
    pairs: list = []
    for value, label in labels.items():
        pairs.extend([F.lit(value), F.lit(label)])
    m = F.create_map(*pairs)
    return df.withColumn(
        question, F.coalesce(F.element_at(m, F.col(question)), F.col(question))
    )


def join_reviews(df: DataFrame, reviews: DataFrame, key: str = "_id") -> DataFrame:
    """include_reviews=True: append review status/comment/date columns via
    a broadcast left join on the submission id
    (app/schemas/configuration.py:10)."""
    return df.join(F.broadcast(reviews), on=key, how="left")


def apply_export_settings(
    df: DataFrame,
    settings,
    question_labels: dict[str, str] | None = None,
    select_multiples: dict[str, list[str]] | None = None,
    choice_labels: dict[str, dict[str, str]] | None = None,
    reviews: DataFrame | None = None,
) -> DataFrame:
    """Apply the full settings bundle in the reference's effective order:
    select-multiple split → group flatten → review join → label rename."""
    out = df
    if not settings.do_not_split_select_multiple:
        for q, choices in (select_multiples or {}).items():
            out = split_select_multiple(
                out,
                q,
                choices,
                value_select_multiples=settings.value_select_multiples,
                binary_select_multiples=settings.binary_select_multiples,
                choice_labels=(choice_labels or {}).get(q) if settings.show_choice_labels else None,
            )
    if settings.remove_group_name:
        out = flatten_group_names(out)
    if settings.include_reviews and reviews is not None:
        out = join_reviews(out, reviews)
    if settings.include_labels_only and question_labels:
        out = rename_to_labels(out, question_labels)
    return out


def attach_labels_metadata(df: DataFrame, labels: dict[str, str]) -> DataFrame:
    """include_labels=True with include_labels_only=False: keep question
    names as column names and carry the labels alongside
    (app/schemas/configuration.py:7-8 — the CSV export emits labels as an
    extra header row; the DataFrame-native equivalent is column
    metadata, which survives Parquet round-trips)."""
    out = df
    for c, label in labels.items():
        if c in out.columns:
            out = out.withMetadata(c, {"label": label})
    return out


def labels_of(df: DataFrame) -> dict[str, str]:
    """Read back attached question labels."""
    return {
        f.name: f.metadata["label"]
        for f in df.schema.fields
        if f.metadata and "label" in f.metadata
    }
