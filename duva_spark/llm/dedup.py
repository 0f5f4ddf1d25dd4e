"""Exact deduplication via content hashing.

At 100 TB the only viable exact-dedup plan is hash → shuffle by hash →
keep one row per hash: one shuffle, map-side partial aggregation, no
sort. We hash the content (md5 here; swap for xxhash64 when cross-engine
reproducibility isn't needed — it's faster) rather than grouping by the
full text so shuffle keys are fixed-width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash(df: DataFrame, cols: list[str], out: str = "content_hash") -> DataFrame:
    """Fixed-width md5 over the concatenated (null-safe) column values."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    return df.withColumn(out, F.md5(F.concat_ws("\x1f", *parts)))


def dedup_exact(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the row with the smallest id per duplicate group.

    Deterministic (unlike dropDuplicates, which keeps an arbitrary row),
    so results are stable across runs/cluster sizes.
    """
    hashed = content_hash(df, cols)
    keep = hashed.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
    return hashed.join(keep, ["content_hash", id_col], "left_semi").drop("content_hash")


def duplicate_groups(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """(content_hash, n_dups, keeper_id) per group with ≥ 1 row."""
    return (
        content_hash(df, cols)
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
    )


def gram_keys(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 8
) -> DataFrame:
    """(id_col, gh) rows: each doc's DISTINCT word k-grams hashed to
    60-bit ints — the single definition of the gram-key contract
    (per-doc distinct via word_shingles, md5-derived 60-bit key,
    explode drops docs shorter than k words) shared by the dup-span
    pass, the novelty curve, and the repeated-n-gram censuses, and
    mirrored in SQL by the _GRAM8 macro. Grams never shuffle as
    strings."""
    from duva_spark.llm import minhash

    ws = F.split(F.col(text_col), " ")
    return df.select(
        id_col, F.explode(minhash.word_shingles(ws, k)).alias("gram")
    ).select(id_col, minhash.md5_hash60(F.col("gram")).alias("gh"))


def positional_gram_keys(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 8
) -> DataFrame:
    """(id_col, n_words, pos, gh) rows: every word k-gram of each doc
    WITH its word position (0-based), hashed to the same 60-bit key
    contract as gram_keys — positional, NOT per-doc-distinct, so span
    geometry survives. Docs shorter than k words yield no rows (the
    zip_with construction nulls every slot, all filtered)."""
    from duva_spark.llm import minhash

    ws = F.split(F.col(text_col), " ")
    # word_shingles' zip_with construction, minus the distinct: slot i
    # (0-based after posexplode) is the gram starting at word i.
    acc = ws
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(ws, j + 1, F.size(ws)), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return (
        df.select(
            id_col,
            F.size(ws).alias("n_words"),
            F.posexplode(acc).alias("pos", "gram"),
        )
        .filter(F.col("gram").isNotNull())
        .select(id_col, "n_words", "pos", minhash.md5_hash60(F.col("gram")).alias("gh"))
    )


def _dup_span_intervals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    min_df: int,
    min_span: int,
    marked_grams: DataFrame | None = None,
) -> DataFrame:
    """Shared span machinery: (id_col, span_start, span_end) per merged
    duplicated interval of at least ``min_span`` words — positions
    0-based, end inclusive. Used by dup_spans_exact (the report),
    remove_dup_spans (the transform), and contamination_spans (which
    supplies ``marked_grams``, a (gh) frame of EXTERNAL gram keys to
    mark instead of the internal >= min_df doc-frequency set)."""
    from pyspark.sql import Window

    pg = positional_gram_keys(df, id_col, text_col, k)
    if marked_grams is not None:
        # external mark sets (eval benchmarks) are tiny — broadcast the
        # probe side so the marker join never shuffles the gram stream
        dup = F.broadcast(marked_grams.select("gh").distinct())
    else:
        # doc-frequency from gram_keys, NOT from pg: word_shingles
        # dedups per doc INSIDE the array projection (array_distinct —
        # no shuffle), so the count's input is already one row per
        # (doc, gram) and goes straight into the map-side-combined
        # groupBy — the same shape dup_span_counts always used. The
        # previous form deduped the POSITIONAL stream with a full
        # (id, gh) exchange — the single largest shuffle in the plan
        # (~23 rows/doc with positions; the r6 sweep's 12×/10× spill
        # row). Trade: one extra text scan (pure codegen, pushdown-
        # prunable to the text column on a real columnar source) for
        # the elimination of that shuffle. r9 controlled A/B at 10M
        # synthetic docs, alternating forms, min-of-2 warm: old 280.3 s
        # vs new 214.7 s (1.3×) — and the synthetic input is GENERATED
        # per scan, so this still OVERCHARGES the extra scan relative
        # to a column-pruned parquet source.
        dup = (
            gram_keys(df, id_col, text_col, k)
            .groupBy("gh")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") >= min_df)
            .select("gh")
        )
    hits = pg.join(dup, "gh", "left_semi")
    return merge_covered_intervals(hits.select(id_col, "pos"), id_col, k, min_span)


def merge_covered_intervals(
    hits: DataFrame, id_col: str, unit_len: int, min_span: int
) -> DataFrame:
    """Interval union of equal-length covered units: ``hits`` is
    (id_col, pos) where each pos covers [pos, pos+unit_len-1]; returns
    merged (id_col, span_start, span_end) of at least ``min_span``
    positions. The ONE window partitions by the doc id — state bounded
    by a single document's length at any corpus size. Shared by the
    word-k-gram span family (unit_len=k) and the sentence-run family
    (unit_len=1)."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    # equal-length intervals sorted by start: the previous unit covers
    # [lag, lag+unit_len-1], so a new maximal span starts iff
    # pos > lag + unit_len (pos == lag+unit_len is adjacent → one
    # contiguous covered region)
    lagp = F.lag("pos").over(w)
    spans = hits.withColumn(
        "_new", F.when(lagp.isNull() | (F.col("pos") > lagp + unit_len), 1).otherwise(0)
    ).withColumn("span_id", F.sum("_new").over(w))
    return (
        spans.groupBy(id_col, "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + unit_len - 1).alias("span_end"),
        )
        .filter(F.col("span_end") - F.col("span_start") + 1 >= min_span)
        .drop("span_id")
    )


def dup_spans_exact(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    min_df: int = 2,
    min_span: int | None = None,
) -> DataFrame:
    """Variable-length duplicated-SPAN report — the full Lee et al. 2022
    exact-substring semantics (maximal duplicated regions, not gram
    counts), distributed without a suffix array.

    A word position is "duplicated" when its k-gram occurs in >=
    ``min_df`` distinct documents. Consecutive/overlapping duplicated
    gram intervals [pos, pos+k-1] are merged per doc (interval union);
    merged spans shorter than ``min_span`` words (the paper's 50-token
    floor; default k) are dropped. Returns per doc:
    (id_col, n_words, n_spans, covered_words, span_coverage) — TRUE span
    coverage of the union, not the gram-hit fraction dup_span_counts
    reports.

    Scale shape: positional grams travel as (doc, int pos, 60-bit gh);
    the doc-frequency count shuffles DISTINCT (doc, gh) pairs once; the
    semi-join marks duplicated positions through a hash probe (a viral
    gram streams, same argument as dup_span_counts); the interval merge
    is a lag/running-sum window partitioned by DOC id — bounded by a
    single document's length, never by corpus-wide gram frequency, so no
    hot-key partition exists at any corpus size.
    """
    if min_span is None:
        min_span = k
    per_span = _dup_span_intervals(df, id_col, text_col, k, min_df, min_span)
    agg = per_span.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("covered_words"),
    )
    all_docs = df.select(id_col, F.size(F.split(F.col(text_col), " ")).alias("n_words"))
    return all_docs.join(agg, id_col, "left").select(
        id_col,
        F.col("n_words").cast("long").alias("n_words"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("covered_words", F.lit(0)).cast("long").alias("covered_words"),
        F.round(
            F.coalesce("covered_words", F.lit(0)) * 1.0 / F.col("n_words"), 6
        ).alias("span_coverage"),
    )


def remove_dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    min_df: int = 2,
    min_span: int | None = None,
) -> DataFrame:
    """The REMOVAL pass of exact-substring dedup (Lee et al. 2022): cut
    every merged duplicated span of >= ``min_span`` words out of each
    document and return the cleaned text.

    Returns (id_col, n_words, n_words_kept, cleaned_text). Documents
    with no qualifying span pass through verbatim.

    Scale shape: span discovery is _dup_span_intervals (see
    dup_spans_exact — no hot-key partition); the per-doc interval list
    re-attaches through one join keyed on the doc id (a doc's span list
    is bounded by its own length), and the cut itself is a higher-order
    array expression over the words array — index-filtered against the
    span list inside codegen, no explode/re-aggregate round trip, so
    document reconstruction costs a projection, not a shuffle.
    """
    if min_span is None:
        min_span = k
    per_span = _dup_span_intervals(df, id_col, text_col, k, min_df, min_span)
    spans_per_doc = per_span.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    ws = F.split(F.col(text_col), " ")
    joined = df.join(spans_per_doc, id_col, "left")
    kept = F.when(F.col("_spans").isNull(), ws).otherwise(
        F.filter(
            ws,
            lambda w, i: ~F.exists(
                F.col("_spans"),
                lambda sp: (i >= sp.span_start) & (i <= sp.span_end),
            ),
        )
    )
    return joined.select(
        id_col,
        F.size(ws).cast("long").alias("n_words"),
        F.size(kept).cast("long").alias("n_words_kept"),
        F.concat_ws(" ", kept).alias("cleaned_text"),
    )


def contamination_spans(
    df: DataFrame,
    eval_grams: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    min_span: int | None = None,
) -> DataFrame:
    """Per-doc CONTAMINATED-span report: maximal regions whose word
    k-grams appear in ``eval_grams`` (a (gh) frame of held-out benchmark
    gram keys) — the span-level upgrade of the shared-gram COUNT the
    n-gram contamination check reports, telling you how much contiguous
    eval text leaked into each training doc, not just that grams match.

    Same distributed shape as dup_spans_exact, with the doc-frequency
    stage replaced by the (tiny, broadcastable) eval gram set: benchmark
    suites are minuscule next to a training corpus, so the semi-join
    probe side is a broadcast at any corpus scale.
    """
    if min_span is None:
        min_span = k
    per_span = _dup_span_intervals(
        df, id_col, text_col, k, 0, min_span, marked_grams=eval_grams
    )
    agg = per_span.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("covered_words"),
    )
    all_docs = df.select(id_col, F.size(F.split(F.col(text_col), " ")).alias("n_words"))
    return all_docs.join(agg, id_col, "left").select(
        id_col,
        F.col("n_words").cast("long").alias("n_words"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("covered_words", F.lit(0)).cast("long").alias("covered_words"),
        F.round(
            F.coalesce("covered_words", F.lit(0)) * 1.0 / F.col("n_words"), 6
        ).alias("contamination_ratio"),
    )


def dup_span_counts(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Per-document duplicated-span counts — the removal/annotation pass
    of exact-substring dedup (Lee et al. 2022, bounded to fixed-width
    word k-grams instead of suffix arrays).

    Returns (id_col, n_grams, n_dup): for each doc with >= k words, the
    number of distinct word k-grams and how many of those grams occur in
    at least ``min_df`` documents corpus-wide.

    Scale shape (shared by q_dup_span_ratio and the scale sweep): grams
    travel as 60-bit ints, never strings — one count shuffle for the
    global gram doc-frequency, one int-keyed LEFT join back carrying a
    dup marker, one per-doc aggregation. The marker join (not a window
    over gh) is deliberate: a viral boilerplate gram streams through a
    hash-join probe, where a count-over-window would buffer the whole
    hot partition group.
    """
    # word_shingles is per-doc distinct, so COUNT(*) per gh == doc freq.
    grams = gram_keys(df, id_col, text_col, k)
    dup = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("gh", F.lit(1).alias("_dup"))
    )
    return (
        grams.join(dup, "gh", "left")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.count("_dup").alias("n_dup"))
    )


def sentences_of(text_col: str, boundary: str = " the ") -> F.Column:
    """The sentence-segment array of a text column: padded text split on
    the LITERAL ``boundary``, segments trimmed, empties dropped — one
    pure projection, the single definition shared by the positional
    keys and the per-doc census. F.split takes a Java regex, so the
    boundary is \\Q..\\E-quoted: a punctuation boundary like ". "
    splits literally, matching the DuckDB oracle's string_split."""
    quoted = "\\Q" + boundary.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    segs = F.split(F.concat(F.lit(" "), F.col(text_col), F.lit(" ")), quoted)
    return F.filter(F.transform(segs, lambda s: F.trim(s)), lambda s: s != "")


def positional_sentence_keys(
    df: DataFrame, id_col: str, text_col: str = "text", boundary: str = " the "
) -> DataFrame:
    """(id_col, n_sents, pos, sh): each doc's sentence segments WITH
    their 0-based position, hashed to the same 60-bit key contract as
    gram_keys. Segmentation is a pure projection: the padded text
    splits on ``boundary`` (left-to-right non-overlapping, identical in
    Spark regex split and DuckDB string_split for a literal pattern),
    segments are trimmed and empties dropped BEFORE positions are
    assigned. The default boundary is the determiner token " the " —
    the synthetic test corpus carries no punctuation, so a common
    function word stands in for sentence-final markers; real corpora
    pass a punctuation boundary instead."""
    from duva_spark.llm import minhash

    sents = sentences_of(text_col, boundary)
    return (
        df.select(
            id_col,
            F.size(sents).alias("n_sents"),
            F.posexplode(sents).alias("pos", "sent"),
        )
        .select(id_col, "n_sents", "pos", minhash.md5_hash60(F.col("sent")).alias("sh"))
    )


def dup_sentence_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    boundary: str = " the ",
    min_df: int = 2,
    min_span: int = 1,
) -> DataFrame:
    """Sentence-granularity exact dedup report (the sentence-level
    deployment of Lee et al. 2022): a sentence is duplicated when its
    exact hash occurs in >= ``min_df`` distinct documents; maximal RUNS
    of consecutive duplicated sentences merge through the shared
    interval machinery (``merge_covered_intervals``, unit_len=1).
    Returns per doc: (id_col, n_sents, n_spans, covered_sents,
    sent_coverage).

    Scale shape: identical to dup_spans_exact with the gram stream
    replaced by the (much smaller) sentence stream — one DISTINCT-pair
    doc-frequency shuffle, a semi-join marker probe, and the one
    doc-partitioned window."""
    ps = positional_sentence_keys(df, id_col, text_col, boundary)
    dup = (
        ps.select(id_col, "sh")
        .distinct()
        .groupBy("sh")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("sh")
    )
    hits = ps.join(dup, "sh", "left_semi")
    per_span = merge_covered_intervals(hits.select(id_col, "pos"), id_col, 1, min_span)
    agg = per_span.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("covered"),
    )
    # all_docs from the source frame (a doc whose sentence array is
    # empty yields no positional rows, but must still report 0s)
    alld = df.select(
        id_col, F.size(sentences_of(text_col, boundary)).alias("n_sents")
    )
    cov = F.coalesce("covered", F.lit(0))
    return alld.join(agg, id_col, "left").select(
        id_col,
        F.col("n_sents").cast("long").alias("n_sents"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        cov.cast("long").alias("covered_sents"),
        F.when(F.col("n_sents") == 0, F.lit(0.0))
        .otherwise(F.round(cov * 1.0 / F.col("n_sents"), 6))
        .alias("sent_coverage"),
    )
