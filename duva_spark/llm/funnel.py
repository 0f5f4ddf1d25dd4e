"""End-to-end curation retention funnel: the composition of the
quality, repetition, dedup, and decontamination operator families into
the sequential per-stage retention report a FineWeb/RefinedWeb-style
production pipeline publishes.

Stage semantics are SEQUENTIAL: each stage's predicate is evaluated
over the survivors of the previous stage. In particular the two dedup
keepers pick the canonical (minimum-id) document AMONG SURVIVORS — a
duplicate whose canonical copy was dropped by an earlier stage is kept
through its surviving copy, not dropped with the loser (pinned by
test_pipeline_e2e.py).

Scale design: one pass — stage booleans nest (b_k = b_{k-1} & pred_k),
the keepers are conditional-MIN windows hash-partitioned by content
key, contamination is a broadcast eval-gram semi-probe, and the funnel
unpivots from a single aggregation row. No corpus-sized exchange
beyond the doc-keyed flag joins and the two keeper windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUNNEL_STAGES = (
    "ingest",
    "holdout_train_split",
    "gopher_quality",
    "gopher_repetition",
    "exact_dedup",
    "neardup_fingerprint",
    "decontaminate",
)


def curation_funnel(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Seven-stage retention funnel over ``docs``:

    ingest → 90% train holdout (doc-id hash) → Gopher structural
    quality (the battery minus the per-language stopword rule) →
    Gopher repetition battery → exact-dedup canonical keeper →
    near-dup fingerprint keeper → eval-set 8-gram decontamination.

    Returns (stage_ord, stage, docs_in, docs_out, dropped, retention,
    cum_retention) — one row per stage, retention rounded to 6 dp.
    """
    from pyspark.sql import Window

    from duva_spark.llm import minhash, textstats

    qual = textstats.gopher_flags(docs, text_col=text_col).select(
        id_col,
        # structural subset: the per-language stopword rule is excluded
        # (it zeroes a multilingual corpus; production gates it per lang)
        (
            F.col("pass_word_count")
            & F.col("pass_mean_len")
            & F.col("pass_symbol_ratio")
            & F.col("pass_alpha")
        ).alias("pass_gopher"),
    )
    rep = textstats.gopher_repetition(docs, id_col=id_col, text_col=text_col).select(
        id_col, "pass_repetition"
    )
    h = minhash.md5_hash60(F.col(id_col).cast("string")) % 100
    grams = docs.select(
        id_col,
        h.alias("h"),
        F.explode(minhash.word_shingles(F.split(F.col(text_col), " "), 8)).alias("gram"),
    ).select(id_col, "h", minhash.md5_hash60(F.col("gram")).alias("gh"))
    ev = grams.filter(F.col("h") < 10).select("gh").distinct()
    cont = (
        grams.filter(F.col("h") >= 10)
        .join(F.broadcast(ev), "gh")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    base = (
        docs.select(id_col, text_col, h.alias("h"))
        .join(qual, id_col)
        .join(rep, id_col)
        .join(cont, id_col, "left")
    )
    b2 = F.col("h") >= 10
    b3 = b2 & F.col("pass_gopher")
    b4 = b3 & F.col("pass_repetition")
    flags = base.select(
        id_col,
        F.md5(text_col).alias("ch"),
        textstats.fingerprint(F.col(text_col)).alias("fp"),
        b2.alias("b2"),
        b3.alias("b3"),
        b4.alias("b4"),
        F.coalesce("contaminated", F.lit(False)).alias("cont"),
    )
    w_ch, w_fp = Window.partitionBy("ch"), Window.partitionBy("fp")
    flags = (
        flags.withColumn(
            "b5",
            F.col("b4")
            & (F.col(id_col) == F.min(F.when(F.col("b4"), F.col(id_col))).over(w_ch)),
        )
        .withColumn(
            "b6",
            F.col("b5")
            & (F.col(id_col) == F.min(F.when(F.col("b5"), F.col(id_col))).over(w_fp)),
        )
        .withColumn("b7", F.col("b6") & ~F.col("cont"))
    )
    agg = flags.agg(
        F.count("*").alias("n1"),
        # COALESCE mirrors the oracle: on an empty corpus SUM over zero
        # rows is NULL in both engines, but the report must show 0-doc
        # stages, not NULL ones (r7 ADVICE item)
        *[
            F.coalesce(F.sum(F.col(f"b{k}").cast("long")), F.lit(0)).alias(f"n{k}")
            for k in range(2, 8)
        ],
    )
    stages = []
    for k, stage in enumerate(FUNNEL_STAGES, start=1):
        src = F.col(f"n{k - 1}" if k > 1 else "n1")
        out = F.col(f"n{k}")
        stages.append(
            F.struct(
                F.lit(k).cast("long").alias("stage_ord"),
                F.lit(stage).alias("stage"),
                src.alias("docs_in"),
                out.alias("docs_out"),
                (src - out).alias("dropped"),
                F.when(src > 0, F.round(out / src, 6)).otherwise(F.lit(0.0)).alias("retention"),
                F.when(F.col("n1") > 0, F.round(out / F.col("n1"), 6))
                .otherwise(F.lit(0.0))
                .alias("cum_retention"),
            )
        )
    return (
        agg.select(F.explode(F.array(*stages)).alias("s"))
        .select("s.*")
        .orderBy("stage_ord")
    )
