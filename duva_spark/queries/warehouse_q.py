"""Warehouse-maintenance and data-quality queries: the table-lifecycle
operations a production lakehouse runs around the analytic queries —
slowly-changing-dimension history builds, snapshot diffing (CDC), a
Deequ-style constraint suite, fuzzy entity matching, incremental
aggregate maintenance, and an iterative graph ranking (PageRank).

No counterpart in the reference (duva's sync loop is full
drop-and-recreate per `app/core/importer.py:242-246`); these are the
operators a user outgrowing that model needs first. All oracle-checked.

Scale notes per query are in each description; common principles:
row-hash comparisons use integer cents (never stringified doubles —
engine float formatting differs), every join keys on fixed-width
values, and the iterative PageRank cuts lineage with localCheckpoint
per round exactly like llm/components.py's connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from duva_spark.catalog import load_table
from duva_spark.queries import money_cents, register

# ---------------------------------------------------------------------------
# SCD Type-2 dimension history
# ---------------------------------------------------------------------------


@register(
    "q_scd2_dimension",
    oracle="""
    WITH chg AS (
      SELECT user_id, event_type, ts
      FROM (
        SELECT user_id, event_type, ts,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
      )
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type,
           ROW_NUMBER() OVER w AS version,
           CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
           CAST(floor(epoch(LEAD(ts) OVER w)) AS BIGINT) AS valid_to_s,
           LEAD(ts) OVER w IS NULL AS is_current
    FROM chg
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """,
    description=(
        "SCD Type-2 build: collapse a per-key change stream into versioned "
        "validity intervals (valid_from/valid_to half-open, is_current on the "
        "last). Two windows over one shuffle on the dimension key — the "
        "standard distributed history-build; no global sort, no collect."
    ),
)
def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "event_type", "ts")
    )
    w2 = W.partitionBy("user_id").orderBy("ts")
    return chg.select(
        "user_id",
        "event_type",
        F.row_number().over(w2).alias("version"),
        F.unix_timestamp("ts").alias("valid_from_s"),
        F.unix_timestamp(F.lead("ts").over(w2)).alias("valid_to_s"),
    ).withColumn("is_current", F.col("valid_to_s").isNull())


# ---------------------------------------------------------------------------
# Snapshot diff (CDC between two table versions)
# ---------------------------------------------------------------------------

# Row fingerprint over stable representations only: integer cents for the
# price (double→string formatting differs between engines), epoch seconds
# for the date. concat_ws('|', ...) then md5 — both engines bit-identical.
_ROWHASH = (
    "md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus, "
    "CAST(cents AS VARCHAR), CAST(floor(epoch(o_orderdate)) AS BIGINT), "
    "o_orderpriority, CAST(o_custkey AS VARCHAR)))"
)


@register(
    "q_snapshot_diff",
    oracle=f"""
    WITH base AS (
      SELECT *, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ),
    snap_a AS (SELECT *, {_ROWHASH} AS row_hash FROM base),
    snap_b_rows AS (
      -- simulated next-day snapshot: %97 keys deleted, open orders get a
      -- 500-cent fee, %89 keys re-inserted under a shifted key space
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderstatus = 'O' THEN cents + 500 ELSE cents END AS cents,
             o_orderdate, o_orderpriority, o_custkey
      FROM base WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_orderstatus, cents, o_orderdate,
             o_orderpriority, o_custkey
      FROM base WHERE o_orderkey % 89 = 0
    ),
    snap_b AS (SELECT *, {_ROWHASH} AS row_hash FROM snap_b_rows)
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           a.row_hash AS old_hash, b.row_hash AS new_hash
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL OR a.row_hash <> b.row_hash
    """,
    description=(
        "CDC snapshot diff: fingerprint every row with an md5 over stable "
        "column encodings, full-outer join two snapshots on the key, and "
        "classify added/removed/changed. One hash shuffle on the key, "
        "constant-width compare regardless of row width — the standard "
        "distributed table-diff; no window, no collect, no row explosion."
    ),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "orders").withColumn(
        "cents", money_cents(F.col("o_totalprice"))
    )

    def rowhash(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "row_hash",
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    "o_orderstatus",
                    F.col("cents").cast("string"),
                    F.floor(F.unix_timestamp("o_orderdate")).cast("long").cast("string"),
                    "o_orderpriority",
                    F.col("o_custkey").cast("string"),
                )
            ),
        )

    snap_a = rowhash(base)
    survivors = base.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "cents",
        F.when(F.col("o_orderstatus") == "O", F.col("cents") + 500).otherwise(F.col("cents")),
    )
    inserts = base.filter(F.col("o_orderkey") % 89 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10000000
    )
    snap_b = rowhash(survivors.unionByName(inserts))

    a = snap_a.select(
        F.col("o_orderkey").alias("key_a"), F.col("row_hash").alias("old_hash")
    )
    b = snap_b.select(
        F.col("o_orderkey").alias("key_b"), F.col("row_hash").alias("new_hash")
    )
    joined = a.join(b, a.key_a == b.key_b, "full_outer")
    return joined.filter(
        F.col("key_a").isNull()
        | F.col("key_b").isNull()
        | (F.col("old_hash") != F.col("new_hash"))
    ).select(
        F.coalesce("key_a", "key_b").alias("o_orderkey"),
        F.when(F.col("key_a").isNull(), "added")
        .when(F.col("key_b").isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
        "old_hash",
        "new_hash",
    )


# ---------------------------------------------------------------------------
# Data-quality constraint suite (Deequ-style)
# ---------------------------------------------------------------------------


@register(
    "q_data_quality_report",
    oracle="""
    WITH checks AS (
      SELECT 'orders' AS tbl, 'custkey_ri' AS check_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'orders', 'status_domain', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders', 'orderkey_unique', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem', 'quantity_range', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'customer', 'acctbal_nonnull', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM customer
    )
    SELECT tbl, check_name, n_rows, n_violations,
           ROUND(CAST(n_violations AS DOUBLE) / n_rows, 6) AS violation_rate
    FROM checks
    """,
    description=(
        "Deequ-style data-quality suite: referential integrity (broadcast "
        "left join + null count), domain membership, key uniqueness, range, "
        "and completeness checks, unioned into one report. Each check is a "
        "scan-local aggregate (RI broadcasts the dim); the union is five "
        "1-row frames — at 100 TB this is bounded by the fact-table scans, "
        "all map-side."
    ),
)
def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def check(df: DataFrame, tbl: str, name: str, violation) -> DataFrame:
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(violation, 1).otherwise(0)).alias("n_violations"),
        )

    ri = check(
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left",
        ),
        "orders",
        "custkey_ri",
        F.col("c_custkey").isNull(),
    )
    domain = check(
        orders, "orders", "status_domain", ~F.col("o_orderstatus").isin("O", "F", "P")
    )
    unique = orders.agg(
        F.lit("orders").alias("tbl"),
        F.lit("orderkey_unique").alias("check_name"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias("n_violations"),
    )
    qty = check(
        lineitem, "lineitem", "quantity_range", (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
    )
    complete = check(customer, "customer", "acctbal_nonnull", F.col("c_acctbal").isNull())

    report = ri.unionByName(domain).unionByName(unique).unionByName(qty).unionByName(complete)
    return report.withColumn(
        "violation_rate", F.round(F.col("n_violations").cast("double") / F.col("n_rows"), 6)
    )


# ---------------------------------------------------------------------------
# Fuzzy entity matching (blocked Levenshtein join)
# ---------------------------------------------------------------------------


@register(
    "q_fuzzy_match_names",
    oracle="""
    WITH names AS (
      SELECT split_part(p_name, ' ', 1) AS adj, split_part(p_name, ' ', 2) AS noun,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1, 2
    )
    SELECT a.noun, a.adj AS adj_a, b.adj AS adj_b,
           CAST(levenshtein(a.adj, b.adj) AS INT) AS dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b ON a.noun = b.noun AND a.adj < b.adj
    WHERE levenshtein(a.adj, b.adj) <= 2
    """,
    description=(
        "Fuzzy entity matching: collapse the corpus to distinct (token, "
        "block) keys with support counts FIRST (the cardinality killer — "
        "distinct names are tiny relative to a 100 TB corpus), then a "
        "blocked self-join on the exact block key with a Levenshtein "
        "edit-distance predicate. Pairwise work is bounded per block, never "
        "corpus-quadratic; the distinct-names frame broadcasts."
    ),
)
def q_fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy(
        F.split("p_name", " ").getItem(0).alias("adj"),
        F.split("p_name", " ").getItem(1).alias("noun"),
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    a = names.alias("a")
    b = F.broadcast(names.alias("b"))
    return (
        a.join(b, (F.col("a.noun") == F.col("b.noun")) & (F.col("a.adj") < F.col("b.adj")))
        .filter(F.levenshtein(F.col("a.adj"), F.col("b.adj")) <= 2)
        .select(
            F.col("a.noun").alias("noun"),
            F.col("a.adj").alias("adj_a"),
            F.col("b.adj").alias("adj_b"),
            F.levenshtein(F.col("a.adj"), F.col("b.adj")).alias("dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (partial-agg merge)
# ---------------------------------------------------------------------------


@register(
    "q_incremental_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
           CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 / 100.0 / COUNT(*), 4) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description=(
        "Incremental view maintenance: per-batch partial aggregates (sum/"
        "count/min/max + exact integer-cents price sum) merged by "
        "re-aggregation — the algebraic-state merge a streaming or "
        "delta-maintenance pipeline relies on. The oracle recomputes from "
        "scratch, proving merge(partials) ≡ full recompute. Exact integer "
        "sums make the merge order-independent (the sf0.1 float-drift "
        "lesson); two map-side-combined shuffles on tiny keys."
    ),
)



def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    cents = money_cents(F.col("l_extendedprice"))
    # Batch 1 / batch 2 simulate yesterday's state and today's delta.
    partial = (
        li.withColumn("batch", F.col("l_orderkey") % 2)
        .groupBy("batch", "l_returnflag")
        .agg(
            F.sum(qty).alias("p_sum_qty"),
            F.count(F.lit(1)).alias("p_n"),
            F.min(qty).alias("p_min"),
            F.max(qty).alias("p_max"),
            F.sum(cents).alias("p_cents"),
        )
    )
    merged = partial.groupBy("l_returnflag").agg(
        F.sum("p_sum_qty").alias("sum_qty"),
        F.sum("p_n").alias("n_rows"),
        F.min("p_min").alias("min_qty"),
        F.max("p_max").alias("max_qty"),
        F.sum("p_cents").alias("cents"),
    )
    return merged.select(
        "l_returnflag",
        "sum_qty",
        "n_rows",
        "min_qty",
        "max_qty",
        F.round(F.col("cents") / 100.0 / F.col("n_rows"), 4).alias("avg_price"),
    )


_SCD2_HIST_SQL = """
    WITH cur AS (
      SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
    ),
    upd AS (
      SELECT c_custkey, c_mktsegment, c_acctbal + 100.0 AS c_acctbal
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 5 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, 'NEWSEG', 0.0
      FROM customer WHERE c_custkey <= 50
    ),
    chg AS (
      SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal
      FROM upd u JOIN cur c USING (c_custkey)
      WHERE u.c_acctbal IS DISTINCT FROM c.c_acctbal
         OR u.c_mktsegment IS DISTINCT FROM c.c_mktsegment
    ),
    ins AS (
      SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal
      FROM upd u LEFT JOIN cur c USING (c_custkey)
      WHERE c.c_custkey IS NULL
    )
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
           '2024-01-01' AS valid_from, '2024-06-01' AS valid_to, 0 AS is_current
    FROM cur c JOIN chg USING (c_custkey)
    UNION ALL
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
           '2024-01-01', '9999-12-31', 1
    FROM cur c LEFT JOIN chg USING (c_custkey)
    WHERE chg.c_custkey IS NULL
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal, '2024-06-01', '9999-12-31', 1
    FROM chg
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal, '2024-06-01', '9999-12-31', 1
    FROM ins
    """


@register(
    "q_scd2_history",
    oracle=_SCD2_HIST_SQL,
    description=(
        "SCD Type-2 dimension history via operators/scd2.scd2_apply: an "
        "initial load of the customer dimension plus one update batch "
        "(acctbal changes for key%5, no-op echoes for key%7 — must NOT "
        "create versions — and 50 brand-new keys). Changed rows are "
        "closed and re-opened at the batch date, unchanged and absent "
        "rows pass through, inserts open as current — the versioned "
        "alternative to the reference's drop-and-recreate sync "
        "(app/core/importer.py:242-246), composable with the as-of join "
        "to reconstruct the dimension at any date. One full-outer join "
        "on the key + unions, everything key-partitioned; change "
        "detection is null-safe so NULL transitions version correctly."
    ),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duva_spark.operators.scd2 import scd2_apply, scd2_initial

    cust = load_table(spark, sf_dir, "customer")
    tracked = ["c_mktsegment", "c_acctbal"]
    dim = scd2_initial(
        cust.select("c_custkey", *tracked), "c_custkey", tracked, "2024-01-01"
    )
    updates = (
        cust.filter(F.col("c_custkey") % 5 == 0)
        .select(
            "c_custkey", "c_mktsegment", (F.col("c_acctbal") + 100.0).alias("c_acctbal")
        )
        .unionByName(
            cust.filter((F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 5 != 0))
            .select("c_custkey", "c_mktsegment", "c_acctbal")
        )
        .unionByName(
            cust.filter(F.col("c_custkey") <= 50).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
                F.lit(0.0).alias("c_acctbal"),
            )
        )
    )
    return scd2_apply(dim, updates, "c_custkey", tracked, "2024-06-01")


@register(
    "q_scd2_asof",
    oracle=f"""
    WITH hist AS ({_SCD2_HIST_SQL})
    SELECT asof_date, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM (
      SELECT d.asof_date, h.c_mktsegment, h.c_acctbal
      FROM hist h
      JOIN (VALUES ('2024-03-15'), ('2024-06-01')) d(asof_date)
        ON h.valid_from <= d.asof_date AND d.asof_date < h.valid_to
    )
    GROUP BY asof_date, c_mktsegment
    """,
    description=(
        "Point-in-time reconstruction over the SCD2 history: the "
        "dimension as of a date is the rows whose half-open validity "
        "window [valid_from, valid_to) contains it. Two probe dates "
        "gate the boundary semantics — one mid-window (pre-update "
        "state) and one exactly ON the batch date, where the closed "
        "versions must be excluded and the re-opened ones included "
        "(the off-by-one every hand-rolled SCD join gets wrong). ISO "
        "date strings compare lexicographically identically on both "
        "engines; exact integer-cents sums. The probe-dates side is a "
        "2-row broadcast against the key-partitioned history — the "
        "same shape a fact-to-dim temporal join takes at 100 TB with "
        "the as-of operator."
    ),
)
def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = q_scd2_history(spark, sf_dir)
    dates = spark.createDataFrame(
        [("2024-03-15",), ("2024-06-01",)], "asof_date string"
    )
    j = hist.join(
        F.broadcast(dates),
        (F.col("valid_from") <= F.col("asof_date"))
        & (F.col("asof_date") < F.col("valid_to")),
    )
    return j.groupBy("asof_date", "c_mktsegment").agg(
        F.count("*").alias("n_rows"),
        F.sum(money_cents(F.col("c_acctbal"))).cast("long").alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# PageRank (fixed-iteration, deterministic hash graph)
# ---------------------------------------------------------------------------

_PR_ITERS = 3
_PR_DAMP = 0.85


@register(
    "q_pagerank",
    oracle=f"""
    WITH nodes AS (SELECT doc_id FROM documents),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    edges AS (
      SELECT DISTINCT doc_id AS src,
             CAST('0x' || substr(md5(CAST(doc_id * 4 + i AS VARCHAR)), 1, 15) AS BIGINT)
               % (SELECT n FROM nn) AS dst
      FROM nodes CROSS JOIN (VALUES (1), (2), (3)) t(i)
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    it0 AS (SELECT doc_id AS node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM nodes),
    it1 AS (
      SELECT nd.doc_id AS node,
             CAST(0.15 AS DOUBLE) / nn.n + CAST({_PR_DAMP} AS DOUBLE) * COALESCE(c.s, 0) AS pr
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (SELECT e.dst, SUM(p.pr / d.deg) AS s
                 FROM edges e JOIN deg d ON e.src = d.src JOIN it0 p ON p.node = e.src
                 GROUP BY e.dst) c ON c.dst = nd.doc_id
    ),
    it2 AS (
      SELECT nd.doc_id AS node,
             CAST(0.15 AS DOUBLE) / nn.n + CAST({_PR_DAMP} AS DOUBLE) * COALESCE(c.s, 0) AS pr
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (SELECT e.dst, SUM(p.pr / d.deg) AS s
                 FROM edges e JOIN deg d ON e.src = d.src JOIN it1 p ON p.node = e.src
                 GROUP BY e.dst) c ON c.dst = nd.doc_id
    ),
    it3 AS (
      SELECT nd.doc_id AS node,
             CAST(0.15 AS DOUBLE) / nn.n + CAST({_PR_DAMP} AS DOUBLE) * COALESCE(c.s, 0) AS pr
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (SELECT e.dst, SUM(p.pr / d.deg) AS s
                 FROM edges e JOIN deg d ON e.src = d.src JOIN it2 p ON p.node = e.src
                 GROUP BY e.dst) c ON c.dst = nd.doc_id
    )
    SELECT node AS doc_id, ROUND(pr * 1000, 6) AS pagerank_x1000
    FROM it3
    """,
    description=(
        "PageRank, {iters} fixed iterations at d={d} over a deterministic "
        "md5-derived 3-out-regular graph on doc_ids (no dangling nodes by "
        "construction). Each round is one join-aggregate shuffle "
        "(contributions grouped by dst) plus a left join for teleport-only "
        "nodes; lineage cut with localCheckpoint per round like the "
        "connected-components operator. The oracle unrolls the same three "
        "rounds as chained CTEs — no recursion, bit-equivalent float ops."
    ).format(iters=_PR_ITERS, d=_PR_DAMP),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()  # scalar bound for the hash modulus; one cheap action

    i_col = F.explode(F.array(*[F.lit(i) for i in range(1, 4)])).alias("i")
    h = (
        F.conv(
            F.substring(F.md5((F.col("doc_id") * 4 + F.col("i")).cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        % n
    )
    edges = (
        docs.select("doc_id", i_col)
        .select(F.col("doc_id").alias("src"), h.alias("dst"))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(deg, "src").localCheckpoint()

    ranks = docs.select(F.col("doc_id").alias("node"), F.lit(1.0 / n).alias("pr"))
    for _ in range(_PR_ITERS):
        contribs = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("s"))
        )
        ranks = (
            docs.join(contribs, docs.doc_id == contribs.dst, "left")
            .select(
                F.col("doc_id").alias("node"),
                (F.lit(0.15 / n) + _PR_DAMP * F.coalesce("s", F.lit(0.0))).alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        F.col("node").alias("doc_id"), F.round(F.col("pr") * 1000, 6).alias("pagerank_x1000")
    )


@register(
    "q_triangle_count",
    oracle="""
    WITH nn AS (SELECT COUNT(*) AS n FROM documents),
    ed AS (
      SELECT doc_id AS src,
             CAST('0x' || substr(md5(CAST(doc_id * 4 + t.i AS VARCHAR)), 1, 15)
                  AS BIGINT) % (SELECT n FROM nn) AS dst
      FROM documents CROSS JOIN (VALUES (1), (2), (3)) t(i)
    ),
    und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM ed WHERE src <> dst)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
           CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges
    FROM und e1
    JOIN und e2 ON e2.a = e1.b
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    description=(
        "Triangle counting on the deterministic md5 3-out-regular graph "
        "(same generator as q_pagerank): edges orient low->high id, so "
        "each triangle is enumerated exactly once as (a<b<c) — the "
        "standard compact-forward scheme that keeps the two-hop join "
        "from exploding on high-degree nodes (each wedge is built from "
        "the low endpoint only). Two equi-join shuffles on node id; "
        "completes the graph-operator family (PageRank, connected "
        "components) with the clustering-coefficient building block."
    ),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()  # scalar modulus, same one-action bound as q_pagerank

    from duva_spark.llm.minhash import md5_hash60

    i_col = F.explode(F.array(*[F.lit(i) for i in range(1, 4)])).alias("i")
    h = md5_hash60((F.col("doc_id") * 4 + F.col("i")).cast("string")) % n
    ed = docs.select("doc_id", i_col).select(F.col("doc_id").alias("src"), h.alias("dst"))
    und = (
        ed.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    return tri.agg(F.count("*").alias("n_triangles")).crossJoin(
        und.agg(F.count("*").alias("n_edges"))
    )


@register(
    "q_k_anonymity",
    oracle="""
    SELECT c_mktsegment AS segment, c_nationkey AS nation,
           CAST(COUNT(*) AS BIGINT) AS n,
           CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS at_risk
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    """,
    description=(
        "k-anonymity audit over the quasi-identifier pair (segment, "
        "nation): any equivalence class smaller than k=5 re-identifies "
        "its members under linkage attacks — the pre-release check for "
        "any dataset leaving the warehouse, beside the GDPR delete "
        "(sinks.delete_where) and PII redaction (llm/redact.py). One "
        "count shuffle to |segments x nations| keys; at 100 TB the "
        "partial aggregation collapses the scan to a constant-size "
        "frame before it ever crosses the wire."
    ),
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy(
        F.col("c_mktsegment").alias("segment"), F.col("c_nationkey").alias("nation")
    ).agg(
        F.count("*").alias("n"),
        F.when(F.count("*") < 5, 1).otherwise(0).cast("int").alias("at_risk"),
    )


@register(
    "q_entity_resolution",
    oracle="""
    WITH RECURSIVE
    names AS (
      SELECT split_part(p_name, ' ', 1) AS adj, split_part(p_name, ' ', 2) AS noun
      FROM part GROUP BY 1, 2
    ),
    e AS (
      SELECT a.noun || '|' || a.adj AS id_a, b.noun || '|' || b.adj AS id_b
      FROM names a JOIN names b ON a.noun = b.noun AND a.adj < b.adj
      WHERE levenshtein(a.adj, b.adj) <= 2
    ),
    und AS (SELECT id_a AS a, id_b AS b FROM e UNION SELECT id_b, id_a FROM e),
    nodes AS (SELECT DISTINCT a AS id FROM und),
    r AS (
      SELECT id, id AS reach FROM nodes
      UNION
      SELECT r.id, u.b FROM r JOIN und u ON u.a = r.reach
    ),
    cc AS (SELECT id, MIN(reach) AS canonical FROM r GROUP BY id)
    SELECT id AS entity, canonical,
           COUNT(*) OVER (PARTITION BY canonical) AS n_members
    FROM cc
    """,
    description=(
        "Entity resolution end-to-end: fuzzy name matching (distinct-"
        "names-first, blocked Levenshtein <= 2) feeds the SAME "
        "connected-components engine as fuzzy dedup, producing one "
        "canonical id per transitively-linked name cluster — the "
        "master-data dedup a warehouse runs on customer/vendor names. "
        "The pair graph lives on the distinct-names frame (tiny vs the "
        "corpus), so component rounds iterate over entity cardinality, "
        "never row count."
    ),
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from duva_spark.llm.components import connected_components

    part = load_table(spark, sf_dir, "part")
    names = part.groupBy(
        F.split("p_name", " ").getItem(0).alias("adj"),
        F.split("p_name", " ").getItem(1).alias("noun"),
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    a = names.alias("a")
    b = F.broadcast(names.alias("b"))
    node = lambda side: F.concat_ws("|", F.col(f"{side}.noun"), F.col(f"{side}.adj"))  # noqa: E731
    pairs = (
        a.join(b, (F.col("a.noun") == F.col("b.noun")) & (F.col("a.adj") < F.col("b.adj")))
        .filter(F.levenshtein(F.col("a.adj"), F.col("b.adj")) <= 2)
        .select(node("a").alias("id_a"), node("b").alias("id_b"))
    )
    comp = connected_components(pairs)
    return comp.select(
        F.col("id").alias("entity"),
        F.col("comp").alias("canonical"),
        F.count("*").over(W.partitionBy("comp")).alias("n_members"),
    )


@register(
    "q_csv_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS qty_cents
    FROM lineitem
    WHERE l_quantity >= 25
    GROUP BY l_returnflag
    """,
    description=(
        "CSV sink/source roundtrip (the reference's own interchange "
        "format, SURVEY S4-S6): the lineitem projection writes out as "
        "headered CSV and reads back under an EXPLICIT schema — never "
        "inference in production paths (inference is a second full "
        "scan and a schema-stability hazard) — then aggregates value-"
        "hash-equal to the same aggregation over the original parquet. "
        "Quantities sum as scaled integers, same exactness policy as "
        "every currency aggregate."
    ),
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from urllib.parse import urlparse

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    path = f"{warehouse.rstrip('/')}/csv_lineitem"
    li.write.mode("overwrite").option("header", "true").csv(path)
    back = spark.read.schema("l_returnflag string, l_quantity double").option(
        "header", "true"
    ).csv(path)
    return (
        back.filter(F.col("l_quantity") >= 25)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("l_quantity") * 100).cast("long")).cast("long").alias("qty_cents"),
        )
    )
