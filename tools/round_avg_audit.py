"""Registry-wide audit of float-average rounding sites.

``ROUND(AVG(<float>), k)`` is shuffle-fetch-order-dependent: double
partial sums associate differently run to run, so a mean sitting on a
``0.5·10^-k`` rounding boundary can flip its last digit between two
otherwise-identical runs. One such flip was observed in round 9
(q_corpus_prep_pipeline's avg_quality) and fixed with exact
scaled-integer accumulation (``duva_spark.queries.exact_avg`` /
``exact_avg_sql``).

This tool extracts every remaining ROUND-of-AVG site in the package
(both engines: DuckDB oracle SQL and the Spark DataFrame side) and
requires each to carry an explicit audit classification:

- ``int-summand``      — summands are integer-valued; double partial
                         sums stay exact integers under any order below
                         2^53, so the average is order-independent.
- ``indicator-0/1``    — CASE/WHEN 0-or-1 summands; same exactness.
- ``det-frame``        — windowed average over a bounded ROWS frame of
                         integer summands with a unique total ordering;
                         both engines reduce the same exact integers.
- ``builtin-under-test`` — the query exists to value-gate a float
                         builtin (skewness/kurtosis) against a two-pass
                         oracle; replacing it with exact sums would
                         remove the operator under test. Residual
                         boundary risk accepted and documented.
- ``residual-risk``    — float summands deliberately left in place this
                         round (k-means centroid dims, GD-internal
                         losses); each entry carries the reason and the
                         planned remedy.

Sites converted to exact accumulation no longer match the extraction
patterns and therefore need no entry. The audit FAILS CLOSED: a new
ROUND(AVG(...)) site without an entry, or a stale entry that no longer
matches any site, is an error — run this tool (or the pytest wrapper
``tests/test_plans.py::test_round_avg_sites_are_audited``) after adding
queries.

Adjacent classes, status:
- ROUND(SUM(...)) — now audited HERE with the same fail-closed contract
  (second section below): sites carrying an exactness marker in-line
  (scaled-integer CAST(ROUND(x*10^k)), exact DECIMAL(18,6) accumulation,
  FLOOR-grid + HUGEINT/decimal(38,0), money_cents) are exempt by
  construction; every other site needs an int-summand /
  pre-scaled-integer / indicator classification. The GD sums (LR margin
  z and gradient g), the streaming/window money sums, decayed
  engagement, chi2, try_divide ratios, weighted event values, and
  sessionized totals were all CONVERTED in-round. Zero raw float-sum
  order dependence remains in any value-gated aggregate.
- ROUND(STDDEV/CORR(<float>)) builtins elsewhere in the registry are
  builtin-under-test surfaces (q_agg_stats/q_agg_correlation pin Spark's
  builtins against DuckDB's) — same acceptance rationale as
  skewness/kurtosis below.
- Un-rounded float aggregates compared via the driver's exact repr hash:
  none exist (queries must round on both sides per tools/check_oracle).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "duva_spark"

# (pattern, engine) — a site is any source line matching one of these.
PATTERNS = [
    (re.compile(r"ROUND\(-?AVG\(", re.IGNORECASE), "sql"),
    (re.compile(r"F\.round\(-?F\.avg\("), "spark"),
    (re.compile(r"F\.round\(\s*$"), "spark-cont"),  # F.round( ... F.avg on next line
]
CONT = re.compile(r"^\s*-?F\.avg\(")

# Audit entries: (file suffix, distinctive substring of the line, class, note).
# Every extracted site must match exactly one entry by (file, substring).
AUDIT: list[tuple[str, str, str, str]] = [
    # --- int-summand ---------------------------------------------------
    ("queries/llm_q.py", "ROUND(AVG({_NTOK}), 4)", "int-summand",
     "whitespace token counts are integers"),
    ("queries/llm_q.py", "F.round(F.avg(textstats.token_count_ws(t)), 4)", "int-summand",
     "whitespace token counts are integers"),
    ("queries/relational.py", "ROUND(AVG(l_quantity), 4)", "int-summand",
     "TPC-H quantities are integer-valued"),
    ("queries/relational.py", 'F.round(F.avg("l_quantity"), 4)', "int-summand",
     "TPC-H quantities are integer-valued"),
    ("queries/relational.py", "json_extract_string(props, '$.k') AS DOUBLE)), 4)", "int-summand",
     "events.props $.k is integer-valued (verified over testdata)"),
    ("queries/relational.py", 'F.round(F.avg(k.cast("double")), 4)', "int-summand",
     "events.props $.k is integer-valued (verified over testdata)"),
    ("queries/relational.py", "ROUND(AVG(n_events), 4)", "int-summand",
     "per-user event counts are integers"),
    ("queries/relational.py", 'F.round(F.avg("n_events"), 4)', "int-summand",
     "per-user event counts are integers"),
    ("queries/pipeline_q.py", "ROUND(AVG(n), 6) AS mean_words", "int-summand",
     "per-doc word counts are integers"),
    ("queries/pipeline_q.py", 'F.round(F.avg("n"), 6).alias("mean_words")', "int-summand",
     "per-doc word counts are integers"),
    # --- indicator-0/1 -------------------------------------------------
    ("queries/pipeline_q.py", "ROUND(AVG(q), 6) AS quality_rate", "indicator-0/1",
     "q is a 0.0/1.0 keep flag"),
    ("queries/pipeline_q.py", 'F.round(F.avg("q"), 6).alias("quality_rate")', "indicator-0/1",
     "q is a 0.0/1.0 keep flag"),
    ("queries/llm_q.py", "ROUND(AVG(CASE WHEN y THEN 1.0 ELSE 0.0 END), 6)", "indicator-0/1",
     "label fraction"),
    ("queries/llm_q.py", "ROUND(AVG(CASE WHEN l.y THEN 1.0 ELSE 0.0 END), 6)", "indicator-0/1",
     "label fraction"),
    ("queries/llm_q.py", 'ROUND(AVG(CASE WHEN h < {hold} THEN', "indicator-0/1",
     "holdout accuracy: 1.0/0.0 correctness flags"),
    # --- det-frame -----------------------------------------------------
    ("queries/relational.py", 'F.round(F.avg(F.col("n").cast("double")).over(w7), 4)', "det-frame",
     "7-row frame over integer daily counts with a unique ordering"),
    ("queries/relational.py", "ROUND(AVG(CAST(n AS DOUBLE)) OVER (w ROWS BETWEEN 6 PRECEDING", "det-frame",
     "7-row frame over integer daily counts with a unique ordering"),
    # --- builtin-under-test --------------------------------------------
    ("queries/relational.py", "ROUND(AVG(POWER(x-mu,3))", "builtin-under-test",
     "q_agg_moments pins Spark's one-pass skewness builtin to a two-pass oracle"),
    ("queries/relational.py", "ROUND(AVG(POWER(x-mu,4))", "builtin-under-test",
     "q_agg_moments pins Spark's one-pass kurtosis builtin to a two-pass oracle"),
    # --- residual-risk --------------------------------------------------
    # (the k-means / label-centroid / PQ-codebook family was converted
    # to exact 1e-9-grid accumulation in-round — no entries remain; the
    # adjacent ROUND(SUM(float)) GD-gradient class stays documented in
    # the module docstring)
    ("llm/evals.py", 'F.avg(F.when(F.col(y_col), 1.0).otherwise(0.0)), 6', "indicator-0/1",
     "calibration-bin label fraction"),
    # substring deliberately whitespace-free: the r12 fused-round rewrite
    # re-indented the site and the only F.avg left in logreg.py IS it
    ("llm/logreg.py", 'F.avg(', "indicator-0/1",
     "holdout accuracy: 1.0/0.0 correctness flags"),
]


# ROUND(SUM(...)) residue entries: sites with NO in-line exactness marker.
# All must be integer-valued summands (exact double sums under any order
# below 2^53) or pre-scaled integer columns produced by an upstream
# exact-grid projection.
AUDIT_SUM: list[tuple[str, str, str, str]] = [
    ("queries/llm_q.py", "ROUND(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)", "indicator-0/1",
     "duplicate-group indicator"),
    ("queries/llm_q.py", 'F.sum("kl9")', "pre-scaled-int",
     "1e-9-grid KL terms, gridded upstream"),
    ("queries/llm_q.py", 'F.sum("ce9")', "pre-scaled-int",
     "1e-9-grid cross-entropy terms, gridded upstream"),
    ("queries/llm_q.py", 'F.sum("eff6")', "pre-scaled-int",
     "1e-6-grid effective-char terms, gridded upstream"),
    ("queries/llm_q.py", "ROUND(SUM(n_hits)", "int-summand", "recall hit counts"),
    ("queries/pipeline_q.py", "SUM(n_sub)", "int-summand", "subword counts"),
    ("queries/pipeline_q.py", 'F.sum("n_sub")', "int-summand", "subword counts"),
    ("queries/pipeline_q.py", 'F.sum("toks")', "int-summand", "token counts"),
    ("queries/pipeline_q.py", "SUM(p.bk)", "int-summand", "backoff flags summed as ints"),
    ("queries/pipeline_q.py", 'F.sum("bk")', "int-summand", "backoff flags summed as ints"),
    ("queries/pipeline_q.py", "unseen_bigram_rate", "int-summand", "unseen-event counts / token counts"),
    ("queries/pipeline_q.py", "unseen_ctx_rate", "int-summand", "unseen-event counts / token counts"),
    ("queries/pipeline_q.py", "unseen_trigram_rate", "int-summand", "unseen-event counts / token counts"),
    ("queries/relational.py", "ROUND(SUM(l_quantity)", "int-summand", "TPC-H integer quantities"),
    ("queries/relational.py", 'F.round(F.sum("l_quantity")', "int-summand", "TPC-H integer quantities"),
    ("queries/relational.py", "ROUND(SUM(DISTINCT l_quantity)", "int-summand", "TPC-H integer quantities"),
    ("queries/relational.py", "F.sum(c_ep)", "pre-scaled-int", "money cents (money_cents upstream)"),
    ("queries/relational.py", "F.sum(c_dp)", "pre-scaled-int", "money 1e-4 units (money_cents upstream)"),
    ("queries/relational.py", "F.sum(c_ch)", "pre-scaled-int", "money 1e-6 units (money_cents upstream)"),
    ("queries/relational.py", "sess_cents", "pre-scaled-int", "per-session money cents"),
    ("queries/relational.py", 'F.sum("rev_e4")', "pre-scaled-int", "revenue 1e-4 units, gridded upstream"),
    # r10 additions
    ("queries/llm_q.py", "ROUND(SUM(chunk_len) * 1.0 /", "int-summand",
     "chunk token lengths are integers (q_passage_chunks duplication factor)"),
    ("queries/llm_q.py", "ROUND(SUM(ABS(cms_est - exact_cnt)) * 1.0 / COUNT(*), 6) AS cms_mae,", "int-summand",
     "CMS absolute errors are exact integer counts (q_cms_mean_min_bias)"),
    ("queries/llm_q.py", "ROUND(SUM(ABS(2 * (wd - 1) * exact_cnt - mid2)) * 1.0", "int-summand",
     "CMM errors ride as exact scaled integers (q_cms_mean_min_bias)"),
    ("queries/llm_q.py", 'F.round(F.sum(cms_err) * 1.0 / F.count("*"), 6).alias("cms_mae"),', "int-summand",
     "CMS absolute errors are exact integer counts (q_cms_mean_min_bias)"),
    # r12 fused-LR-round rewrite: the margin z is summed over the per-doc
    # window from FLOOR-gridded decimal(38,0) terms — exact integer sum
    # under any order (the marker FLOOR( is on the term's own line above)
    ("llm/logreg.py", "F.sum(term).over(zw)", "pre-scaled-int",
     "margin z: FLOOR-gridded decimal(38,0) terms, exact under any order"),
]

# a SUM line with one of these markers is exact by construction
SUM_EXEMPT = re.compile(
    r"CAST\(ROUND\(|FLOOR\(|floor\(|money_cents|decimal\(38,0\)|HUGEINT"
    r"|DECIMAL\(18,6\)|decimal\(18,6\)"
)


def extract() -> list[tuple[str, int, str]]:
    sites = []
    for f in sorted(PKG.rglob("*.py")):
        rel = f.relative_to(PKG.parent).as_posix()
        if rel.endswith("queries/__init__.py"):
            continue  # exact_avg's own docstring names the hazard pattern
        lines = f.read_text().splitlines()
        for i, line in enumerate(lines):
            if re.search(r"ROUND\(-?AVG\(", line, re.IGNORECASE) or re.search(
                r"F\.round\(-?F\.avg\(", line
            ):
                sites.append((rel, i + 1, line.strip()))
            elif line.rstrip().endswith("F.round(") and i + 1 < len(lines) and CONT.match(
                lines[i + 1]
            ):
                sites.append((rel, i + 1, (line + " " + lines[i + 1]).strip()))
    return sites


def extract_sums() -> list[tuple[str, int, str]]:
    """ROUND(SUM(...)) sites WITHOUT an in-line exactness marker."""
    sites = []
    for f in sorted(PKG.rglob("*.py")):
        rel = f.relative_to(PKG.parent).as_posix()
        if rel.endswith("queries/__init__.py"):
            continue
        for i, line in enumerate(f.read_text().splitlines()):
            if (
                re.search(r"ROUND\(SUM\(", line, re.IGNORECASE)
                or re.search(r"F\.round\(\s*F\.sum\(", line)
            ) and not SUM_EXEMPT.search(line):
                sites.append((rel, i + 1, line.strip()))
    return sites


def main() -> int:
    sites = extract()
    errors = []
    matched_entries = set()
    print(f"{len(sites)} ROUND-of-AVG sites remain (exact-accumulation sites excluded by construction):\n")
    for rel, ln, text in sites:
        hit = None
        for idx, (fsuf, sub, cls, note) in enumerate(AUDIT):
            if rel.endswith(fsuf) and sub in text:
                hit = (idx, cls, note)
                matched_entries.add(idx)
                break
        if hit is None:
            errors.append(f"UNAUDITED site {rel}:{ln}: {text[:100]}")
            print(f"  ?? {rel}:{ln}  UNAUDITED")
        else:
            print(f"  [{hit[1]:>18}] {rel}:{ln}")
    sums = extract_sums()
    matched_sum = set()
    print(f"\n{len(sums)} ROUND-of-SUM sites lack an in-line exactness marker:\n")
    for rel, ln, text in sums:
        hit = None
        for idx, (fsuf, sub, cls, note) in enumerate(AUDIT_SUM):
            if rel.endswith(fsuf) and sub in text:
                hit = (idx, cls, note)
                matched_sum.add(idx)
                break
        if hit is None:
            errors.append(f"UNAUDITED SUM site {rel}:{ln}: {text[:100]}")
            print(f"  ?? {rel}:{ln}  UNAUDITED")
        else:
            print(f"  [{hit[1]:>18}] {rel}:{ln}")
    stale = [
        f"STALE audit entry #{i} ({e[0]} / {e[1][:60]!r}) matches no site"
        for i, e in enumerate(AUDIT)
        if i not in matched_entries
    ] + [
        f"STALE SUM audit entry #{i} ({e[0]} / {e[1][:60]!r}) matches no site"
        for i, e in enumerate(AUDIT_SUM)
        if i not in matched_sum
    ]
    for msg in errors + stale:
        print("ERROR:", msg, file=sys.stderr)
    if errors or stale:
        return 1
    print(f"\nOK: {len(sites)} AVG sites + {len(sums)} unmarked SUM sites audited "
          f"({len(matched_entries)} + {len(matched_sum)} entries, fail-closed).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
