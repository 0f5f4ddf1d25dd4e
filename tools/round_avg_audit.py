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
- ROUND(SUM(<float>)) GD sums (the LR margin z and gradient g) — CONVERTED
  in-round to exact 1e-9-grid accumulation on both engines (llm/logreg.py
  + the shared LR oracle CTE generator), alongside the centroid family,
  the embedding covariance Gram, and the exact-moment mu/sigma/stddev
  replacements. Zero raw float-sum order dependence remains in any
  value-gated aggregate.
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
    ("llm/logreg.py", 'F.round(                 F.avg(', "indicator-0/1",
     "holdout accuracy: 1.0/0.0 correctness flags"),
]


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
    stale = [
        f"STALE audit entry #{i} ({e[0]} / {e[1][:60]!r}) matches no site"
        for i, e in enumerate(AUDIT)
        if i not in matched_entries
    ]
    for msg in errors + stale:
        print("ERROR:", msg, file=sys.stderr)
    if errors or stale:
        return 1
    print(f"\nOK: all {len(sites)} sites audited "
          f"({len({i for i in matched_entries})} entries, fail-closed).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
