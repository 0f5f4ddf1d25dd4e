"""One-off audit: which registered queries plan a WindowExec with NO
partition spec (the ``Exchange SinglePartition`` + one-task sort shape
that is the textbook scale killer unless the windowed table is bounded
by construction). Used to derive the exemption list pinned by
tests/test_plans.py::test_unpartitioned_windows_are_bounded_exemptions.

    python tools/window_audit.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, ".")

from duva_spark.queries import load_all  # noqa: E402
from duva_spark.session import get_spark  # noqa: E402

# windowspecdefinition whose FIRST argument is already a sort order (or
# the frame itself) has an empty partition spec
UNPARTITIONED_WSPEC = re.compile(
    r"windowspecdefinition\((?:[^,()]+ (?:ASC|DESC) NULLS|specifiedwindowframe)"
)


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    spark = get_spark("window-audit")
    hits, errs = [], []
    for name, q in sorted(load_all().items()):
        if name.startswith("q_stream"):
            continue  # streaming queries execute eagerly; own tests
        try:
            plan = plan_of(q.fn(spark, args.sf))
        except Exception as e:  # noqa: BLE001
            errs.append((name, repr(e)[:120]))
            continue
        if UNPARTITIONED_WSPEC.search(plan):
            hits.append(name)
        print(f"{'HIT ' if name in hits[-1:] else 'ok  '}{name}", flush=True)
    print("\nUNPARTITIONED-WINDOW QUERIES:")
    for h in hits:
        print(" ", h)
    for n, e in errs:
        print("ERR", n, e)


if __name__ == "__main__":
    main()
