"""Capture ``explain("formatted")`` for registry queries into text
files the optimization judge can read (guide §1: record the plan shape
— Exchange count, join strategy, PushedFilters, Python-eval nodes —
before and after each change).

Usage:
    python tools/capture_plans.py BEFORE_OR_AFTER [query ...]
        -> plans/r14/<query>_<suffix>.txt

With no query list, captures every registry entry except the
side-effecting streaming keys (their callable runs real micro-batch
jobs and returns a local summary frame with no plan to audit — same
exclusion as the scale-clean plan sweep).

Queries whose callable runs small driver jobs at construction time
(adaptive-banding counts, data-derived thresholds) still work here —
the point is the final frame's physical plan.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = sys.argv[2:]


def main() -> None:
    from vcfdbr_spark import get_spark
    from vcfdbr_spark.entry_queries import QUERIES, SIDE_EFFECTING_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="capture-plans", extra_conf={"spark.ui.enabled": "false"}
    )
    names = ONLY or [
        n for n in QUERIES if n not in SIDE_EFFECTING_QUERIES
    ]
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # capture the failure, keep sweeping
            text = f"ERROR building plan: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
