#!/usr/bin/env python
"""Capture .explain("formatted") for bench queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [query ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (default r14) for each named query (default: the
full bench HEADLINE list). <suffix> is "before" or "after". Plans are the
pre-execution formatted physical plans (AdaptiveSparkPlan initial plans)
at $SPARK_GRAFT_SF_DIR (default sf0.1) — the optimization-round evidence
files the judge reads alongside OPTIMIZATION_r<N>.md.

Iterative queries (assemble_*, dup_clusters, graph_pagerank, ...) execute
driver loops at plan-construction time; their captured plan is the final
composed plan, which is still the honest artifact (the loop's per-round
shape is identical across rounds).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import bench
    import __spark_entry__ as ent
    from reflexiv_spark.session import get_spark

    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = {**ent.queries(), **bench._bench_only_queries()}
    if not names:
        names = [n for n in bench.HEADLINE if n in qs]

    out_dir = (Path(__file__).resolve().parent.parent / "plans"
               / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        try:
            df = qs[n](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{n}_{suffix}.txt").write_text(buf.getvalue())
            print(f"wrote {n}_{suffix}.txt")
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {n}: {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
