#!/usr/bin/env python
"""Interleaved same-session A/B for the plan_static loop barrier
(optimization r13 session 4). Arm A = plan_static as coded (static
window plans under the broadcast gate); arm B = forced off (every
barrier AQE-planned, the pre-change behavior). A-B-A-B x reps, gc
before each run, noop sink, min/median per arm.

Usage: python tools/ab_static_window.py [query ...] [--reps N]
"""

from __future__ import annotations

import gc
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

args = [a for a in sys.argv[1:] if not a.startswith("--")]
QUERIES = args or ["assemble_blocks", "assemble_paths"]
REPS = 4
for a in sys.argv[1:]:
    if a.startswith("--reps"):
        REPS = int(a.split("=", 1)[1])

SF = "/root/testdata/sf0.1"


def main() -> None:
    import reflexiv_spark.plans.barriers as B
    from reflexiv_spark.session import get_spark

    orig = B.iteration_barrier
    force_off = {"v": False}

    # NOTE (ADVICE r13): the plan_static= kwarg was reverted from
    # barriers.iteration_barrier — arm A of this harness requires
    # checking out the reverted plan_static commit. Against HEAD the
    # patch degrades to a pass-through (both arms identical) instead of
    # raising TypeError on the first barrier call.
    import inspect

    _has_static = "plan_static" in inspect.signature(orig).parameters

    def patched(df, eager=True, plan_static=False):
        if not _has_static:
            return orig(df, eager=eager)
        return orig(
            df, eager=eager, plan_static=(plan_static and not force_off["v"])
        )

    B.iteration_barrier = patched

    spark = get_spark(app_name="ab-static-window")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as ent
    import bench

    qs = {**ent.queries(), **bench._bench_only_queries()}

    def run(name: str, d: str) -> float:
        gc.collect()
        t0 = time.time()
        qs[name](spark, d).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for q in QUERIES:
        run(q, "/root/testdata/sf0.001")  # warm both arms' codegen
        walls: dict[str, list[float]] = {"A(static)": [], "B(aqe)": []}
        for rep in range(REPS):
            for arm, off in (("A(static)", False), ("B(aqe)", True)):
                force_off["v"] = off
                walls[arm].append(run(q, SF))
        for arm, ws in walls.items():
            print(
                f"{q:20s} {arm:10s} min {min(ws):6.3f}  "
                f"med {statistics.median(ws):6.3f}  "
                f"runs {' '.join(f'{w:.2f}' for w in ws)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
