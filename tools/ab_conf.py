#!/usr/bin/env python
"""Interleaved same-session A/B of a runtime SQL conf across queries
(optimization r13). Arms alternate A-B-A-B per query with gc before
each run and noop-sink timing; reports min/median per arm.

Usage:
  python tools/ab_conf.py --conf KEY --a VAL --b VAL [--reps N] q1 q2 ...
"""

from __future__ import annotations

import gc
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    conf_key = None
    val_a = val_b = None
    reps = 4
    queries: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--conf":
            conf_key = next(it)
        elif a == "--a":
            val_a = next(it)
        elif a == "--b":
            val_b = next(it)
        elif a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else int(next(it))
        else:
            queries.append(a)
    assert conf_key and val_a is not None and val_b is not None and queries

    from reflexiv_spark.session import get_spark

    spark = get_spark(app_name="ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as ent
    import bench

    qs = {**ent.queries(), **bench._bench_only_queries()}

    def run(name: str, d: str) -> float:
        gc.collect()
        t0 = time.time()
        qs[name](spark, d).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    print(f"conf {conf_key}: A={val_a}  B={val_b}", flush=True)
    for q in queries:
        run(q, "/root/testdata/sf0.001")
        walls: dict[str, list[float]] = {"A": [], "B": []}
        for _ in range(reps):
            for arm, val in (("A", val_a), ("B", val_b)):
                spark.conf.set(conf_key, val)
                walls[arm].append(run(q, "/root/testdata/sf0.1"))
        spark.conf.unset(conf_key)
        for arm, ws in walls.items():
            print(
                f"{q:24s} {arm} min {min(ws):6.3f}  "
                f"med {statistics.median(ws):6.3f}  "
                f"runs {' '.join(f'{w:.2f}' for w in ws)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
