#!/usr/bin/env python
"""Phase-level profiling of the assemble_blocks/assemble_paths loop
queries (optimization r13, session 4): times every py4j boundary the
pointer-doubling loop crosses — localCheckpoint calls (which, under
AQE, execute all non-final query stages synchronously at CALL time),
the count/injectivity aggregates, the per-window movers probes — so
the per-window wall can be attributed to barrier conversion vs
aggregate jobs vs plan construction.

Usage: python tools/profile_blocks.py [query] [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERY = sys.argv[1] if len(sys.argv) > 1 else "assemble_blocks"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    try:  # Spark 4: the classic subclass overrides the ABC's methods
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame

    from reflexiv_spark.session import get_spark

    events: list[tuple[str, float]] = []

    def wrap(name: str, fn):
        def inner(self, *a, **kw):
            t0 = time.time()
            r = fn(self, *a, **kw)
            dt = time.time() - t0
            events.append((f"{name}{a or ''}{kw or ''}", dt))
            return r

        return inner

    DataFrame.localCheckpoint = wrap("localCheckpoint", DataFrame.localCheckpoint)
    DataFrame.first = wrap("first", DataFrame.first)
    DataFrame.count = wrap("count", DataFrame.count)

    spark = get_spark(app_name="profile-blocks")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as ent
    import bench

    qs = {**ent.queries(), **bench._bench_only_queries()}
    q = qs[QUERY]

    # warmup
    q(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    events.clear()
    print("=== warm done ===", flush=True)

    import gc

    for rep in range(3):
        gc.collect()
        events.clear()
        t0 = time.time()
        df = q(spark, SF)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        print(f"--- rep {rep}: build {t1 - t0:.3f}s  exec {t2 - t1:.3f}s  "
              f"total {t2 - t0:.3f}s")
        tracked = 0.0
        for name, dt in events:
            if dt >= 0.02:
                print(f"    {dt:7.3f}s  {name}")
            tracked += dt
        print(f"    tracked action time: {tracked:.3f}s")


if __name__ == "__main__":
    main()
