#!/usr/bin/env python
"""Interleaved A/B for the r13 palindrome-dedup elision: OLD behavior is
recovered in-session by forcing ``_palindrome_free`` to False (the flag
is consulted per plan construction), so both variants run alternately in
ONE session — the only comparison method this box supports (see
OPTIMIZATION_r13.md measurement protocol).
"""

from __future__ import annotations

import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = ["assemble_blocks", "assemble_paths", "prune_forks", "rc_expand"]
TRIALS = 4


def main() -> None:
    import __spark_entry__ as ent
    from reflexiv_spark.pipelines import assemble as asm
    from reflexiv_spark.session import get_spark

    spark = get_spark(app_name="ab-palindrome")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    real = asm._palindrome_free

    def run(name: str, d: str) -> float:
        gc.collect()
        t0 = time.perf_counter()
        qs[name](spark, d).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    for n in QUERIES:  # warmup
        run(n, "/root/testdata/sf0.001")
    res: dict[tuple[str, str], list[float]] = {}
    for t in range(TRIALS):
        for variant in ("old", "new"):
            asm._palindrome_free = (
                (lambda k, c: False) if variant == "old" else real
            )
            for n in QUERIES:
                spark.sparkContext.setJobDescription(f"{variant}:{n}:{t}")
                res.setdefault((n, variant), []).append(
                    run(n, "/root/testdata/sf0.1")
                )
    asm._palindrome_free = real
    for n in QUERIES:
        o, w = res[(n, "old")], res[(n, "new")]
        print(
            f"{n}: old min {min(o)} med {sorted(o)[len(o)//2]} {o} | "
            f"new min {min(w)} med {sorted(w)[len(w)//2]} {w}"
        )


if __name__ == "__main__":
    main()
