#!/usr/bin/env python
"""Fill BASELINE.md's self-measured rows.

Measures (1) the DuckDB oracle suite at sf0.1 (the single-node baseline
the bench compares against), (2) PySpark k-mer counting throughput on
synthetic reads, (3) end-to-end assembly wall clock on example-equivalent
synthetic genomes. Prints a JSON dict; paste/record into BASELINE.md.

Usage: python tools/measure_baseline.py [--big] [--skip-duckdb]
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def measure_duckdb() -> dict:
    import duckdb

    import __spark_entry__ as ent
    from bench import HEADLINE

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = {}
    # headline queries only: the brute-force oracles (NOT EXISTS
    # containment, cross-join overlap scan) are sf0.01 verification
    # tools, not baselines — they are intractable at sf0.1
    oracles = {
        n: s for n, s in ent.oracle_sql().items() if n in set(HEADLINE)
    }
    for name, sql in oracles.items():
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            out[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = f"error: {e}"[:80]
    out["_total"] = round(sum(v for v in out.values() if isinstance(v, float)), 2)
    return out


def _simulate(genome: str, coverage: float, read_len: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    tr = str.maketrans("ACGT", "TGCA")
    n = int(len(genome) * coverage / read_len)
    reads = []
    for _ in range(n):
        p = rng.randrange(0, len(genome) - read_len + 1)
        r = genome[p : p + read_len]
        if rng.random() < 0.5:
            r = r[::-1].translate(tr)
        reads.append(r)
    return reads


def measure_spark(big: bool) -> dict:
    from reflexiv_spark.operators.counter import count_kmers
    from reflexiv_spark.pipelines.assemble import assemble
    from reflexiv_spark.session import get_spark

    spark = get_spark(app_name="measure-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(42)
    out = {}

    # k-mer counting throughput: 200k reads x 100bp = 20 Mbp
    genome = "".join(rng.choice("ACGT") for _ in range(1_000_000))
    reads = _simulate(genome, coverage=20, read_len=100, seed=7)
    df = (
        spark.createDataFrame([(r,) for r in reads], "seq string")
        .repartition(32)
        # pin the input in the JVM: a plain createDataFrame re-pickles the
        # driver-side list on EVERY action, which would charge ~4 s of
        # single-threaded Python serialization to the operator under test
        .localCheckpoint(eager=True)
    )
    count_kmers(df, 31, min_coverage=2).write.format("noop").mode(
        "overwrite"
    ).save()  # warm codegen/JIT so the timing is steady-state
    t0 = time.time()
    count_kmers(df, 31, min_coverage=2).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    out["kmer_count_reads"] = len(reads)
    out["kmer_count_sec"] = round(dt, 2)
    out["kmer_count_reads_per_sec"] = int(len(reads) / dt)
    out["kmer_count_mbp_per_sec"] = round(len(reads) * 100 / dt / 1e6, 1)

    # e2e assembly: example-equivalent 4.5 kb / 15x
    g1 = "".join(rng.choice("ACGT") for _ in range(4576))
    r1 = _simulate(g1, coverage=15, read_len=100, seed=8)
    d1 = spark.createDataFrame([(r,) for r in r1], "seq string").localCheckpoint(
        eager=True
    )
    t0 = time.time()
    n1 = assemble(d1, k=31, min_contig=1000).count()
    out["assembly_4_5kb_sec"] = round(time.time() - t0, 1)
    out["assembly_4_5kb_contigs"] = n1

    if big:
        r2 = _simulate(genome, coverage=30, read_len=100, seed=9)
        d2 = (
            spark.createDataFrame([(r,) for r in r2], "seq string")
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        t0 = time.time()
        n2 = assemble(d2, k=31, min_contig=1000).count()
        out["assembly_1mb_sec"] = round(time.time() - t0, 1)
        out["assembly_1mb_contigs"] = n2
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true", help="include the 1 Mb assembly")
    ap.add_argument("--skip-duckdb", action="store_true")
    args = ap.parse_args()
    result = {}
    if not args.skip_duckdb:
        result["duckdb_sf01"] = measure_duckdb()
    result.update(measure_spark(args.big))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
