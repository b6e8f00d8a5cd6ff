#!/usr/bin/env python
"""Round-11 sf1.0 scale evidence for the winnow-family queries whose
full result sets cannot round-trip the driver comparator at scale.

- winnow_fingerprint: ~5.9M rows at sf1.0 — a full two-sided collect
  OOM'd the round-10 attempt, so parity is a MULTISET-EXACT reduction
  computed inside each engine (row count + exact decimal sums of fp,
  pos, and a per-row md5-60bit row-key) — any row difference moves at
  least one aggregate.
- winnow_overlap(max_df=50): the capped production twin (the uncapped
  driver-gate semantics are hot-fp quadratic by design at this
  corpus's vocabulary — OOMs a 48 GB heap, the documented backstop
  rationale) — same multiset reduction over (id_a, id_b, n_shared).
- winnow_span_removal: full check_correctness-style compare if the
  per-char DuckDB oracle survives; the engine side never builds a
  per-char relation.
- edit_join: Spark-side wall + pair count only (its oracle is the
  deliberate brute-force all-pairs ground truth — quadratic,
  sf0.01-only, the ngram_jaccard disposition).

Usage: python tools/measure_winnow_sf1.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaled/sf1.0"


def spark_multiset(df, cols):
    """(count, per-column exact decimal sums, sum of row-key hashes) —
    computed engine-side, no driver materialization of the rows."""
    from pyspark.sql import functions as F

    key = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x01", *[F.col(c).cast("string") for c in cols])),
            1,
            15,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    agg = [F.count(F.lit(1)).alias("n")]
    agg += [
        F.sum(F.col(c).cast("decimal(38,0)")).alias(f"s_{c}") for c in cols
    ]
    agg += [F.sum(key).alias("s_key")]
    r = df.agg(*agg).collect()[0]
    return tuple(str(x) for x in r)


def duck_multiset(con, sql, cols):
    inner = sql
    key = (
        "CAST(('0x' || substr(md5("
        + " || chr(1) || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        + "), 1, 15)) AS BIGINT)"
    )
    q = (
        "SELECT count(*), "
        + ", ".join(f"sum(CAST({c} AS HUGEINT))" for c in cols)
        + f", sum(CAST({key} AS HUGEINT)) FROM ({inner})"
    )
    return tuple(str(x) for x in con.execute(q).fetchone())


def main() -> None:
    import __spark_entry__ as ent
    from reflexiv_spark.session import get_spark

    con = duckdb.connect()
    con.execute("SET memory_limit = '24GB'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spark = get_spark(app_name="winnow-sf1", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # 1. winnow_fingerprint multiset
    t0 = time.time()
    sm = spark_multiset(
        ent.q_winnow_fingerprint(spark, SF_DIR), ["id", "pos", "fp"]
    )
    t1 = time.time()
    dm = duck_multiset(
        con,
        ent._SQL_WINNOW_FINGERPRINT.replace(
            "SELECT doc_id AS id,",
            "SELECT doc_id AS id,",
        ),
        ["id", "pos", "fp"],
    )
    t2 = time.time()
    print(
        f"winnow_fingerprint: spark {t1-t0:.1f}s duck {t2-t1:.1f}s "
        f"match={sm == dm} n={sm[0]}"
    )
    if sm != dm:
        print("  spark:", sm)
        print("  duck :", dm)

    # 2. capped overlap multiset (engine) vs capped oracle twin
    from reflexiv_spark.datapipe.winnow import winnow_overlap

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.time()
    sm = spark_multiset(
        winnow_overlap(
            docs, k=8, window=4, min_shared=2, hash_family="md5", max_df=50
        ),
        ["id_a", "id_b", "n_shared"],
    )
    t1 = time.time()
    capped_sql = ent._SQL_WINNOW_OVERLAP.replace(
        " WHERE pos <= greatest(p - 3, 1)) SELECT a.doc_id",
        " WHERE pos <= greatest(p - 3, 1)), "
        "hot AS (SELECT fp FROM fv GROUP BY fp"
        " HAVING count(DISTINCT doc_id) <= 50), "
        "fvc AS (SELECT fv.* FROM fv JOIN hot USING (fp))"
        " SELECT a.doc_id",
        1,
    ).replace("FROM fv a JOIN fv b", "FROM fvc a JOIN fvc b")
    assert "fvc" in capped_sql
    dm = duck_multiset(con, capped_sql, ["id_a", "id_b", "n_shared"])
    t2 = time.time()
    print(
        f"winnow_overlap(max_df=50): spark {t1-t0:.1f}s duck {t2-t1:.1f}s "
        f"match={sm == dm} n={sm[0]}"
    )
    if sm != dm:
        print("  spark:", sm)
        print("  duck :", dm)

    # 3. edit_join d=2 — Spark-side wall + count (oracle quadratic)
    t0 = time.time()
    n = ent.q_edit_join(spark, SF_DIR).count()
    print(f"edit_join d=2: spark {time.time()-t0:.1f}s pairs={n}")


if __name__ == "__main__":
    main()
