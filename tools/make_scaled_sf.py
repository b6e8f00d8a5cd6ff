#!/usr/bin/env python
"""Build a larger scale factor by replicating /root/testdata/sf0.1 with
key offsets (DuckDB, no Spark).

The driver ships sf{0.001,0.01,0.1} only; BASELINE's "the 2× contract
holds because the ~0.3 s/query job floor amortizes" claim needs a
data-dominated point. Each copy i shifts every key column by i*OFFSET so
joins/aggregations keep their selectivity; document text gets a per-copy
suffix token and embeddings a tiny per-copy perturbation so
distinctness-sensitive operators (dedup, ANN) don't see 10 exact clones
of everything.

Usage: python tools/make_scaled_sf.py [factor] [outdir]
       (defaults: 10 -> <repo>/.scaled/sf1.0; outdir is git-ignored
       scratch, safe to delete)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

SRC = "/root/testdata/sf0.1"
OFFSET = 100_000_000

# Row groups per output file: a 100 TB corpus arrives as thousands of
# splittable files; a single-row-group parquet file (DuckDB's default
# for small outputs) caps Spark's scan at ONE task no matter how many
# cores exist, which under-parallelizes every CPU-bound map stage and
# makes the local Spark-vs-DuckDB comparison measure file layout, not
# engines. Small groups for fat-row tables, larger for narrow ones.
ROW_GROUP_ROWS = {
    "documents": 2048,
    "embeddings": 2048,
    "events": 32768,
    "orders": 65536,
    "lineitem": 65536,
}

# key columns to shift per copy; everything else is carried verbatim
KEYED = {
    "region": [],
    "nation": [],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> int:
    import duckdb

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(
        sys.argv[2]
        if len(sys.argv) > 2
        else Path(__file__).resolve().parent.parent / ".scaled" / "sf1.0"
    )
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYED.items():
        t0 = time.time()
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
            ).fetchall()
        ]
        if table in ("region", "nation"):
            # tiny dimension tables stay as-is (their keys are referenced
            # unshifted-modulo by the shifted fact keys only via joins on
            # the nation/region side, which we keep 1:1)
            sel = "SELECT * FROM src"
            src = f"(SELECT * FROM read_parquet('{SRC}/{table}.parquet')) src"
            con.execute(f"COPY ({sel.replace('src', src)}) TO '{out}/{table}.parquet'")
            print(f"{table}: copied ({time.time()-t0:.1f}s)")
            continue
        exprs = []
        for c in cols:
            if c in keys:
                exprs.append(f"{c} + i * {OFFSET} AS {c}")
            elif table == "documents" and c == "text":
                exprs.append(
                    "CASE WHEN i = 0 THEN text"
                    " ELSE text || ' copymark' || CAST(i AS VARCHAR) END AS text"
                )
            elif table == "embeddings" and c == "embedding":
                exprs.append(
                    "list_transform(embedding,"
                    " x -> CAST(x + i * 0.00013 AS FLOAT)) AS embedding"
                )
            else:
                exprs.append(c)
        rg = ROW_GROUP_ROWS.get(table)
        opt = f" (ROW_GROUP_SIZE {rg})" if rg else ""
        q = (
            f"COPY (SELECT {', '.join(exprs)}"
            f" FROM read_parquet('{SRC}/{table}.parquet'),"
            f" unnest(generate_series(0, {factor - 1})) AS t(i))"
            f" TO '{out}/{table}.parquet'{opt}"
        )
        con.execute(q)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows ({time.time()-t0:.1f}s)")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
