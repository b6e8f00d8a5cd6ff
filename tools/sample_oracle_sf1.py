#!/usr/bin/env python
"""Sampled sf1.0 oracle protocol for the quadratic-by-design oracles
(VERDICT r12 next-round #5).

Some registered DuckDB oracles are deliberately quadratic — the honest
brute-force definition of the operator (NOT EXISTS containment scans,
all-pairs shingle joins). They verify semantics at sf0.01 but are
intractable at sf1.0, so those queries' scale evidence was previously
Spark-side-only. This tool adds VALUE-LEVEL sf1.0 evidence without
paying the quadratic: a deterministic sample of the OUTPUT KEY
(``key % MOD == 0``) restricts the oracle's expensive side to the
sampled entities — sound whenever each output row's value depends only
on its own entity versus the whole corpus (containment verdicts,
pair lists keyed by the smaller id), because the restriction is then
a pure output filter evaluated identically by both engines:

- contig_dedup     — sample the outer contig; NOT EXISTS still scans
                     every other contig (sample x n, not n^2)
- contained_dedup  — same shape over the raw documents
- ngram_jaccard    — sample id1 (the smaller pair id); the sampled
                     side's shingles join against the full index

NOT covered, with reasons: dup_clusters / cluster_keep_best — a
connected-components label depends on the WHOLE graph, so restricting
the oracle to sampled docs changes the relation (their sf1.0 evidence
stays Spark-side scale runs + the sf0.01 oracle). read_mapping left
this protocol in round 13: its oracle was rewritten as an exhaustive
gram-equality join and now runs IN FULL at sf1.0.

Spark side runs the REGISTERED query unmodified and filters the same
predicate on the output — so this also exercises the production plan
at scale. Comparison = check_correctness's column-sorted value hash.

Usage: python tools/sample_oracle_sf1.py [sf_dir] [mod]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_correctness import _hash_rows  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaled/sf1.0"
MOD = int(sys.argv[2]) if len(sys.argv) > 2 else 149

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# query -> (output key column, restricted oracle SQL with {mod}).
# Each restricted oracle is the REGISTERED oracle with the sample
# predicate applied to the entity that keys the output — nothing else
# may differ, so a value divergence means the engines disagree.
SAMPLED = {
    "contig_dedup": (
        "contig_id",
        "WITH dnac AS (SELECT doc_id AS contig_id,"
        " regexp_replace(upper(text), '[^ACGT]', '', 'g') AS seq"
        " FROM documents), "
        "d AS (SELECT * FROM dnac WHERE length(seq) > 0) "
        "SELECT contig_id FROM d x WHERE x.contig_id % {mod} = 0"
        " AND NOT EXISTS (SELECT 1 FROM d y"
        " WHERE y.contig_id != x.contig_id"
        " AND (contains(y.seq, x.seq)"
        " OR contains(y.seq, reverse(translate(x.seq, 'ACGT', 'TGCA'))))"
        " AND (length(y.seq) > length(x.seq)"
        " OR (length(y.seq) = length(x.seq)"
        " AND y.contig_id < x.contig_id)))",
    ),
    "contained_dedup": (
        "doc_id",
        "SELECT d.doc_id FROM documents d WHERE d.doc_id % {mod} = 0"
        " AND NOT EXISTS (SELECT 1 FROM documents e"
        " WHERE e.doc_id != d.doc_id AND contains(e.text, d.text)"
        " AND (length(e.text) > length(d.text)"
        " OR (length(e.text) = length(d.text)"
        " AND e.doc_id < d.doc_id)))",
    ),
    "ngram_jaccard": (
        "id1",
        "WITH sh AS (SELECT DISTINCT doc_id AS id,"
        " substr(text, CAST(i AS INT), 8) AS sh FROM documents,"
        " unnest(generate_series(1, length(text) - 7)) AS t(i)"
        " WHERE length(text) >= 8), "
        "sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id), "
        "sa AS (SELECT * FROM sh WHERE id % {mod} = 0), "
        "it AS (SELECT a.id AS id1, b.id AS id2, count(*) AS inter"
        " FROM sa a JOIN sh b ON a.sh = b.sh AND a.id < b.id"
        " GROUP BY 1, 2) "
        "SELECT id1, id2, round(inter / (s1.n + s2.n - inter), 6)"
        " AS jaccard FROM it JOIN sz s1 ON it.id1 = s1.id"
        " JOIN sz s2 ON it.id2 = s2.id"
        " WHERE inter / (s1.n + s2.n - inter) >= 0.5",
    ),
}


def main() -> int:
    import __spark_entry__ as ent
    from pyspark.sql import functions as F
    from reflexiv_spark.session import get_spark

    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute(
        "SET memory_limit = '"
        + os.environ.get("SPARK_GRAFT_DUCK_MEM", "24GB")
        + "'"
    )
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spark = get_spark(app_name="sample-oracle-sf1", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    failures = 0
    for name, (key, sql) in SAMPLED.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = qs[name](spark, SF_DIR).where(F.col(key) % MOD == 0)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        t0 = time.time()
        try:
            cur = con.execute(sql.format(mod=MOD))
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"query": name, "err": str(e)[:300]}))
            failures += 1
            continue
        t_duck = time.time() - t0
        match = (
            len(srows) == len(orows)
            and sorted(scols) == sorted(ocols)
            and _hash_rows(scols, srows) == _hash_rows(ocols, orows)
        )
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": SF_DIR,
                    "sample_mod": MOD,
                    "sampled_rows": len(srows),
                    "oracle_rows": len(orows),
                    "hash_match": match,
                    "spark_sec": round(t_spark, 1),
                    "oracle_sec": round(t_duck, 1),
                }
            )
        )
        if not match:
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
