#!/usr/bin/env python
"""Piecewise profiling of q_stitch_bridges / q_end_extend at sf0.1.

Times each internal stage boundary with the noop sink in ONE warm
session, so the per-query wall decomposes into the stages that own it
(guide §1). Not part of the bench contract — a round-13 profiling aid.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(df, label):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    w = time.time() - t0
    print(f"{w:7.2f}s  {label}", flush=True)
    return w


def main():
    import __spark_entry__ as ent
    from reflexiv_spark.session import get_spark

    spark = get_spark(app_name="profile-stitch")
    spark.sparkContext.setLogLevel("ERROR")

    which = sys.argv[1] if len(sys.argv) > 1 else "stitch"

    if which == "stitch":
        # warm
        ent.q_stitch_bridges(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        t(ent.q_stitch_bridges(spark, SF), "q_stitch_bridges FULL")

        # piecewise: replicate the query body
        from reflexiv_spark.pipelines import stitch as S

        d2 = ent._dna_docs(spark, SF, 80).withColumn("L", F.length("fs"))
        a_end = F.floor(F.col("L") * 0.4).cast("int")
        b_start = F.floor(F.col("L") * 0.6).cast("int") + 1
        contigs = d2.select(
            F.concat(F.lit("A"), F.col("doc_id").cast("string")).alias("contig_id"),
            F.col("fs").substr(F.lit(1), a_end).alias("seq"),
        ).unionByName(
            d2.select(
                F.concat(F.lit("B"), F.col("doc_id").cast("string")).alias(
                    "contig_id"
                ),
                F.col("fs").substr(b_start, F.col("L")).alias("seq"),
            )
        )
        reads = d2.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("L") - F.lit(79), F.lit(3)),
                    lambda i: F.col("fs").substr(i, F.lit(80)),
                )
            ).alias("seq")
        )
        t(reads, "reads (dna extract + explode)")
        k = 15
        from reflexiv_spark.functions.kmer import reverse_complement
        from reflexiv_spark.plans.layout import spread
        from reflexiv_spark.plans.parallelism import shuffle_partition_count

        fwd = (
            spread(reads.select(F.upper(F.col("seq")).alias("rseq")))
            .dropDuplicates(["rseq"])
            .withColumn("rid", F.xxhash64("rseq"))
            .withColumn("rc_rseq", reverse_complement("rseq"))
            .withColumn("rc_rid", F.xxhash64("rc_rseq"))
            .localCheckpoint(eager=False)
        )
        t(fwd, "fwd (dedup reads + rc cols + checkpoint)")
        poskmers = fwd.where(F.length("rseq") >= k).select(
            "rid",
            "rc_rid",
            F.length("rseq").alias("__L"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.length("rseq") - F.lit(k - 1)),
                    lambda i: F.col("rseq").substr(i, F.lit(k)),
                )
            ).alias("__i", "kmer"),
        ).select(
            "rid", "rc_rid", "__L", (F.col("__i") + 1).alias("pos"), "kmer"
        )
        t(poskmers, "poskmers (64-win explode over fwd)")
        ori = (
            S._oriented(contigs, "contig_id", "seq")
            .where(F.length("cseq") >= k)
            .localCheckpoint(eager=False)
        )
        seeds = ori.select(
            F.lit("L").alias("__side"),
            F.col("cid"),
            F.substring("cseq", -k, k).alias("kmer"),
        ).unionByName(
            ori.select(
                F.lit("R").alias("__side"),
                F.col("cid"),
                F.substring("cseq", 1, k).alias("kmer"),
            )
        )
        seeds2 = seeds.withColumn("__strand", F.lit("+")).unionByName(
            seeds.select(
                "__side", "cid", reverse_complement("kmer").alias("kmer")
            ).withColumn("__strand", F.lit("-"))
        )
        hits = (
            poskmers.join(seeds2, "kmer")
            .select(
                F.when(F.col("__strand") == "+", F.col("rid"))
                .otherwise(F.col("rc_rid"))
                .alias("rid"),
                F.when(F.col("__strand") == "+", F.col("pos"))
                .otherwise(F.col("__L") - F.lit(k) + 2 - F.col("pos"))
                .alias("pos"),
                "__side",
                "cid",
            )
            .repartition(shuffle_partition_count(reads), "rid")
        )
        t(hits, "hits (poskmers join seeds + repart)")
        per_rid = hits.groupBy("rid").agg(
            F.collect_list(
                F.when(F.col("__side") == "L", F.struct("pos", "cid"))
            ).alias("__ls"),
            F.collect_list(
                F.when(F.col("__side") == "R", F.struct("pos", "cid"))
            ).alias("__rs"),
        )
        br = (
            per_rid.select("rid", F.explode("__ls").alias("__l"), "__rs")
            .select("rid", "__l", F.explode("__rs").alias("__r"))
            .where(
                S._base_id(F.col("__l.cid")) != S._base_id(F.col("__r.cid"))
            )
            .where(F.col("__r.pos") > F.col("__l.pos"))
            .select(
                "rid",
                F.col("__l.pos").alias("pl"),
                F.col("__l.cid").alias("left"),
                F.col("__r.cid").alias("right"),
                (F.col("__r.pos") - F.col("__l.pos")).alias("d"),
            )
        )
        t(br, "br (per_rid agg + LxR explode)")
        support = br.groupBy("left", "right", "d").agg(
            F.count_distinct("rid").alias("support"),
            F.min(F.struct("rid", "pl")).alias("__rep"),
        )
        t(support, "support agg")
    elif which == "end":
        ent.q_end_extend(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        t(ent.q_end_extend(spark, SF), "q_end_extend FULL")

        from reflexiv_spark.operators.mapping import (
            extract_contig_ends,
        )
        from reflexiv_spark.plans.parallelism import shuffle_partition_count

        raw = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .repartition(spark.sparkContext.defaultParallelism)
        )
        dna = (
            raw.select(
                F.col("doc_id").cast("string").alias("contig_id"),
                F.regexp_replace(
                    F.upper(F.col("text")), "[^ACGT]", ""
                ).alias("full_seq"),
            )
            .where(F.length("full_seq") >= 60)
            .localCheckpoint(eager=False)
        )
        t(dna, "dna (regexp extract + checkpoint)")
        contigs = dna.select(
            "contig_id",
            F.expr(
                "substring(full_seq, 1, cast(length(full_seq) * 0.6 as int))"
            ).alias("seq"),
        )
        reads = dna.select(
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.length("full_seq") - F.lit(23), F.lit(5)
                    ),
                    lambda i: F.col("full_seq").substr(i, F.lit(24)),
                )
            ).alias("__i", "seq")
        ).select("seq")
        t(reads, "reads (window explode)")
        from reflexiv_spark.functions.kmer import reverse_complement

        n_part = shuffle_partition_count(reads)
        fwd = reads.select(F.upper(F.col("seq")).alias("seq"))
        rc = fwd.select(reverse_complement(F.col("seq")).alias("seq"))
        both = (
            fwd.unionByName(rc)
            .groupBy("seq")
            .agg(F.count(F.lit(1)).alias("weight"))
            .withColumn("rid", F.xxhash64("seq"))
            .localCheckpoint(eager=False)
        )
        t(both, "both (fwd+rc dedup groupBy + checkpoint)")
        ends = (
            extract_contig_ends(
                contigs, searchable_len=100, id_col="contig_id", seq_col="seq"
            )
            .select(
                F.col("contig_id"),
                "side",
                "end_seq",
                F.length("end_seq").alias("elen"),
            )
            .localCheckpoint(eager=False)
        )
        t(ends, "ends (extract + checkpoint)")
        from reflexiv_spark.operators.mapping import _pos_kmers

        rk = _pos_kmers(
            both.select("rid", F.col("seq").alias("rseq")), "rid", "rseq", 15
        ).select("rid", F.col("pos").alias("rpos"), "kmer")
        ek = _pos_kmers(
            ends.select(
                F.struct("contig_id", "side").alias("eid"),
                F.col("end_seq").alias("eseq"),
            ),
            "eid",
            "eseq",
            15,
        ).select(
            F.col("eid.contig_id").alias("contig_id"),
            F.col("eid.side").alias("side"),
            F.col("pos").alias("tpos"),
            "kmer",
        )
        cand = (
            rk.join(ek, "kmer")
            .select(
                "rid",
                "contig_id",
                "side",
                (F.col("tpos") - F.col("rpos") + 1).alias("offset"),
            )
            .repartition(n_part, "rid")
            .dropDuplicates(["rid", "contig_id", "side", "offset"])
        )
        t(cand, "cand (rk join ek + dedup)")
        m = cand.join(
            both.select(
                "rid",
                F.col("seq").alias("rseq"),
                F.length("seq").alias("rlen"),
                F.col("weight").cast("bigint").alias("wt"),
            ),
            "rid",
        ).join(
            ends.select("contig_id", "side", "end_seq", "elen"),
            ["contig_id", "side"],
        )
        rs = F.greatest(F.lit(1), F.lit(2) - F.col("offset"))
        tsp = F.greatest(F.lit(1), F.col("offset"))
        nov = F.least(F.col("rlen") - rs + 1, F.col("elen") - tsp + F.lit(1))
        m = (
            m.where(
                (nov >= 15)
                & (
                    F.col("rseq").substr(rs, nov)
                    == F.col("end_seq").substr(tsp, nov)
                )
            )
            .withColumn("first_over", F.col("elen") - F.col("offset") + 2)
            .where(
                (F.col("first_over") >= 1)
                & (F.col("first_over") <= F.col("rlen"))
            )
        )
        t(m, "m (verify joins + overlap filter)")


if __name__ == "__main__":
    main()
