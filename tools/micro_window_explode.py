#!/usr/bin/env python
# Same-session interleaved microbenchmark: array-of-substrings explode vs
# int-position explode for the k-mer sliding window (r13 session 4).
# Output parity is hash-checked in-run; 'int' measured 0.30 -> 0.18 s min
# at k=61 over the sf0.1 ACGT pseudo-reads.
import sys, time, gc
sys.path.insert(0, '/root/repo')
from reflexiv_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark(app_name="micro-explode")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
# ACGT pseudo-reads like _dna
reads = docs.select(F.regexp_replace(F.upper(F.col("text")), "[^ACGT]", "").alias("rseq")) \
            .where(F.length("rseq") >= 61).localCheckpoint()
k = 61

def arr_form(df):
    return df.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("rseq") - F.lit(k - 1)),
                lambda i: F.col("rseq").substr(i, F.lit(k)),
            )
        ).alias("__i", "kmer")
    ).select((F.col("__i") + 1).alias("pos"), "kmer")

def int_form(df):
    return df.select(
        "rseq",
        F.posexplode(
            F.sequence(F.lit(1), F.length("rseq") - F.lit(k - 1))
        ).alias("__i", "pos"),
    ).select("pos", F.col("rseq").substr(F.col("pos"), F.lit(k)).alias("kmer"))

# sanity: same output
a = arr_form(reads); b = int_form(reads)
na, nb = a.count(), b.count()
ha = a.selectExpr("bit_xor(xxhash64(pos, kmer)) s").first()[0]
hb = b.selectExpr("bit_xor(xxhash64(pos, kmer)) s").first()[0]
print("rows", na, nb, "hash match:", ha == hb, flush=True)

import statistics
walls = {"arr": [], "int": []}
# attach a cheap aggregate consumer so nothing gets pruned: noop sink
def run(fn):
    gc.collect(); t0 = time.time()
    fn(reads).write.format("noop").mode("overwrite").save()
    return time.time() - t0
run(arr_form); run(int_form)  # warm
for rep in range(5):
    walls["arr"].append(run(arr_form))
    walls["int"].append(run(int_form))
for n, ws in walls.items():
    print(n, "min", round(min(ws),3), "med", round(statistics.median(ws),3), [round(w,2) for w in ws], flush=True)
