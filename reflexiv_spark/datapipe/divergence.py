"""Corpus divergence — hashed-bucket KL divergence between two corpora.

The mixture-calibration companion of DSIR: ``dsir_weights`` scores
individual documents against a target distribution; this measures how
far two CORPORA are from each other as distributions over the same
hashed n-gram buckets — the quantity data-mixture work tracks when
rebalancing sources (e.g. deciding how much of a new crawl snapshot to
admit, or monitoring drift between nightly batches). Kullback-Leibler
in both directions; the per-bucket table is the deliverable (which
buckets drive the divergence — the actionable part), the scalar is one
sum away.

Model: the same bag-of-hashed-n-grams device as ``datapipe.dsir`` —
``dim`` buckets, unigrams + optional bigrams, add-1 smoothing on both
sides, p(b) = (count_b + 1) / (total + dim). Per-bucket contribution to
KL(A||B) in integer micro-units:

    kl_ab_micro(b) = floor(1e6 * p_a(b) * (log10 p_a(b) - log10 p_b(b)))

the dsir/unigram_logprob determinism device (log10 of
correctly-rounded double ratios, floored once — no transcendental
re-evaluated downstream), so the DuckDB oracle replays every row
bit-for-bit. Micro-unit sums are exact bigints, order-free under any
partitioning.

Scale shape at 100 TB: two dim-row aggregates (map-side combined;
``dim`` is model-sized), one dim-row join — the corpora themselves are
touched exactly once each by the feature scan. Nothing here grows with
corpus size except the two scans.

Separate module (not dsir.py) so building it does not mark the dsir
queries window-affected in ``tools/check_window.py``; it shares the
feature plumbing via import like dsir does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.text import _hashed_features

MICRO = 1_000_000


def corpus_divergence(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    use_bigrams: bool = True,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Per-bucket divergence table →
    DataFrame[idx, ca, cb, kl_ab_micro, kl_ba_micro].

    ``ca``/``cb`` are the raw bucket counts of corpus A / corpus B;
    ``kl_ab_micro`` is bucket b's micro-unit contribution to KL(A||B)
    (and symmetrically ``kl_ba_micro``), with add-1 smoothing so every
    bucket of both sums is finite. sum(kl_ab_micro)/1e6 ≈ KL(A||B) in
    log10 units (within dim micro-floors). Every output column bigint.
    """
    spark = a.sparkSession
    _, fa, _ = _hashed_features(
        a, text_col, id_col, dim, use_bigrams, hash_family
    )
    _, fb, _ = _hashed_features(
        b, text_col, id_col, dim, use_bigrams, hash_family
    )
    ca = fa.groupBy("idx").agg(F.count(F.lit(1)).alias("ca"))
    cb = fb.groupBy("idx").agg(F.count(F.lit(1)).alias("cb"))
    ta = fa.agg(F.count(F.lit(1)).alias("ta"))
    tb = fb.agg(F.count(F.lit(1)).alias("tb"))
    buckets = spark.range(dim).select(F.col("id").alias("idx"))
    base = (
        buckets.join(ca, "idx", "left")
        .join(cb, "idx", "left")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            "idx",
            F.coalesce("ca", F.lit(0)).cast("bigint").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("bigint").alias("cb"),
            "ta",
            "tb",
        )
    )
    pa = (F.col("ca") + 1).cast("double") / (F.col("ta") + dim).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (F.col("tb") + dim).cast("double")
    la, lb = F.log10(pa), F.log10(pb)
    return base.select(
        "idx",
        "ca",
        "cb",
        F.floor(pa * (la - lb) * MICRO).cast("bigint").alias("kl_ab_micro"),
        F.floor(pb * (lb - la) * MICRO).cast("bigint").alias("kl_ba_micro"),
    )


def divergence_summary(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    use_bigrams: bool = True,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """One-row scalar view → DataFrame[kl_ab_micro, kl_ba_micro]
    (exact bigint sums of the per-bucket table)."""
    t = corpus_divergence(
        a, b, text_col, id_col, dim, use_bigrams, hash_family
    )
    return t.agg(
        F.sum("kl_ab_micro").cast("bigint").alias("kl_ab_micro"),
        F.sum("kl_ba_micro").cast("bigint").alias("kl_ba_micro"),
    )
