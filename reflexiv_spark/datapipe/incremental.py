"""Incremental deduplication — a new batch against a persisted
fingerprint store.

Production corpora don't re-dedup 100 TB nightly: they keep a
FINGERPRINT STORE (one bigint per seen document — ~0.01% of the corpus
bytes) and dedup each incoming batch against it — an anti-join on the
store plus a within-batch keep-first, then a store update by union.
This module is that shape, composed from the repo's proven devices
(``normalize_text`` + the ``md5_long``/xxhash64 families from
``datapipe/dedup.py``); it lives in its own module so its evolution does
not mark the standing dedup-family queries window-affected in
``tools/check_window.py``.

Scale shape: the store is fp-keyed and fp-partitioned; the batch
anti-join and the within-batch keep-first are the only exchanges, both
8-byte-keyed. Store updates are append-only unions of distinct
fingerprints — bucket the store table on ``fp``
(:mod:`reflexiv_spark.plans.bucketing`) and the nightly anti-join reads
co-located buckets with no store-side shuffle at all.

For NEAR-duplicate screening the same pattern holds one level up:
persist the batch's MinHash LSH band keys instead of exact
fingerprints (:func:`band_fingerprints`), and an incoming document is a
CANDIDATE if any band key collides with the store
(:func:`incremental_candidates`) — the recall/precision semantics are
exactly `minhash_lsh_pairs`' banding, so candidates still need the
exact verify the batch pipeline already runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.dedup import (
    _banded_signatures,
    md5_long,
    normalize_text,
)


def _fp(text: Column, hash_family: str) -> Column:
    n = normalize_text(text)
    if hash_family == "md5":
        return md5_long(n)
    return F.pmod(F.xxhash64(n), F.lit(1 << 60))


def exact_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The store rows for a corpus → DataFrame[fp: bigint] (distinct
    normalized-text fingerprints; NULL texts carry no fingerprint)."""
    t = F.col(text_col)
    return (
        df.where(t.isNotNull())
        .select(_fp(t, hash_family).alias("fp"))
        .distinct()
    )


def incremental_dedup(
    batch: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The FRESH rows of ``batch``: not fingerprint-equal to any seen
    document, and first (smallest id) among batch-internal duplicates.
    NULL-text rows are never duplicates of anything — they pass through.

    ``seen`` is a DataFrame with an ``fp`` column (from
    :func:`exact_fingerprints`, same ``hash_family``). Update the store
    afterwards with ``seen.unionByName(exact_fingerprints(fresh))
    .distinct()`` — append-only, mergeable across shards.
    """
    fp = F.when(
        F.col(text_col).isNotNull(), _fp(F.col(text_col), hash_family)
    )
    tagged = batch.withColumn("__fp", fp)
    unseen = tagged.join(
        seen.select(F.col("fp").alias("__fp")), "__fp", "left_anti"
    )
    # NULL __fp rows are routed AROUND the keep-first window (they are
    # never duplicates of anything, and a window would lump them into
    # one NULL group)
    first = F.row_number().over(
        Window.partitionBy("__fp").orderBy(id_col)
    )
    with_text = unseen.where(F.col("__fp").isNotNull())
    no_text = unseen.where(F.col("__fp").isNull())
    kept = (
        with_text.withColumn("__rn", first)
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return kept.unionByName(no_text).drop("__fp")


def band_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-dup store rows → DataFrame[band_idx, band_key] (distinct
    MinHash LSH band keys of the corpus — `minhash_lsh_pairs`' exact
    banding device, persisted). Store size: ``bands`` keys per doc."""
    _, banded = _banded_signatures(
        df, text_col, id_col, w=w, num_hashes=num_hashes, bands=bands,
        hash_family=hash_family,
    )
    return banded.select("band_idx", "band_key").distinct()


def incremental_candidates(
    batch: DataFrame,
    seen_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Batch rows that LSH-collide with the seen corpus →
    DataFrame[id, n_band_hits]. A collision on ANY band makes a
    candidate (same recall semantics as `minhash_lsh_pairs` at these
    parameters); run the exact verify only over these survivors. The
    join is a broadcast/bucket equi-join on (band_idx, band_key) — the
    batch never joins document-to-document against the corpus.
    """
    _, banded = _banded_signatures(
        batch, text_col, id_col, w=w, num_hashes=num_hashes, bands=bands,
        hash_family=hash_family,
    )
    hits = banded.join(seen_bands, ["band_idx", "band_key"], "left_semi")
    return (
        hits.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_band_hits"))
        .select(F.col("id").alias(id_col), "n_band_hits")
    )
