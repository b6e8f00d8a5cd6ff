"""Winnow fingerprint STORE — cross-batch span-level boilerplate
detection (the winnowing member of the incremental-store family).

``datapipe/incremental.py`` persists two stores already: exact
md5-60bit document fingerprints (whole-document dedup) and MinHash LSH
band keys (near-dup candidates). Winnow fingerprints (Schleimer et
al., SIGMOD 2003 — ``datapipe/winnow.py``) are the third,
overlap-LOCATING store: persisting a corpus's winnowed fingerprint
VALUES lets every nightly batch be probed for SHARED PASSAGES against
everything already ingested — license blocks, templated boilerplate,
syndicated articles — which whole-document and near-dup stores both
miss when the duplication is a span inside an otherwise-novel
document. Detection guarantee inherited from winnowing: any shared
substring of length >= window + k - 1 shares at least one fingerprint.

Store size: O(distinct fingerprints) bigints — roughly one per
``window`` characters of distinct text, append-only, mergeable across
shards by union-distinct (the incremental.py contract).

Scale shape: the batch is scanned ONCE by the zero-exchange winnow
kernel; the probe is a single fp-keyed equi-join against the store
(broadcast when the store is small, bucket the store table on ``fp``
for co-located reads at 100 TB — the incremental.py note applies
verbatim) followed by one id-keyed aggregate. The corpus-sized side
never shuffles by anything but its own doc id.

Own module (imports winnow.py, is not imported by it) so building and
evolving the store does not mark the standing winnow queries
window-affected in ``tools/check_window.py``.

The STREAMING member (:func:`probe_winnow_stream`, round 13) probes a
continuous document stream against the same store with the whole
computation in-row — the winnow kernel as an array column,
``array_intersect`` against the broadcast store literal, stateless
append output (the ``windowed_divergence`` eval-pack shape). Batch and
stream produce identical rows; the suite pins stream == batch ==
``probe_winnow_store`` per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.winnow import (
    fingerprint_array,
    winnow_fingerprints,
)


def winnow_store(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The persistable store rows for a corpus → DataFrame[fp: bigint]
    (distinct winnowed fingerprint VALUES; positions dropped — the
    store answers "has this passage been seen", not "where")."""
    return (
        winnow_fingerprints(
            df, id_col=id_col, text_col=text_col, k=k, window=window,
            hash_family=hash_family,
        )
        .select("fp")
        .distinct()
    )


def probe_winnow_store(
    batch: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Probe a batch against a persisted fingerprint store →
    DataFrame[<id_col>, n_fps, n_hits, flagged] (the id column keeps
    the caller's name, like ``incremental_candidates`` — round-13
    ADVICE): per batch document, the
    count of its distinct winnow fingerprints (``n_fps``), how many of
    those appear in the store (``n_hits``), and
    ``flagged = n_hits >= min_shared`` — the MOSS overlap rule
    (``winnow_overlap``'s ``min_shared``) applied batch-vs-store
    instead of pairwise. Documents with no fingerprints (NULL or
    sub-k text) report (0, 0, false) — they cannot share a passage.

    ``store`` is a DataFrame with an ``fp`` column (from
    :func:`winnow_store`, SAME k/window/hash_family — fingerprints
    from different parameters never match). Flagged documents are
    candidates for :func:`winnow.remove_reference_spans` surgery
    against the originating corpus, or for plain dropping.
    """
    fps = (
        winnow_fingerprints(
            batch, id_col=id_col, text_col=text_col, k=k, window=window,
            hash_family=hash_family,
        )
        .select("id", "fp")
        .distinct()
    )
    # ONE batch-sized aggregate: left-join the DISTINCT store (distinct
    # is required for join correctness — a duplicated store fp would
    # fan out batch rows — and costs only a store-sized exchange), mark
    # hits, count both in the same id-keyed groupBy. The two-aggregate
    # form (semi-join n_hits + separate n_fps + id join) costs two
    # extra batch-sized exchanges for the same answer.
    marked = fps.join(
        store.select("fp").distinct().withColumn("__h", F.lit(1)),
        "fp",
        "left",
    )
    per_doc = marked.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.count("__h").alias("n_hits"),
    )
    return (
        batch.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_fps", F.lit(0)).cast("bigint").alias("n_fps"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_shared).alias("flagged"),
        )
    )


_STREAM_STORE_CAP = 1_000_000


def store_fingerprint_list(store: DataFrame) -> list[int]:
    """Collect a fingerprint store to a sorted Python list — the
    broadcast-reference input of :func:`probe_winnow_stream`.
    Model-sized driver state (the eval-pack rule: the store is
    O(distinct fps) bigints); the hard cap is enforced BEFORE the
    collect (``limit(cap+1)``) so a corpus-sized relation is rejected
    without ever shipping its rows to the driver."""
    rows = store.select("fp").distinct().limit(_STREAM_STORE_CAP + 1).collect()
    if len(rows) > _STREAM_STORE_CAP:
        raise ValueError(
            f"store exceeds {_STREAM_STORE_CAP} fingerprints — too "
            "large for the in-row streaming probe; use "
            "probe_winnow_store's fp-keyed join instead"
        )
    return sorted(int(r["fp"]) for r in rows)


def probe_winnow_stream(
    df: DataFrame,
    store_fps: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """STREAMING twin of :func:`probe_winnow_store` — per document
    (id_col, n_fps, n_hits, flagged), computed entirely IN-ROW: the
    winnow kernel emits the doc's distinct fingerprint array, hits are
    ``array_intersect`` against the broadcast store literal, and the
    result is a stateless append projection (no state store, no
    watermark, no shuffle — the ``windowed_divergence`` eval-pack
    shape). Works identically on batch and streaming inputs; the suite
    pins stream == batch == ``probe_winnow_store`` per document.

    ``store_fps`` is the collected model-sized fingerprint list from
    :func:`store_fingerprint_list` (SAME k/window/hash_family as the
    store build — fingerprints from different parameters never match).
    Scale note: the store literal rides the serialized plan to every
    task (the broadcast-literal contract) — right for the monitoring /
    nightly-gate sizes this exists for; a corpus-sized store belongs in
    the batch probe's fp-keyed join."""
    # ONE array literal (a single py4j call carrying the whole list),
    # never F.array(*[F.lit(v) ...]) — per-element literals would build
    # len(store) Column objects driver-side and hand Catalyst a
    # CreateArray with that many children, stalling plan construction
    # at realistic store sizes
    store_arr = (
        F.lit([int(v) for v in sorted(set(store_fps))]).cast("array<bigint>")
        if store_fps
        else F.array().cast("array<bigint>")
    )
    # two-step select: __fps materializes as a named column so both
    # consumers reference it (CollapseProject keeps non-cheap HOF
    # expressions referenced twice un-inlined — the divergence.py rule)
    staged = df.select(
        F.col(id_col),
        fingerprint_array(
            F.col(text_col), k=k, window=window, hash_family=hash_family
        ).alias("__fps"),
    )
    return staged.select(
        id_col,
        F.size("__fps").cast("bigint").alias("n_fps"),
        F.size(F.array_intersect("__fps", store_arr))
        .cast("bigint")
        .alias("n_hits"),
    ).withColumn("flagged", F.col("n_hits") >= min_shared)


def update_winnow_store(store: DataFrame, new_fps: DataFrame) -> DataFrame:
    """Append-only store update → the union-distinct of the existing
    store and a batch's fingerprints (from :func:`winnow_store` over
    the ADMITTED batch rows). Mergeable across shards; idempotent."""
    return store.select("fp").unionByName(new_fps.select("fp")).distinct()
