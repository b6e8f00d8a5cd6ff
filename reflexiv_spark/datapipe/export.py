"""Composed training-data EXPORT layout — mix → shuffle → shards.

:mod:`reflexiv_spark.datapipe.webcurate` composes the curation side
(strip → quality → dedup → data card) into one hash-verifiable
operator; this module is its export-side twin. The last mile of every
pretraining pipeline is the same three stages run together:

1. :func:`~reflexiv_spark.datapipe.sampling.temperature_mix` — rebalance
   sources under a token budget (XLM/mT5 ``q_i ∝ t_i^alpha``),
2. :func:`~reflexiv_spark.datapipe.sampling.corpus_shuffle` — a
   deterministic global permutation of the kept documents (salt =
   epoch), so the token stream is not megabatches of one source,
3. :func:`~reflexiv_spark.datapipe.shards.plan_shards` /
   :func:`~reflexiv_spark.datapipe.shards.shard_manifest` — document-
   atomic ~N-token contiguous shards over the SHUFFLED order, and the
   O(n_shards) manifest a loader consumes.

Everything inherits the stage operators' determinism contracts (md5
hash-gates, integer-milli powered masses, two-phase prefix scans), so
the whole composition is bit-replayable by one chained-CTE SQL oracle.

Plan shape: one corpus scan for the token masses + one for the gate
(temperature_mix's documented 2-scan shape), then the kept-docs
relation (already thin: id + ints, with n_tokens riding through the
shuffle's ``keep_cols`` — no re-attach join) flows through the two
two-phase prefix scans (shuffle rank; shard offsets), each one thin
range exchange + one ``__pid`` window hash exchange + one broadcast
join-back, then one hash exchange on shard_id (offset window) and a
shards-sized aggregate. Nothing corpus-sized ever collects; driver
state is one long per partition plus the per-source rate table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.sampling import corpus_shuffle, temperature_mix
from reflexiv_spark.datapipe.shards import plan_shards, shard_manifest


def training_layout(
    docs: DataFrame,
    target_tokens: int,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    epoch_salt: str = "ep0",
    mix_salt: str = "temp",
    hash_family: str = "md5",
    manifest: bool = True,
) -> DataFrame:
    """The composed export stage → the per-shard manifest
    DataFrame[shard_id, n_docs, n_tokens, first_pos, last_pos]
    (positions index the shuffled stream), or with ``manifest=False``
    the per-document plan
    DataFrame[position, <id_col>, n_tokens, shard_id, shard_offset].

    A different ``epoch_salt`` re-shuffles (and therefore re-shards)
    the SAME mixed corpus — the per-epoch layout rule; the mix itself
    stays fixed by ``mix_salt``.
    """
    mixed = temperature_mix(
        docs,
        alpha=alpha,
        budget_frac=budget_frac,
        source_col=source_col,
        id_col=id_col,
        token_col=token_col,
        text_col=text_col,
        salt=mix_salt,
        hash_family=hash_family,
    )
    # barrier BEFORE the shuffle: the range exchange's boundary-
    # sampling job otherwise re-executes the whole mix pipeline (two
    # corpus scans) once for sampling and again for the exchange
    mixed = mixed.localCheckpoint(eager=False)
    # n_tokens rides THROUGH the shuffle (keep_cols) — no corpus-sized
    # re-attach join downstream
    stream = corpus_shuffle(
        mixed,
        id_col=id_col,
        salt=epoch_salt,
        hash_family=hash_family,
        keep_cols=("n_tokens",),
    )
    plan = plan_shards(
        stream,
        target_tokens,
        id_col="position",
        tokens_col="n_tokens",
        keep_cols=(id_col,),
    )
    if not manifest:
        return plan
    return (
        shard_manifest(plan, id_col="position")
        .withColumnRenamed("first_id", "first_pos")
        .withColumnRenamed("last_id", "last_pos")
    )
