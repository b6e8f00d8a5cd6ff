"""CCNet-style reference-model perplexity bucketing (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", LREC 2020).

The quality split CCNet popularized: score every document's tokens
under a language model trained on a CLEAN REFERENCE corpus (theirs: a
KenLM 5-gram on Wikipedia), then split each language's documents into
HEAD / MIDDLE / TAIL thirds by per-token perplexity — head is the
high-quality slice pretraining mixes upweight. The difference from
``text.unigram_logprob_score`` is the reference: that operator scores
documents under the corpus's OWN unigram model (fluency relative to
itself); this one measures distance from an external clean
distribution, which is what makes the split a QUALITY signal rather
than a typicality signal.

Model approximation, stated honestly: a hashed-bucket add-1-smoothed
model over ``dim`` buckets (the dsir/divergence device), not a 5-gram
KenLM. Two tiers:

- unigram only (``bigram_lambda_micro=None``) — typicality of the
  vocabulary, blind to word order;
- unigram + hashed-BIGRAM interpolation (``bigram_lambda_micro`` set)
  — the per-token score blends the unigram and bigram
  negative-log-likelihoods in integer micro-units,
  ``div(λ·uni + (1e6−λ)·bi, 1e6)``. KenLM interpolates probabilities
  inside its backoff chain; blending the log-scores (a geometric-mean
  model) is the deterministic-integer-friendly counterpart and is what
  makes the split word-order-aware — shuffled or boilerplate-spliced
  text scores visibly worse than fluent text with the same unigram
  profile, which is CCNet's actual discriminator. λ=1e6 recovers the
  pure unigram model exactly.

Determinism contract: each model tier's per-bucket negative-log-prob
is floored ONCE to integer micro-units (the dsir device), per-document
totals are exact bigint sums, per-token scores and the interpolation
are integral ``div``, and the tertile split is an exact integer
cross-multiplication on the per-language rank over SCORED documents
(3·rank ≤ n → head, 3·rank ≤ 2n → middle, else tail; rank ties break
on doc_id; zero-token docs score NULL and are flagged 'tail' without
entering n — CCNet's tertiles are over the scored population) — every
column replayable by an ANSI-SQL oracle bit-for-bit.

Scale shape at 100 TB: the reference model is a (≤2·dim)-row
broadcast; the corpus is scanned once (the single-scan
unigram+bigram feature array binds the token array as a lambda
variable — the divergence.py device, duplicated here deliberately so
editing either module does not mark the other's queries
window-affected); the split is one per-language window over doc-level
rows (docs-sized, not token-sized — and per-language partitions are
balanced unless one language dominates, in which case the rank can
ride the histogram device instead; documented knob, not needed at
current scales).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def _hash_mod(c: Column, dim: int, hash_family: str) -> Column:
    if hash_family == "md5":
        from reflexiv_spark.datapipe.dedup import md5_long

        return F.pmod(md5_long(c), F.lit(dim))
    return F.pmod(F.xxhash64(c), F.lit(dim))


def _tokens(text_col: str) -> Column:
    return F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(r"\w+"), 0
    )


def _features(text_col: str, bigram: bool) -> Column:
    """array<string> of prefixed feature strings — 'u|w' unigrams and
    (when ``bigram``) 'b|w1 w2' bigrams — from ONE tokenization: the
    token array binds as a lambda variable via a 1-element outer
    transform (the let-binding idiom; an inlined reference would re-run
    the regexp tokenization per feature)."""
    ws = _tokens(text_col)
    uni = lambda w: F.transform(  # noqa: E731
        w, lambda x: F.concat(F.lit("u|"), x)
    )
    if not bigram:
        return F.flatten(F.transform(F.array(ws), uni))
    # sub-2-token docs short-circuit to an empty array: sequence(1, 0)
    # is the DESCENDING [1, 0] (the _del1 lesson)
    bi = lambda w: F.when(  # noqa: E731
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(1)),
            lambda i: F.concat(
                F.lit("b|"),
                F.element_at(w, i),
                F.lit(" "),
                F.element_at(w, i + F.lit(1)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.flatten(
        F.transform(F.array(ws), lambda w: F.concat(uni(w), bi(w)))
    )


def reference_nll_model(
    ref: DataFrame,
    text_col: str = "text",
    dim: int = 4096,
    hash_family: str = "xxhash64",
    bigram: bool = False,
) -> DataFrame:
    """The reference corpus's hashed add-1-smoothed model as per-bucket
    negative log10 probability in integer micro-units:
    nll(b) = floor(-log10((c_b + 1)/(total_kind + dim)) · 1e6), every
    bucket present (absent buckets carry the +1 smoothing mass).

    ``bigram=False`` → DataFrame[idx, nll_micro] (unigram buckets).
    ``bigram=True``  → DataFrame[kind, idx, nll_micro] with kind in
    ('u', 'b') and per-kind totals — 2·dim rows.

    Model-sized and broadcastable by construction. An EMPTY reference
    coalesces each total to 0 (pure add-1 smoothing — the uniform
    1/dim model) instead of silently NULLing every score (round-12
    ADVICE)."""
    spark = ref.sparkSession
    counts = (
        ref.select(F.explode(_features(text_col, bigram)).alias("f"))
        .select(
            F.substring("f", 1, 1).alias("kind"),
            _hash_mod(F.col("f"), dim, hash_family).alias("idx"),
        )
        .groupBy("kind", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # bucket join + derived totals
    )
    totals = counts.groupBy("kind").agg(F.sum("c").alias("t"))
    kinds = ["u", "b"] if bigram else ["u"]
    buckets = (
        spark.range(dim)
        .select(F.col("id").alias("idx"))
        .crossJoin(
            spark.createDataFrame([(k,) for k in kinds], "kind string")
        )
    )
    out = (
        buckets.join(counts, ["kind", "idx"], "left")
        .join(F.broadcast(totals), "kind", "left")
        .select(
            "kind",
            "idx",
            F.floor(
                -F.log10(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / (
                        F.coalesce(F.col("t"), F.lit(0)) + dim
                    ).cast("double")
                )
                * MICRO
            ).cast("bigint").alias("nll_micro"),
        )
    )
    if not bigram:
        return out.select("idx", "nll_micro")
    return out


def ccnet_buckets(
    docs: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    dim: int = 4096,
    hash_family: str = "xxhash64",
    bigram_lambda_micro: int | None = None,
) -> DataFrame:
    """Per-document reference-model score + CCNet head/middle/tail
    split → DataFrame[doc_id, lang, n_tokens, nll_micro_per_token,
    bucket].

    ``nll_micro_per_token`` — the integer-micro per-token negative
    log10 likelihood under the reference model (monotone in
    perplexity: 10^(nll/1e6) per token):

    - ``bigram_lambda_micro=None``: div(Σ nll_u(token buckets),
      n_tokens) — pure unigram.
    - ``bigram_lambda_micro=λ`` (0..1e6): div(λ·uni_pt +
      (1e6−λ)·bi_pt, 1e6) where uni_pt is as above and bi_pt =
      div(Σ nll_b(bigram buckets), n_tokens−1); single-token docs fall
      back to uni_pt (they have no bigrams).

    ``bucket``: within each language, rank documents ascending by
    (nll_micro_per_token, doc_id) and split into exact integer
    tertiles over the SCORED population — 'head' (best-scoring third,
    3·rank ≤ n_scored), 'middle' (3·rank ≤ 2·n_scored), 'tail'.
    Zero-token documents score NULL and are flagged 'tail' without
    counting toward n_scored (CCNet drops them; keeping them flagged
    lets the caller decide)."""
    lam = bigram_lambda_micro
    if lam is not None and not 0 <= lam <= MICRO:
        raise ValueError(
            f"bigram_lambda_micro must be in [0, {MICRO}], got {lam}"
        )
    bigram = lam is not None
    model = reference_nll_model(ref, text_col, dim, hash_family, bigram)
    if not bigram:
        model = model.select(F.lit("u").alias("kind"), "idx", "nll_micro")
    feats = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_features(text_col, bigram)).alias("f"),
    ).select(
        "doc_id",
        F.substring("f", 1, 1).alias("kind"),
        _hash_mod(F.col("f"), dim, hash_family).alias("idx"),
    )
    u = F.col("kind") == "u"
    perdoc = (
        feats.join(F.broadcast(model), ["kind", "idx"])
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(u, 1).otherwise(0)).alias("n_tokens"),
            F.sum(F.when(u, F.col("nll_micro")).otherwise(0)).alias("su"),
            F.sum(F.when(~u, F.col("nll_micro")).otherwise(0)).alias("sb"),
        )
    )
    uni_pt = F.expr("div(su, n_tokens)")
    if bigram:
        # integral div by 1e6 on the blended sum: every nll term is
        # non-negative, so div's truncation IS the floor — exact
        score = F.when(
            F.col("n_tokens") >= 2,
            F.expr(
                f"div({lam} * div(su, n_tokens)"
                f" + {MICRO - lam} * div(sb, n_tokens - 1), {MICRO})"
            ),
        ).otherwise(uni_pt)
    else:
        score = uni_pt
    perdoc = perdoc.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        score.cast("bigint").alias("nll_micro_per_token"),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")
    ).join(perdoc, "doc_id", "left")
    w = Window.partitionBy("lang").orderBy(
        F.col("nll_micro_per_token").asc_nulls_last(), F.col("doc_id")
    )
    n = Window.partitionBy("lang")
    ranked = base.select(
        "doc_id",
        "lang",
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        "nll_micro_per_token",
        F.row_number().over(w).alias("__rn"),
        # tertiles over SCORED docs only: count(col) skips NULLs, and
        # asc_nulls_last gives scored docs exactly ranks 1..n_scored
        # (round-12 ADVICE — with many empty docs the cuts otherwise
        # stop being tertiles of the scored population)
        F.count("nll_micro_per_token").over(n).alias("__n"),
    )
    bucket = (
        F.when(F.col("nll_micro_per_token").isNull(), F.lit("tail"))
        .when(3 * F.col("__rn") <= F.col("__n"), F.lit("head"))
        .when(3 * F.col("__rn") <= 2 * F.col("__n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        "doc_id", "lang", "n_tokens", "nll_micro_per_token",
        bucket.alias("bucket"),
    )
