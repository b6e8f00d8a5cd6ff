"""Distributed training of the hashed linear quality classifier.

Closes the loop that ``text.classifier_score_model`` opens: that
operator runs INFERENCE against a trained (idx, weight) table; this
module TRAINS one in the engine — full-batch logistic regression over
the same hashed bag-of-n-grams features (fastText-style, the standard
corpus quality-classifier recipe: label a small seed set, train the
hashed linear model, score the crawl). Separate module so its evolution
does not mark the whole text family window-affected in
``tools/check_window.py`` (feature plumbing is shared by import).

Scale shape at 100 TB: one feature explode per iteration consumer, a
docs-sized margin aggregation, a dim-bounded gradient aggregation
(map-side combined), and a driver-resident model of ``dim`` int64s —
the same model-on-driver pattern as ``similarity.kmeans_lite``. Nothing
data-sized is ever collected; iterations are a fixed small count
(full-batch GD — deterministic, no sampling order to pin down).

Determinism: weights live in integer MICRO-units. Per doc the margin
z = (Σ tf·w_micro)/1e6 is an exact int sum then one division; the
residual quantizes to floor((σ(z) − y)·1e6) BEFORE the gradient sum, so
the per-bucket gradient is an exact bigint under any partitioning; the
update floors lr·grad/n back to integers. The only transcendental is
the base-10 sigmoid 1/(1 + 10^(−z)) — the same cross-engine log10/pow
device as ``text.unigram_logprob_score``, applied per row (never
accumulated as floats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.text import _hashed_features

MICRO = 1_000_000


def _feats_tf(df, text_col, id_col, dim, use_bigrams, hash_family):
    """(base[id, label?], tf[id, idx, tf]) — per-doc hashed-feature term
    frequencies (the bag counts duplicates; tf is the count)."""
    base, fidx, _ = _hashed_features(
        df, text_col, id_col, dim, use_bigrams, hash_family
    )
    tf = fidx.groupBy("id", "idx").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    return base, tf


def train_logreg_hashed(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    use_bigrams: bool = True,
    hash_family: str = "xxhash64",
    iters: int = 2,
    lr: float = 0.5,
) -> DataFrame:
    """Train a hashed-feature logistic regression → the model as
    DataFrame[idx, weight] (weight = micro-units / 1e6, double; only
    nonzero rows).

    Model: P(y=1|x) = σ₁₀(z), z = Σ_features tf·w[h(feature)], with the
    base-10 sigmoid σ₁₀(z) = 1/(1+10^(−z)) (the same model class as the
    natural-base form up to a constant weight scale). Training is
    ``iters`` rounds of deterministic full-batch gradient descent from
    w = 0 with no bias term (hashed models absorb it into frequent
    buckets; document-level calibration belongs to the consumer):

        r_i   = floor((σ₁₀(z_i) − y_i) · 1e6)          (exact int)
        g_j   = Σ_i r_i · tf_ij                         (exact int sum)
        w_j  −= floor(lr · g_j / n)                     (micro-units)

    ``lr`` should be a dyadic rational (default 0.5) so lr·g stays an
    exact double before the floor. ``label_col`` must be 0/1 (int or
    boolean) and NON-NULL: a NULL label would make the doc's residual
    NULL and silently drop it from the gradient sum, so the trainer
    raises on the first NULL instead (coalesce labels upstream — e.g.
    ``F.coalesce((lang == 'en').cast('int'), F.lit(0))``). The returned
    table feeds
    :func:`reflexiv_spark.datapipe.text.classifier_score_model`-style
    broadcast inference or :func:`logreg_predict` below.

    Per iteration: one broadcast join of the ≤dim-row weight table, one
    docs-sized margin agg, one dim-bounded gradient agg collected to the
    driver (the model — same driver-sized bound as kmeans centroids).
    """
    base, tf, n = _labelled_tf(
        df, label_col, text_col, id_col, dim, use_bigrams, hash_family
    )
    if n == 0:
        return df.sparkSession.createDataFrame([], "idx long, weight double")
    w = _gd_micro_weights(df.sparkSession, tf, dim, iters, lr, n)
    return _weights_df(df.sparkSession, w)


def _labelled_tf(df, label_col, text_col, id_col, dim, use_bigrams,
                 hash_family):
    """(base, labelled tf checkpoint, n docs-with-features) — the shared
    front half of training and train→predict (one feature extraction,
    pinned once; the count job also materializes the checkpoint)."""
    base, tf = _feats_tf(df, text_col, id_col, dim, use_bigrams, hash_family)
    y = df.select(
        F.col(id_col).alias("id"),
        F.when(
            F.col(label_col).isNotNull(), F.col(label_col).cast("long")
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "train_logreg_hashed: NULL label — a NULL residual "
                    "silently drops the doc from the gradient; coalesce "
                    "labels upstream"
                )
            ).cast("long")
        )
        .alias("y"),
    )
    tf = tf.join(y, "id").localCheckpoint(eager=False)
    n = tf.select("id").distinct().count()  # docs with >=1 feature
    return base, tf, n


def _gd_micro_weights(spark, tf, dim, iters, lr, n):
    """The deterministic full-batch GD loop over the pinned labelled tf
    table → np.int64 micro-unit weights (see train_logreg_hashed for the
    exactness argument)."""
    import numpy as np

    w = np.zeros(dim, dtype=np.int64)
    for _ in range(max(1, int(iters))):
        wdf = spark.createDataFrame(
            [(int(i), int(v)) for i, v in enumerate(w) if v != 0] or
            [(0, 0)],
            "idx long, wm long",
        )
        z = (
            tf.join(F.broadcast(wdf), "idx", "left")
            .groupBy("id", "y")
            .agg(
                (
                    F.sum(F.col("tf") * F.coalesce(F.col("wm"), F.lit(0)))
                    .cast("double") / F.lit(float(MICRO))
                ).alias("z")
            )
        )
        r = z.select(
            "id",
            F.floor(
                (
                    F.lit(1.0) / (F.lit(1.0) + F.pow(F.lit(10.0), -F.col("z")))
                    - F.col("y")
                )
                * MICRO
            ).cast("long").alias("r"),
        )
        grad = (
            tf.join(r, "id")
            .groupBy("idx")
            .agg(F.sum(F.col("r") * F.col("tf")).alias("g"))
            .collect()
        )
        for row in grad:
            w[row["idx"]] -= int(np.floor(lr * row["g"] / n))
    return w


def _weights_df(spark, w):
    rows = [(int(i), int(v)) for i, v in enumerate(w) if v != 0]
    out = spark.createDataFrame(rows or [(0, 0)], "idx long, wm long")
    if not rows:
        out = out.where(F.lit(False))
    return out.select(
        "idx", (F.col("wm").cast("double") / MICRO).alias("weight")
    )


def train_predict_logreg_hashed(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    use_bigrams: bool = True,
    hash_family: str = "xxhash64",
    iters: int = 2,
    lr: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Train, then score the SAME corpus — sharing ONE hashed-feature
    extraction (r14, guide §2.4). The train-then-:func:`logreg_predict`
    composition extracted + tf-aggregated the corpus features twice
    (4 source scans in plans/r14/classifier_predict_before.txt); here
    the scoring pass reuses the trainer's pinned tf table (the extra
    label column is inert to the tf·w sum) and the in-memory micro
    weights (bit-equal to re-reading them through the weight table:
    round(wm/1e6·1e6) == wm for |wm| < 2^52). Output is identical to
    ``logreg_predict(df, train_logreg_hashed(df, ...), ...)``.
    """
    base, tf, n = _labelled_tf(
        df, label_col, text_col, id_col, dim, use_bigrams, hash_family
    )
    spark = df.sparkSession
    if n == 0:
        import numpy as np

        w = np.zeros(dim, dtype="int64")
    else:
        w = _gd_micro_weights(spark, tf, dim, iters, lr, n)
    wm = spark.createDataFrame(
        [(int(i), int(v)) for i, v in enumerate(w) if v != 0] or [(0, 0)],
        "idx long, wm long",
    )
    scored = (
        tf.join(F.broadcast(wm), "idx", "left")
        .groupBy("id")
        .agg(
            (
                F.sum(F.col("tf") * F.coalesce(F.col("wm"), F.lit(0)))
                .cast("double") / F.lit(float(MICRO))
            ).alias("z")
        )
    )
    return base.select("id").distinct().join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.round(F.coalesce(F.col("z"), F.lit(0.0)), round_digits).alias("z"),
    )


def logreg_predict(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    use_bigrams: bool = True,
    hash_family: str = "xxhash64",
    round_digits: int = 6,
) -> DataFrame:
    """Score documents with a :func:`train_logreg_hashed` model →
    DataFrame[doc_id, z] (the base-10 logit margin, rounded; σ₁₀(z) > ½
    iff z > 0, so downstream filters threshold z directly).

    One broadcast join against the ≤dim-row model + a docs-sized sum —
    the same inference shape as ``text.classifier_score_model``, but
    tf-weighted and in the trainer's exact micro-unit arithmetic.
    """
    base, tf = _feats_tf(df, text_col, id_col, dim, use_bigrams, hash_family)
    wm = weights.select(
        "idx", F.round(F.col("weight") * MICRO).cast("long").alias("wm")
    )
    scored = (
        tf.join(F.broadcast(wm), "idx", "left")
        .groupBy("id")
        .agg(
            (
                F.sum(F.col("tf") * F.coalesce(F.col("wm"), F.lit(0)))
                .cast("double") / F.lit(float(MICRO))
            ).alias("z")
        )
    )
    return base.select("id").distinct().join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.round(F.coalesce(F.col("z"), F.lit(0.0)), round_digits).alias("z"),
    )
