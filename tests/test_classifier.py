"""In-engine classifier training (datapipe/classifier.py): the
fixed-point full-batch logistic trainer must actually LEARN — planted
separable classes get separated — and stay exactly layout-invariant
(integer micro-unit gradients)."""

from __future__ import annotations

import random


def _corpus(spark):
    rng = random.Random(3)
    good = ["alpha beta gamma delta", "beta gamma delta epsilon",
            "alpha delta epsilon beta", "gamma alpha beta epsilon"]
    bad = ["zulu yankee xray whiskey", "yankee xray whiskey victor",
           "zulu whiskey victor xray", "xray zulu yankee victor"]
    rows = []
    for i in range(40):
        pool = good if i % 2 == 0 else bad
        rows.append((i, " ".join(rng.choice(pool).split()), i % 2 == 0))
    return spark.createDataFrame(rows, "doc_id long, text string, y boolean")


def test_train_logreg_learns_planted_separation(spark):
    from reflexiv_spark.datapipe.classifier import (
        logreg_predict,
        train_logreg_hashed,
    )

    docs = _corpus(spark)
    w = train_logreg_hashed(docs, "y", dim=256, iters=3, lr=0.5)
    assert w.count() > 0
    z = {r.doc_id: r.z for r in logreg_predict(docs, w, dim=256).collect()}
    # perfect separation on disjoint-vocabulary classes
    assert all(z[i] > 0 for i in range(0, 40, 2)), sorted(z.items())[:4]
    assert all(z[i] < 0 for i in range(1, 40, 2)), sorted(z.items())[:4]

    # exact layout invariance: integer micro-unit gradients make the
    # trained model independent of partitioning
    w2 = train_logreg_hashed(
        docs.repartition(13), "y", dim=256, iters=3, lr=0.5
    )
    a = {(r.idx, r.weight) for r in w.collect()}
    b = {(r.idx, r.weight) for r in w2.collect()}
    assert a == b


def test_train_logreg_empty_and_featureless(spark):
    from reflexiv_spark.datapipe.classifier import (
        logreg_predict,
        train_logreg_hashed,
    )

    empty = spark.createDataFrame([], "doc_id long, text string, y boolean")
    w = train_logreg_hashed(empty, "y", dim=64)
    assert w.count() == 0
    # featureless docs score exactly 0 under any model
    docs = spark.createDataFrame(
        [(1, "alpha beta", True), (2, "", False)],
        "doc_id long, text string, y boolean",
    )
    w = train_logreg_hashed(docs, "y", dim=64, iters=2)
    z = {r.doc_id: r.z for r in logreg_predict(docs, w, dim=64).collect()}
    assert set(z) == {1, 2} and z[2] == 0.0


def test_train_logreg_null_label_raises(spark):
    """A NULL label must raise, not silently drop the doc from the
    gradient sum (ADVICE r8: NULL residual diverges from the oracle's
    CASE WHEN ... ELSE 0 while the check still passes on clean data)."""
    import pytest

    from reflexiv_spark.datapipe.classifier import train_logreg_hashed

    docs = spark.createDataFrame(
        [(1, "alpha beta", True), (2, "zulu yankee", None)],
        "doc_id long, text string, y boolean",
    )
    with pytest.raises(Exception, match="NULL label"):
        train_logreg_hashed(docs, "y", dim=64, iters=1).collect()
    # the documented upstream coalesce trains cleanly
    from pyspark.sql import functions as F

    fixed = docs.withColumn("y", F.coalesce(F.col("y").cast("int"), F.lit(0)))
    assert train_logreg_hashed(fixed, "y", dim=64, iters=1).count() > 0


def test_train_predict_composite_matches_composition(spark):
    """r14 shared-extraction composite: train_predict_logreg_hashed must
    produce EXACTLY the rows of the train-then-logreg_predict
    composition it replaces (one feature extraction instead of two —
    the optimization must be invisible in the output)."""
    from pyspark.sql import functions as F

    from reflexiv_spark.datapipe.classifier import (
        logreg_predict,
        train_logreg_hashed,
        train_predict_logreg_hashed,
    )

    docs = _corpus(spark).withColumn("yl", F.col("y").cast("int"))
    kw = dict(dim=64, use_bigrams=True, hash_family="xxhash64",
              iters=2, lr=0.5)
    w = train_logreg_hashed(docs, "yl", **kw)
    old = logreg_predict(docs, w, dim=64, use_bigrams=True,
                         hash_family="xxhash64")
    new = train_predict_logreg_hashed(docs, "yl", **kw)
    assert sorted(map(tuple, old.collect())) == sorted(
        map(tuple, new.collect())
    )
