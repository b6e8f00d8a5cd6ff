"""Benchmark decontamination — flag training documents that share word
n-grams with an evaluation set.

Every serious LLM data pipeline runs this step (the GPT-3 paper's
"13-gram overlap" rule and its descendants): any training document
containing an n-gram that also occurs in a benchmark/eval document is
suspect and gets dropped or audited.

100 TB shape: the eval side is tiny (benchmarks are thousands of
documents, not billions), so its distinct n-gram HASHES — 8 bytes each —
broadcast to every executor; the training side streams once, explodes
its n-grams Catalyst-side, and keeps only gram hashes that hit the
broadcast set. Nothing about the training corpus is ever shuffled except
the per-doc hit aggregation, keyed by doc id. The n-gram construction is
``transform`` over a guarded ``sequence`` — whole-stage codegen, no
Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe.dedup import md5_long


def word_ngrams(text: Column, n: int) -> Column:
    """array<string> of space-joined word ``n``-grams of ``text``
    (lower-cased ``\\w+`` tokens); empty when the document has fewer
    than ``n`` words.

    The token array enters the per-gram lambda as a LAMBDA VARIABLE
    (1-element outer transform), not inline: HOF lambdas re-evaluate
    their body per element, so an inlined ``ws`` re-runs the regexp
    tokenization once per n-gram (the winnow.py lesson, round 10)."""
    ws = F.regexp_extract_all(F.lower(F.coalesce(text, F.lit(""))), F.lit(r"\w+"), 0)
    return F.flatten(
        F.transform(
            F.array(ws),
            lambda w: F.when(
                F.size(w) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(w, i, n)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )


def _gram_hash(gram: Column, hash_family: str) -> Column:
    if hash_family == "md5":
        return md5_long(gram)
    return F.xxhash64(gram)


def _exploded_ngram_hashes(
    df: DataFrame, text_col: str, id_col: str, n: int, hash_family: str
) -> DataFrame:
    """DataFrame[id, h] — one row per word n-gram occurrence.

    posexplode single tokens, then n−1 ``lead()`` steps over one
    doc-scoped window assemble each gram (same rows as
    :func:`word_ngrams`, ~7× cheaper at scale than materializing
    shifted arrays with slice/concat — rows carry one short token each
    and all leads ride a single window pass)."""
    from pyspark.sql import Window

    ws = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(r"\w+"), 0
    )
    we = df.select(F.col(id_col), F.posexplode(ws).alias("pos", "w0"))
    lw = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("w0", i).over(lw).alias(f"w{i}") for i in range(1, n)]
    grams = we.select(id_col, "w0", *leads).where(
        F.col(f"w{n - 1}").isNotNull()
    )
    g = F.concat_ws(" ", *[F.col(f"w{i}") for i in range(n)])
    return grams.select(id_col, _gram_hash(g, hash_family).alias("h"))


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Contaminated training documents → DataFrame[doc_id, n_hits,
    n_distinct_grams]: total overlapping n-gram occurrences and how many
    distinct eval n-grams were hit. Documents with zero overlap are not
    returned (at corpus scale the contaminated set is the small output).

    The eval side reduces to distinct 8-byte gram hashes and broadcasts;
    the train side explodes grams and semi-joins the broadcast set —
    one scan of the corpus, one doc-keyed aggregation.
    """
    ev = (
        _exploded_ngram_hashes(eval_df, text_col, id_col, n, hash_family)
        .select("h")
        .distinct()
    )
    tr = _exploded_ngram_hashes(train, text_col, id_col, n, hash_family)
    return (
        tr.join(F.broadcast(ev), "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.count_distinct("h").alias("n_distinct_grams"),
        )
        .select(
            id_col,
            F.col("n_hits").cast("bigint").alias("n_hits"),
            F.col("n_distinct_grams").cast("bigint").alias("n_distinct_grams"),
        )
    )


def semantic_decontam(
    train: DataFrame,
    eval_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.3,
    dim: int = 64,
) -> DataFrame:
    """Embedding-level decontamination — the SEMANTIC counterpart of
    the n-gram :func:`decontaminate` (paraphrased or re-worded eval
    leakage that shares no 13-gram): flag every train vector whose
    cosine to its NEAREST eval vector is >= ``threshold`` →
    DataFrame[vec_id, eval_id, cos] (ties on cos -> smallest eval_id).

    Scale shape (the ``bloom_decontam`` argument, one level up): an
    eval benchmark is MODEL-SIZED by definition (10^4-10^5 vectors),
    so it packs into one broadcast row — array<struct<id, qv, n2>> —
    and every train vector computes its max-cosine IN-ROW with a
    Catalyst array aggregate: NO shuffle of the train corpus, NO
    n_train x n_eval intermediate, one scan. Driver/broadcast ceiling
    = the packed eval list (~(8*dim+16) bytes/vector: ~50 MB at 10^5
    x 64), documented like semdedup's centroid model.

    Determinism: the family's exact device — vectors quantize to
    floor(x*1000) int64, dots are exact integer sums (as doubles they
    are exact to 2^53), cosine rounds to 6 places ONLY for display;
    the argmax compares full doubles identically in both engines (the
    knn_graph convention). Zero-norm vectors never match (train) and
    never pack (eval)."""
    import numpy as np
    import pandas as pd

    # dim bounds the probed prefix (identity when vectors are exactly
    # dim long — the family's usual case; a documented contract, not a
    # silent assumption)
    q = F.transform(
        F.slice(F.col(vec_col).cast("array<double>"), 1, dim),
        lambda x: F.floor(x * 1000).cast("long"),
    )
    n2 = F.aggregate(
        F.col("qv"), F.lit(0).cast("bigint"), lambda a, x: a + x * x
    )
    base = lambda df: (  # noqa: E731
        df.select(F.col(id_col).alias("id"), q.alias("qv"))
        .withColumn("n2", n2)
        .where(F.col("n2") > 0)
    )
    # the sanctioned model-sized collect (the semdedup-centroids rule):
    # an eval benchmark is 10^4-10^5 vectors; sorted by id so numpy
    # argmax (first max wins) realizes the ties -> smallest-id rule
    ev_rows = base(eval_df).orderBy("id").collect()
    spark = train.sparkSession
    schema = "vec_id long, eval_id long, cos double"
    if not ev_rows:
        return spark.createDataFrame([], schema)
    E = np.array([r.qv for r in ev_rows], dtype=np.int64)
    en = np.sqrt(np.array([r.n2 for r in ev_rows], dtype=np.float64))
    eids = np.array([r.id for r in ev_rows], dtype=np.int64)
    bc = spark.sparkContext.broadcast((E, en, eids))
    thr = float(threshold)
    block_doubles = 16 * 1024 * 1024  # ~128 MB of cos per task block

    # The hot loop is a numpy int64 GEMM per Arrow batch, NOT a
    # Catalyst zip_with/aggregate fold: the fold form is semantically
    # identical but evaluates 64 multiply-adds through one array
    # allocation PER (row, eval) pair — measured 27.2 s vs 1.1 s
    # (DuckDB) at sf1.0 (19k x 1k x 64); the GEMM computes the same
    # exact int64 dots at BLAS speed. Dots stay exact: |floor(x*1000)|
    # ~ 10^3, so a 64-dim dot <= ~10^8 << 2^63, and int64 -> float64
    # conversion is exact below 2^53. Row blocks bound task memory to
    # ~block_doubles regardless of eval size.
    def probe(batches):
        Ev, env, evid = bc.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            Q = np.array(list(pdf["qv"]), dtype=np.int64)
            qn = np.sqrt(pdf["n2"].to_numpy(dtype=np.float64))
            vids = pdf["id"].to_numpy()
            blk = max(1, block_doubles // max(len(evid), 1))
            for i in range(0, n, blk):
                j = min(i + blk, n)
                cos = (Q[i:j] @ Ev.T).astype(np.float64) / np.outer(
                    qn[i:j], env
                )
                a = np.argmax(cos, axis=1)  # first max = smallest id
                best = cos[np.arange(j - i), a]
                hit = best >= thr
                if hit.any():
                    yield pd.DataFrame(
                        {
                            "vec_id": vids[i:j][hit],
                            "eval_id": evid[a[hit]],
                            "cos": best[hit],
                        }
                    )

    flagged = base(train).mapInPandas(probe, schema)
    # rounding stays JVM-side so the display convention is byte-for-
    # byte the one knn_graph's green rows established
    return flagged.select(
        "vec_id", "eval_id", F.round("cos", 6).alias("cos")
    )
