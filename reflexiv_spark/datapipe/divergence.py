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
queries window-affected in ``tools/check_window.py``. It owns a
single-scan bucket-histogram device rather than importing
``text._hashed_features`` (whose per-order union re-tokenizes the
corpus once per n-gram order — right for per-document consumers,
wasteful for a histogram); feature strings and hash-mod match that
device exactly so the oracles replay unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _hash_mod(c: Column, dim: int, hash_family: str) -> Column:
    if hash_family == "md5":
        from reflexiv_spark.datapipe.dedup import md5_long

        return F.pmod(md5_long(c), F.lit(dim))
    return F.pmod(F.xxhash64(c), F.lit(dim))


def _bucket_counts(
    df: DataFrame,
    text_col: str,
    dim: int,
    use_bigrams: bool,
    hash_family: str,
) -> DataFrame:
    """DataFrame[idx, c] — bucket counts of a corpus in ONE scan.

    Deliberately NOT ``text._hashed_features``: that device is a
    two-branch union (one explode per n-gram order), which re-reads and
    re-tokenizes the corpus once per order — fine when the consumer
    needs per-document rows, wasteful for a corpus-level histogram.
    Here the token array binds ONCE per row and the unigram + bigram
    feature strings concatenate into a single exploded array: one scan,
    one tokenization, per corpus (sf1.0: 12.4 s via the union device
    → 2.1 s warmed single-scan, xxhash64 family).
    Feature strings ('u|w', 'b|w1 w2') and the hash-mod device match
    text._hashed_features exactly, so oracles replay unchanged."""
    ws = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(r"\w+"), 0
    )
    uni = lambda w: F.transform(  # noqa: E731
        w, lambda x: F.concat(F.lit("u|"), x)
    )
    if use_bigrams:
        # the _del1 lesson: sequence(1, 0) is the DESCENDING [1, 0], so
        # sub-2-token docs must short-circuit to an empty array or the
        # element_at probes walk off the end
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
        feats = F.flatten(
            F.transform(F.array(ws), lambda w: F.concat(uni(w), bi(w)))
        )
    else:
        feats = F.flatten(F.transform(F.array(ws), uni))
    return (
        df.select(F.explode(feats).alias("f"))
        .select(_hash_mod(F.col("f"), dim, hash_family).alias("idx"))
        .groupBy("idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )


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
    # lazy barrier on the dim-bounded count relations: each feeds BOTH
    # the bucket join and its derived total below — without it the
    # single-scan histogram re-executes once per consumer (the first
    # cut read totals from the raw feature relations: 17.9 s at sf1.0;
    # single-scan + barrier is parity-class — 2.1 s warmed on the
    # xxhash64 family vs DuckDB ~2 s)
    ca = (
        _bucket_counts(a, text_col, dim, use_bigrams, hash_family)
        .withColumnRenamed("c", "ca")
        .localCheckpoint(eager=False)
    )
    cb = (
        _bucket_counts(b, text_col, dim, use_bigrams, hash_family)
        .withColumnRenamed("c", "cb")
        .localCheckpoint(eager=False)
    )
    # totals DERIVE from the counts (Σ ca == |fa| exactly — absent
    # buckets contribute 0), so no second pass over the corpus exists.
    # coalesce(…, 0): an EMPTY side sums to NULL, which would silently
    # NULL every divergence column — with 0 the add-1 smoothing mass is
    # the whole distribution (uniform 1/dim), the honest degenerate
    # case (round-12 ADVICE).
    ta = ca.agg(F.coalesce(F.sum("ca"), F.lit(0)).alias("ta"))
    tb = cb.agg(F.coalesce(F.sum("cb"), F.lit(0)).alias("tb"))
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


def reference_histogram(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 4096,
    use_bigrams: bool = True,
    hash_family: str = "xxhash64",
) -> list[int]:
    """Collect a corpus's bucket histogram as a dense Python list of
    length ``dim`` (the broadcast-reference input of
    :func:`windowed_divergence`). Model-sized by construction — the
    only driver materialization in the family."""
    rows = _bucket_counts(df, text_col, dim, use_bigrams, hash_family).collect()
    out = [0] * dim
    for r in rows:
        out[int(r["idx"])] = int(r["c"])
    return out


def windowed_divergence(
    df: DataFrame,
    ref_counts: list[int],
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    dim: int = 512,
    use_bigrams: bool = True,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Per-event-time-window KL drift vs a static reference →
    DataFrame[win_start, win_end, n_features, kl_wr_micro,
    kl_rw_micro] — the STREAMING member of the divergence family: a
    drift monitor that alerts when an hour/day of incoming documents
    stops looking like the reference corpus (crawl rot, source mix
    shifts, upstream pipeline bugs).

    Works identically on batch and streaming inputs (the
    streaming/windows.py contract; the suite pins batch == stream).
    Streaming plan: ONE chained stateful pair — groupBy(window, idx)
    count, then groupBy(window) collect of the dim-bounded histogram —
    with the KL computed IN-ROW against the broadcast reference
    literal (map lookup + one fold over dim entries; no second pass,
    no stream-stream join). Append-mode emission on watermark close.
    ``ref_counts`` is the dense dim-length histogram from
    :func:`reference_histogram` — model-sized driver state, the
    eval-pack rule."""
    if len(ref_counts) != dim:
        raise ValueError(f"ref_counts must have length dim={dim}")
    rt = sum(ref_counts)
    ws = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(r"\w+"), 0
    )
    uni = lambda w: F.transform(  # noqa: E731
        w, lambda x: F.concat(F.lit("u|"), x)
    )
    if use_bigrams:
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
        feats = F.flatten(
            F.transform(F.array(ws), lambda w: F.concat(uni(w), bi(w)))
        )
    else:
        feats = F.flatten(F.transform(F.array(ws), uni))
    src = df
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    binned = (
        src.select(F.col(ts_col), F.explode(feats).alias("f"))
        .select(
            F.window(ts_col, window).alias("win"),
            _hash_mod(F.col("f"), dim, hash_family).alias("idx"),
        )
        .groupBy("win", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hist = binned.groupBy("win").agg(
        F.map_from_entries(
            F.collect_list(F.struct("idx", "c"))
        ).alias("__h"),
        F.sum("c").alias("__tw"),
    )
    ref = F.array(*[F.lit(int(c)).cast("bigint") for c in ref_counts])
    h, tw = F.col("__h"), F.col("__tw")
    # in-row KL: one fold over the dim bucket indices; every term uses
    # the same floor-micro device as corpus_divergence, so the batch
    # twin (and any oracle replay) agrees bit-for-bit
    def _contrib(i: Column) -> Column:
        # element_at on a MAP keys by value (i IS the bucket key); on
        # the ARRAY it is 1-based positional
        cw = F.coalesce(F.element_at(h, i.cast("bigint")), F.lit(0))
        cr = F.element_at(ref, i.cast("int") + F.lit(1))
        pw = (cw + 1).cast("double") / (tw + dim).cast("double")
        pr = (cr + 1).cast("double") / (F.lit(rt) + dim).cast("double")
        return F.struct(
            F.floor(pw * (F.log10(pw) - F.log10(pr)) * MICRO)
            .cast("bigint")
            .alias("wr"),
            F.floor(pr * (F.log10(pr) - F.log10(pw)) * MICRO)
            .cast("bigint")
            .alias("rw"),
        )

    terms = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), _contrib)
    # fold ONCE into a (wr, rw) struct accumulator — two sibling
    # F.aggregate calls would embed the dim-length _contrib fold twice,
    # doubling per-row KL compute and plan size (round-12 ADVICE); the
    # two sums project out of the single fold in a SECOND select, which
    # CollapseProject keeps separate (HOF aggregates are non-cheap and
    # referenced twice).
    acc = F.aggregate(
        terms,
        F.struct(
            F.lit(0).cast("bigint").alias("wr"),
            F.lit(0).cast("bigint").alias("rw"),
        ),
        lambda a, t: F.struct(
            (a["wr"] + t["wr"]).alias("wr"),
            (a["rw"] + t["rw"]).alias("rw"),
        ),
    )
    return hist.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        tw.cast("bigint").alias("n_features"),
        acc.alias("__acc"),
    ).select(
        "win_start",
        "win_end",
        "n_features",
        F.col("__acc.wr").alias("kl_wr_micro"),
        F.col("__acc.rw").alias("kl_rw_micro"),
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
