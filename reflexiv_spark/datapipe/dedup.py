"""Deduplication operators: exact, containment, MinHash/LSH, SimHash,
exact n-gram Jaccard.

Scale design (100 TB): every operator here is bucketed — candidate pairs
come from equality joins on shingles / band signatures / hash chunks, never
from an all-pairs product. The exact containment kernel generalizes the
reference's contig dedup (marker k-mers → groupBy → containment scan,
``ReflexivDSDynamicKmerDedup.java:203-280``): the candidate index is the
full shingle set, the probe is each doc's *minimum* shingle (any container
must contain every shingle of the containee, in particular its minimum),
and a final ``contains`` verify removes false positives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from reflexiv_spark.operators.containment import contained_row_ids
from reflexiv_spark.plans.layout import spread


def md5_long(c: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint.

    The cross-engine-reproducible hash family: DuckDB computes the same
    value as ``('0x' || substr(md5(x), 1, 15))::BIGINT``, so operators
    parameterized on it are exactly replayable by an ANSI-SQL oracle.
    xxhash64 stays the production default (one JVM intrinsic vs a digest),
    selected per call via ``hash_family``.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for exact dedup: lowercase, trim, collapse
    whitespace runs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def shingle_array(col: Column | str, w: int) -> Column:
    """All character w-shingles of a string column (Catalyst-only)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.sequence(F.lit(1), F.length(c) - F.lit(w - 1)),
        lambda i: c.substr(i, F.lit(w)),
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per normalized text (smallest id wins).

    One hash shuffle on the normalized text. Partitioning directly on the
    text column costs the same shuffle volume as partitioning on a hash of
    it (the rows carry the text either way) and avoids hash-collision
    false merges.
    """
    w = Window.partitionBy(normalize_text(text_col)).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def drop_contained(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 20,
) -> DataFrame:
    """Remove rows whose text is a substring of another row's text.

    Drop rule (deterministic): row d is dropped iff some row D has
    ``contains(D.text, d.text)`` and (``len(D) > len(d)``, or lengths are
    equal — hence texts equal — and ``D.id < d.id``).

    Bucketed exactness: the index side explodes ALL w-shingles of every
    text; the probe side joins each text's MIN w-shingle — guaranteed to
    hit every true container — then verifies with ``contains``. Rows
    shorter than ``w`` are broadcast against the full set (they are rare
    and tiny by definition).
    """
    dropped = contained_row_ids(
        df,
        text_col,
        id_col,
        w,
        shingles=lambda c: shingle_array(c, w),
        verify=lambda sup, sub: F.contains(sup, sub),
    )
    return df.join(dropped, F.col(id_col) == dropped["__id"], "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via an inverted shingle index.

    Returns DataFrame[id1, id2, jaccard] with id1 < id2. Exact (no
    hashing): candidate pairs come from the shingle equi-join; the
    per-pair intersection count and the per-doc set sizes yield Jaccard
    directly. Scale path for very hot shingles is the MinHash variant
    (:func:`minhash_lsh_pairs`); this operator is the oracle-checkable
    exact form.

    Shingles collapse to 8-byte xxhash64 values before the exchange (~w×
    smaller than shipping raw shingle strings; a 64-bit collision would
    need two distinct shingles of the same doc-pair to collide — vanishing
    at any realistic corpus size, and it only perturbs one count by 1).
    """
    t, i = F.col(text_col), F.col(id_col)
    sh = (
        spread(df.where(F.length(t) >= w))
        .select(
            i.alias("id"),
            F.explode(
                F.array_distinct(
                    F.transform(shingle_array(text_col, w), lambda x: F.xxhash64(x))
                )
            ).alias("sh"),
        )
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("id").alias("id1"), "sh")
    b = sh.select(F.col("id").alias("id2"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("id").alias("id1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("id").alias("id2"), F.col("n").alias("n2"))
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return (
        inter.join(s1, "id1")
        .join(s2, "id2")
        .where(jac >= threshold)
        .select("id1", "id2", F.round(jac, 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    num_hashes: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """DataFrame[id, sig: array<bigint>] MinHash signatures.

    One shuffle: explode distinct shingles, then a single groupBy computing
    all ``num_hashes`` minima as independent agg expressions (map-side
    partial aggregation keeps shuffle volume at num_hashes longs per doc
    per partition). Each shingle string is hashed ONCE; the per-function
    hashes rehash that 8-byte long (seeded by position), which is ~w×
    cheaper than hashing the string ``num_hashes`` times and equally a
    universal family for min-hashing.

    ``hash_family="md5"`` swaps both levels to :func:`md5_long`
    (``md5(shingle)`` then ``md5(base || ':' || i)``) — bit-identical to
    the DuckDB oracle's formulation, so the whole LSH pipeline becomes
    exactly checkable; xxhash64 remains the production default.
    """
    # The num_hashes-proportional expressions are built as SQL-text
    # F.expr strings, parsed server-side in ONE py4j round trip each,
    # instead of Column compositions (3-5 round trips per hash slot).
    # Query CONSTRUCTION is driver wall paid per query; measured r13:
    # signature build 0.33 -> 0.15 s at num_hashes=64, outputs verified
    # bit-identical for both families at sf0.01. The SQL text mirrors
    # the Column form exactly: integer literal seeds type as INT both
    # ways, and the md5 line is ``md5_long`` inlined.
    if hash_family == "md5":
        base_hash = md5_long
        rehash_sql = (
            lambda i: "CAST(conv(substring(md5(concat("  # noqa: E731
            f"CAST(h AS STRING), ':{i}')), 1, 15), 16, 10) AS BIGINT)"
        )
    else:
        base_hash = F.xxhash64
        rehash_sql = lambda i: f"xxhash64(h, {i})"  # noqa: E731
    sh = (
        spread(df.where(F.length(text_col) >= w))
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.transform(shingle_array(text_col, w), lambda x: base_hash(x))
                )
            ).alias("h"),
        )
    )
    mins = sh.groupBy("id").agg(
        F.expr(f"min({rehash_sql(0)}) AS m0"),
        *[
            F.expr(f"min({rehash_sql(i)}) AS m{i}")
            for i in range(1, num_hashes)
        ],
    )
    return mins.select(
        "id",
        F.expr(
            "array(" + ",".join(f"m{i}" for i in range(num_hashes)) + ") AS sig"
        ),
    )


def _banded_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    w: int,
    num_hashes: int,
    bands: int,
    hash_family: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared front half of the LSH operators → (sigs, banded).

    ``sigs`` is the signature table, lazily checkpointed ONCE (it feeds
    the band explode AND the signature rejoins — 3 plan references would
    otherwise recompute the shingle aggregation 3×; lazy so the job runs
    with the caller's first action, which kept the md5 family's 800M-hash
    build out of DataFrame-construction time). ``banded`` is
    DataFrame[id, band_idx, band_key]; with ``hash_family="md5"`` the
    band key stays the raw comma-joined minima string (SQL ``string_agg``
    equivalent) so the oracle replays it, production re-hashes to 8 bytes.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, text_col, id_col, w, num_hashes, hash_family
    ).localCheckpoint(eager=False)

    # SQL-text band keys for the same construction-chatter reason as the
    # signature aggregate above: one server-side parse per band instead
    # of ~6 Column round trips per band
    def band_key(b):
        key = (
            "concat_ws(',', transform(slice(sig, "
            f"{b * rows_per_band + 1}, {rows_per_band}), "
            "x -> CAST(x AS STRING)))"
        )
        return key if hash_family == "md5" else f"xxhash64({key})"

    banded = sigs.select(
        "id",
        F.posexplode(
            F.expr("array(" + ",".join(band_key(b) for b in range(bands)) + ")")
        ).alias("band_idx", "band_key"),
    )
    return sigs, banded


def _verify_candidates(
    cands: DataFrame, sigs: DataFrame, num_hashes: int, threshold: float
) -> DataFrame:
    """Shared back half: rejoin both signatures by id for the surviving
    DISTINCT (id1, id2) candidates only — the id-only-exchange design
    rule (PLANS.md) — and keep pairs whose agreeing-position fraction
    meets ``threshold``."""
    s1 = sigs.select(F.col("id").alias("id1"), F.col("sig").alias("sig1"))
    s2 = sigs.select(F.col("id").alias("id2"), F.col("sig").alias("sig2"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig1"), F.col("sig2"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return (
        cands.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1",
            "id2",
            F.round(agree / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding (LSH).

    DataFrame[id1, id2, est_jaccard]: candidates share at least one band
    signature (bucketed equi-join — never all-pairs); est_jaccard is the
    fraction of agreeing signature positions. With 64 hashes / 16 bands
    (r=4), P(candidate) = 1-(1-j^4)^16 — steep around j≈0.5.

    With ``hash_family="md5"`` the band key stays the raw comma-joined
    minima string (SQL ``string_agg`` equivalent) instead of re-hashing it,
    keeping the plan oracle-replayable end to end.

    Candidate exchange is id-only (the engine's design rule — PLANS.md):
    the band join and the (id1, id2) pair-dedup carry 8-byte ids, and the
    two 64-long signatures are joined back by id only for the surviving
    distinct pairs. On near-dup-heavy corpora (hot buckets emitting the
    same pair from many bands) this keeps ~1 KB of signature payload out
    of every duplicate candidate — the same fix that took the vector
    LSH path from 87 s to 6.3 s at sf1.0.
    """
    sigs, banded = _banded_signatures(
        df, text_col, id_col, w, num_hashes, bands, hash_family
    )
    a = banded.select(F.col("id").alias("id1"), "band_idx", "band_key")
    b = banded.select(F.col("id").alias("id2"), "band_idx", "band_key")
    cands = (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )
    return _verify_candidates(cands, sigs, num_hashes, threshold)


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Drop every row that has a near-duplicate with a smaller id."""
    pairs = minhash_lsh_pairs(
        df, text_col, id_col, w, num_hashes, bands, threshold, hash_family
    )
    dropped = pairs.select(F.col("id2").alias("__drop")).distinct()
    return df.join(dropped, F.col(id_col) == F.col("__drop"), "left_anti")


def simhash_bits(hash_family: str = "xxhash64") -> int:
    """Signature width per family: 63 sign-safe bits of xxhash64, 60 bits
    of the md5-derived long."""
    return 60 if hash_family == "md5" else 63


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """DataFrame[id, simhash: bigint] — SimHash over word tokens.

    Per token, the family hash supplies the bit pattern; each bit position
    accumulates +1/-1 across tokens and the sign becomes the output bit
    (63 bits for xxhash64 — bit 63 unused to stay in positive long range —
    60 for the oracle-replayable md5 family). Single shuffle with one
    partial-aggregated sum per bit.
    """
    nbits = simhash_bits(hash_family)
    tok_hash = md5_long if hash_family == "md5" else F.xxhash64
    toks = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\w+"), 0)).alias("tok"),
    ).withColumn("h", tok_hash(F.col("tok")))
    sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(nbits)
        ]
    )
    sim = None
    for i in range(nbits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim + term
    return sums.select("id", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded on 4 chunks.

    Two hashes within Hamming distance 3 must agree on at least one of the
    four chunks (pigeonhole — 16 bits each for the 63-bit xxhash64 family,
    15 for the 60-bit md5 family), so candidates come from a chunk
    equi-join — never all-pairs. Beyond distance 3 the candidate set is
    the algorithm's own (recall < 1), which the md5-family oracle replays
    exactly.
    """
    cw = (simhash_bits(hash_family) + 3) // 4  # chunk width: 16 or 15
    mask = (1 << cw) - 1
    sims = simhash64(df, text_col, id_col, hash_family)
    chunked = sims.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), j * cw).bitwiseAND(F.lit(mask))
                    for j in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunked.select(
        F.col("id").alias("id1"), F.col("simhash").alias("s1"), "chunk_idx", "chunk"
    )
    b = chunked.select(
        F.col("id").alias("id2"), F.col("simhash").alias("s2"), "chunk_idx", "chunk"
    )
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .where(F.col("id1") < F.col("id2"))
        .dropDuplicates(["id1", "id2"])
        .withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )


def _token_ngrams(
    df: DataFrame, n: int, text_col: str, id_col: str, hash_family: str
) -> DataFrame:
    """(id, n_tokens, pos, h): every word n-gram of every doc, hashed to a
    bigint so the global-frequency shuffle moves 8-byte keys, not text."""
    toks = F.expr(rf"regexp_extract_all(lower(coalesce({text_col}, '')), '\\w+', 0)")
    base = df.select(F.col(id_col).alias("id"), toks.alias("__ws")).withColumn(
        "n_tokens", F.size("__ws")
    )
    if hash_family == "md5":
        # oracle family: the gram STRING is what DuckDB md5s, so build it
        gram_hash = lambda i: md5_long(  # noqa: E731
            F.concat_ws(" ", F.slice("__ws", i, F.lit(n)))
        )
    else:
        # production family: xxhash64 hashes the sliced token array
        # directly — no per-gram string assembly (measured 5.6 → 4.0 s
        # for the 2.4M-gram build at sf1.0)
        gram_hash = lambda i: F.xxhash64(F.slice("__ws", i, F.lit(n)))  # noqa: E731
    grams = F.transform(
        F.sequence(F.lit(1), F.col("n_tokens") - F.lit(n - 1)), gram_hash
    )
    return base.where(F.col("n_tokens") >= n).select(
        "id",
        "n_tokens",
        F.posexplode(grams).alias("pos", "h"),
    )


def _merged_dup_segments(
    df: DataFrame,
    n: int,
    text_col: str,
    id_col: str,
    min_count: int,
    hash_family: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared span kernel for the two dup-span operators →
    (marked[id, s, e], merged[id, seg, s, e]).

    grams → hot-set count shuffle → 8-byte mark join → running-max
    interval merge (overlapping AND adjacent spans coalesce). Kept in
    ONE place so the report (:func:`duplicate_ngram_spans`) and the
    cleaner (:func:`drop_duplicate_spans`) can never disagree about
    what counts as a duplicated span. The gram table is checkpointed —
    it feeds the hot-set aggregation AND the mark join (measured
    20.2 s → 2.3 s at sf1.0 without/with).
    """
    grams = _token_ngrams(df, n, text_col, id_col, hash_family).localCheckpoint(
        eager=False
    )
    hot = (
        grams.groupBy("h")
        .agg(F.count("*").alias("__c"))
        .where(F.col("__c") >= min_count)
        .select("h")
    )
    marked = grams.join(hot, "h").select(
        "id",
        F.col("pos").alias("s"),
        (F.col("pos") + F.lit(n - 1)).alias("e"),
    )
    w = Window.partitionBy("id").orderBy("s")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    merged = (
        marked.withColumn(
            "__ns",
            F.when(prev_max.isNull() | (F.col("s") > prev_max + 1), 1).otherwise(0),
        )
        .withColumn(
            "seg", F.sum("__ns").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("id", "seg")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    return marked, merged


def duplicate_ngram_spans(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Substring-level duplicate detection at word-n-gram granularity
    (the scalable form of Lee et al.'s ExactSubstr dedup, ACL 2022 —
    the suffix-array pass is replaced by a corpus-wide n-gram frequency
    pass, which a distributed hash aggregation does in one shuffle).

    A token window of ``n`` words appearing ``min_count``+ times
    corpus-wide marks its span; per doc the marked spans are
    interval-merged with two per-doc windows (running-max segmenter —
    no UDF, no per-doc collect). Overlapping *and adjacent* spans merge,
    so ``dup_spans`` counts contiguous duplicated regions. Returns one row per input doc:
    ``doc_id, n_tokens, dup_ngrams, dup_spans, dup_tokens, dup_frac``.

    Scale: n-grams travel as (id, pos, bigint-hash) triples; the hot-gram
    set comes from one count shuffle with map-side partial aggregation;
    the mark join is an 8-byte equi-join (AQE splits hot grams — the
    boilerplate n-gram in a web corpus is exactly the skew-join case
    proven in tests/test_skew.py); the interval merge shuffles each doc's
    *duplicated* positions only, once. Nothing is quadratic anywhere.
    """
    marked, merged = _merged_dup_segments(
        df, n, text_col, id_col, min_count, hash_family
    )
    spans = merged.select(
        "id", "seg", (F.col("e") - F.col("s") + F.lit(1)).alias("covered")
    )
    per_doc = spans.groupBy("id").agg(
        F.count("*").alias("dup_spans"),
        F.sum("covered").alias("dup_tokens"),
    )
    gram_counts = marked.groupBy("id").agg(F.count("*").alias("dup_ngrams"))
    toks = df.select(
        F.col(id_col).alias("id"),
        F.size(
            F.expr(
                rf"regexp_extract_all(lower(coalesce({text_col}, '')), '\\w+', 0)"
            )
        ).alias("n_tokens"),
    )
    return (
        toks.join(per_doc, "id", "left")
        .join(gram_counts, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.coalesce("dup_ngrams", F.lit(0)).cast("bigint").alias("dup_ngrams"),
            F.coalesce("dup_spans", F.lit(0)).cast("bigint").alias("dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


def drop_duplicate_spans(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Remove the duplicated-span *tokens* found by
    :func:`duplicate_ngram_spans`, keeping each doc's surviving tokens in
    order (``doc_id, cleaned, n_tokens_kept, n_tokens_dropped``).

    ``cleaned`` is the NORMALIZED token stream, not a substring rewrite
    of the original text: tokenization lowercases, strips punctuation
    (``\\w+`` extraction), and rejoins survivors with single spaces, so
    original casing, punctuation, and whitespace are lost even in
    non-duplicated regions. (The reference's ExactSubstr-style removal
    rewrites raw bytes instead; this operator trades that fidelity for
    the shuffle-free tokenized span join.)

    The kept/dropped decision reuses the merged spans; token positions
    join their doc's spans on ``id`` and filter by containment — spans
    per doc are few (merged), so the per-doc expansion is bounded by
    span count, not span length.
    """
    _, merged = _merged_dup_segments(
        df, n, text_col, id_col, min_count, hash_family
    )
    spans = merged.groupBy("id").agg(
        F.collect_list(F.struct("s", "e")).alias("__spans")
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        F.expr(
            rf"regexp_extract_all(lower(coalesce({text_col}, '')), '\\w+', 0)"
        ).alias("__ws"),
    )
    joined = toks.join(spans, "id", "left")
    kept = F.filter(
        F.transform(
            F.coalesce("__ws", F.array()),
            lambda t, i: F.when(
                F.exists(
                    F.coalesce("__spans", F.array()),
                    lambda sp: (i >= sp["s"]) & (i <= sp["e"]),
                ),
                F.lit(None).cast("string"),
            ).otherwise(t),
        ),
        lambda t: t.isNotNull(),
    )
    return joined.select(
        F.col("id").alias(id_col),
        F.concat_ws(" ", kept).alias("cleaned"),
        F.size(kept).cast("bigint").alias("n_tokens_kept"),
        (F.size(F.coalesce("__ws", F.array())) - F.size(kept))
        .cast("bigint")
        .alias("n_tokens_dropped"),
    )


def minhash_star_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Star-shaped LSH candidate edges for duplicate CLUSTERING:
    DataFrame[id1, id2, est_jaccard] where id1 is each band bucket's
    minimum member (the hub).

    :func:`minhash_lsh_pairs` honors the all-pairs contract — a bucket
    of n clones emits C(n,2) candidates, which is the right answer for
    "list every near-duplicate pair" but quadratic in clone multiplicity.
    When the pairs only feed connected components
    (:func:`reflexiv_spark.datapipe.cluster.dup_clusters`), a spanning
    star per bucket carries the same connectivity with n-1 edges: the
    100-clone families of a crawl-heavy corpus drop from ~4,950 pairs
    per band bucket to 99. Edges are still verified by signature
    agreement ≥ threshold, so a bucket's false-positive stragglers do
    not glue clusters together; the documented approximation vs
    all-pairs clustering is that two docs similar only to EACH OTHER
    (but not to their bucket's hub) need some band where one of them is
    the hub — for clone families (the case this exists for) hubs are
    clones too and components come out identical, which
    ``test_star_edges_same_components`` pins.

    Scale shape: identical to the all-pairs path (one band shuffle,
    id-only candidates, signatures rejoined by id at the end) with the
    per-bucket quadratic term gone — the hub aggregation is a
    map-side-combinable min per (band, key).
    """
    sigs, banded = _banded_signatures(
        df, text_col, id_col, w, num_hashes, bands, hash_family
    )
    hubs = banded.groupBy("band_idx", "band_key").agg(
        F.min("id").alias("id1")
    )
    edges = (
        banded.join(hubs, ["band_idx", "band_key"])
        .where(F.col("id") != F.col("id1"))
        .select("id1", F.col("id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    return _verify_candidates(edges, sigs, num_hashes, threshold)
