"""Text analysis operators: stats, language ID, quality scoring, token
counting, fingerprinting.

All Catalyst-only (regexp/length/transform expressions — whole-stage
codegen, no Python in the hot path). Every operator is embarrassingly
parallel per row: no shuffle at all, so they scale linearly with input
splits at any data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword sets for the n-gram-free language heuristic. Deliberately tiny:
# the point is a cheap, deterministic, SQL-expressible scorer.
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "les", "une", "est", "et", "dans", "que"),
    "es": ("el", "los", "una", "es", "y", "en", "que"),
}


def _count_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def _stopword_hits(col: Column, words: tuple[str, ...]) -> Column:
    return _count_matches(F.lower(col), r"\b(" + "|".join(words) + r")\b")


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document surface statistics.

    Token = maximal non-whitespace run (``\\S+``) — identical semantics in
    Java regex and RE2, so the oracle can reproduce it.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = _count_matches(t, r"\S+")
    n_alnum = F.length(F.regexp_replace(t, r"[^A-Za-z0-9]", ""))
    n_punct = _count_matches(t, r"[^\w\s]")
    n_digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_spaces = n_chars - F.length(F.regexp_replace(t, r"\s", ""))
    avg_token_len = F.round(
        (n_chars - n_spaces) / F.greatest(n_tokens, F.lit(1)), 4
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_alnum.alias("n_alnum"),
        n_punct.alias("n_punct"),
        n_digits.alias("n_digits"),
        n_spaces.alias("n_spaces"),
        avg_token_len.alias("avg_token_len"),
    )


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace and BPE-ish tokenization counts.

    ``re_tokens`` uses the GPT-style pre-tokenizer shape — word runs or
    single non-word-non-space symbols (``\\w+|[^\\w\\s]``).
    """
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        _count_matches(t, r"\S+").alias("ws_tokens"),
        _count_matches(t, r"\w+|[^\w\s]").alias("re_tokens"),
        _count_matches(t, r"\w+").alias("word_tokens"),
    )


def _pred_lang(t: Column) -> Column:
    """The language-ID argmax as a pure column expression (fixed
    precedence en > de > fr > es on ties) — composable into other
    single-scan projections (``pipeline.clean_corpus`` scores quality
    and language in ONE pass; a per-operator DataFrame + id join would
    re-scan the corpus and shuffle for nothing)."""
    scores = {
        lang: _stopword_hits(t, words) for lang, words in LANG_STOPWORDS.items()
    }
    s_en, s_de, s_fr, s_es = scores["en"], scores["de"], scores["fr"], scores["es"]
    return (
        F.when((s_en >= s_de) & (s_en >= s_fr) & (s_en >= s_es), "en")
        .when((s_de >= s_fr) & (s_de >= s_es), "de")
        .when(s_fr >= s_es, "fr")
        .otherwise("es")
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID via stopword-hit scoring.

    Deterministic argmax with fixed precedence en > de > fr > es on ties.
    """
    t = F.col(text_col)
    scores = {
        lang: _stopword_hits(t, words) for lang, words in LANG_STOPWORDS.items()
    }
    return df.select(
        F.col(id_col),
        scores["en"].alias("s_en"),
        scores["de"].alias("s_de"),
        scores["fr"].alias("s_fr"),
        scores["es"].alias("s_es"),
        _pred_lang(t).alias("pred_lang"),
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> DataFrame:
    """Composite document-quality score in [0, 1].

    0.3·min(1, tokens/50) + 0.3·stopword-ratio + 0.2·(1 − punct-ratio)
    + 0.2·(1 − digit-ratio). Cheap, deterministic, SQL-expressible — the
    shape of a Gopher/C4-style quality filter. ``keep_text`` carries the
    text column through (streaming callers can't join it back by id
    without a stream-stream join).
    """
    t = F.col(text_col)
    n_chars = F.greatest(F.length(t), F.lit(1))
    n_tokens = _count_matches(t, r"\S+")
    stop_hits = _stopword_hits(t, LANG_STOPWORDS["en"])
    punct_ratio = _count_matches(t, r"[^\w\s]") / n_chars
    digit_ratio = F.length(F.regexp_replace(t, r"[^0-9]", "")) / n_chars
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(50.0)) * 0.3
        + stop_ratio * 0.3
        + (F.lit(1.0) - punct_ratio) * 0.2
        + (F.lit(1.0) - digit_ratio) * 0.2
    )
    cols = [F.col(id_col)]
    if keep_text:
        cols.append(F.col(text_col))
    return df.select(
        *cols,
        n_tokens.alias("n_tokens"),
        F.round(score, 6).alias("quality"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap_tokens: int = 8,
) -> DataFrame:
    """Split documents into overlapping token-bounded chunks —
    DataFrame[id, chunk_idx, chunk_text, chunk_tokens].

    Tokens are whitespace runs (the ``\\S+`` semantics shared with
    :func:`text_stats`, so budgets line up with token counts). Chunks
    advance by ``chunk_tokens - overlap_tokens`` tokens; the final chunk
    may be short but is never empty. Catalyst-only: one ``split`` + a
    ``sequence``/``transform`` window over the token array, exploded —
    embarrassingly parallel per row, no shuffle, the standard
    context-window preparation step for LLM training corpora.
    """
    t = F.col(text_col)
    step = max(chunk_tokens - overlap_tokens, 1)
    # The token array enters the per-chunk lambda as a LAMBDA VARIABLE
    # (1-element outer transform), not inline: HOF lambdas re-evaluate
    # their body per element, so an inlined ``toks`` re-runs the
    # whitespace split once per chunk (the winnow.py round-10 lesson;
    # same fix as decontam.word_ngrams).
    chunks = F.flatten(
        F.transform(
            F.array(F.split(F.trim(t), r"\s+")),
            lambda toks: F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(
                            (F.size(toks) - F.lit(chunk_tokens))
                            / F.lit(step)
                        ),
                        F.lit(0),
                    ),
                ),
                lambda b: F.array_join(
                    F.slice(toks, b * step + 1, chunk_tokens), " "
                ),
            ),
        )
    )
    out = df.where(F.length(F.trim(t)) > 0).select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )
    return out.withColumn(
        "chunk_tokens", F.size(F.split(F.col("chunk_text"), r"\s+"))
    )


# Redaction patterns chosen to mean the same thing in Java regex and
# RE2 (no lookarounds/backrefs), so SQL oracles replay them exactly.
PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "url": (r"https?://[^\s]+", "<URL>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, tuple[str, str]] | None = None,
    out_col: str = "redacted",
) -> DataFrame:
    """Replace PII-shaped spans with typed placeholder tokens —
    DataFrame[id, redacted, n_<name>...] with one match count per
    pattern.

    Pure Catalyst ``regexp_replace``/``regexp_extract_all`` chain:
    shuffle-free, whole-stage codegen, linear at any scale. Patterns
    apply in dict order (emails before URLs matters when an address
    appears inside a query string); counts are measured on the text as
    each pattern sees it.
    """
    pats = patterns or PII_PATTERNS
    cur = F.col(text_col)
    counts = []
    for name, (pat, token) in pats.items():
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, token)
    return df.select(F.col(id_col), cur.alias(out_col), *counts)


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Perplexity-style fluency score from a corpus-trained unigram model
    — DataFrame[id, n_tokens, avg_logprob].

    The CCNet-shape filter: score each document by the mean log
    probability of its tokens under a language model and drop the tails
    (gibberish scores low, boilerplate scores suspiciously high). Here
    the model is the corpus' own unigram distribution — two passes, both
    distributed: (1) one token-count aggregation builds the model, (2)
    each document's exploded tokens join the model and average their
    log10 probabilities. The model join is left to Catalyst/AQE: a
    curated vocabulary broadcasts, but a hapax-heavy web corpus has a
    vocabulary rivalling the corpus itself, where a forced broadcast
    would OOM and a shuffle join is right. Deterministic and
    ANSI-SQL-replayable: log10/avg of identical doubles, rounded.
    """
    # lazy checkpoint of the UN-exploded token arrays: two plan
    # consumers (the model build and the scoring join) each re-ran the
    # scan + regexp tokenizer — 2 corpus tokenizations per run. The
    # array form materializes once and both consumers explode from the
    # stored arrays (the same single-tokenize device as
    # :func:`bigram_logprob_score`; checkpointing the EXPLODED table
    # was measured a loss — it is larger than the corpus).
    base = df.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(r"\w+"), 0
        ).alias("__ws"),
    ).localCheckpoint(eager=False)
    toks = base.select(F.col(id_col), F.explode("__ws").alias("token"))
    model = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    total = model.agg(F.sum("tf").alias("n")).select("n")
    lp = model.crossJoin(F.broadcast(total)).select(
        "token", F.log10(F.col("tf") / F.col("n")).alias("lp")
    )
    return (
        toks.join(lp, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), round_digits).alias("avg_logprob"),
        )
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", w: int = 16
) -> DataFrame:
    """Winnowing-style fingerprint: min MD5 over all w-shingles.

    Content-defined (shift-invariant): unaffected by document
    concatenation order, stable under prefix/suffix edits away from the
    minimizing shingle — the standard building block for near-dup corpus
    bookkeeping at scale.
    """
    t = F.col(text_col)
    fp = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(w - 1)),
            lambda i: F.md5(t.substr(i, F.lit(w))),
        )
    )
    return df.where(F.length(t) >= w).select(
        F.col(id_col), fp.alias("fingerprint")
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetitive-text statistics per document:
    DataFrame[id, n_lines, dup_line_frac, dup_line_char_frac,
    top_bigram, top_bigram_char_frac].

    - ``dup_line_frac``: 1 − distinct/total over non-empty trimmed
      lines — the "document is mostly the same line over and over"
      signal.
    - ``dup_line_char_frac``: fraction of line characters that sit in a
      line occurring more than once.
    - ``top_bigram_char_frac``: characters covered by the most frequent
      word bigram (count × bigram length / document length); ties break
      to the lexicographically smallest bigram so the statistic is
      deterministic.

    These are the repetition filters of Rae et al., "Scaling Language
    Models: ... Gopher" (arXiv:2112.11446) §A1.1, re-derived as
    DataFrame aggregations. Line stats are one shuffle keyed by
    (doc, line); bigram stats one shuffle keyed by (doc, bigram) —
    both keys are doc-scoped so there is no global hot key and the
    fan-out is bounded by document length. Docs with no lines / fewer
    than two words get zero fractions, never dropped.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(F.col(id_col), t.alias("__t"))

    # --- line-level: explode non-empty trimmed lines, count per line
    lines = base.select(
        id_col, F.explode(F.split(F.col("__t"), "\n")).alias("__l")
    ).select(id_col, F.trim(F.col("__l")).alias("line")).where(F.col("line") != "")
    lc = lines.groupBy(id_col, "line").agg(F.count(F.lit(1)).alias("c"))
    la = lc.groupBy(id_col).agg(
        F.sum("c").alias("n_lines"),
        (F.lit(1.0) - F.count(F.lit(1)) / F.sum("c").cast("double")).alias(
            "__dlf"
        ),
        (
            F.sum(F.when(F.col("c") > 1, F.col("c") * F.length("line")).otherwise(0))
            / F.sum(F.col("c") * F.length("line")).cast("double")
        ).alias("__dlcf"),
    )

    # --- bigram-level: posexplode single words, pair adjacent tokens
    # with a lead() window (doc-scoped sort, bounded by doc length),
    # count per (doc, w1, w2). Building bigrams this way is ~7× faster
    # at sf1.0 than materializing shifted word arrays with
    # slice/zip_with (measured 1.7 s vs 11.4 s for the stage): rows
    # carry one short string each and the pair never exists as an
    # array element. The bigram STRING is only assembled inside the
    # final argmax — and since tokens contain no spaces, ordering by
    # (w1, w2) is identical to ordering by the concatenated bigram.
    words = F.regexp_extract_all(F.lower(F.col("__t")), F.lit(r"\w+"), 0)
    from pyspark.sql import Window

    we = base.select(
        id_col,
        F.greatest(F.length("__t"), F.lit(1)).alias("__n_chars"),
        F.posexplode(words).alias("pos", "w"),
    )
    lw = Window.partitionBy(id_col).orderBy("pos")
    pairs = we.select(
        id_col,
        "__n_chars",
        "w",
        F.lead("w").over(lw).alias("w2"),
    ).where(F.col("w2").isNotNull())
    bc = pairs.groupBy(id_col, "w", "w2").agg(
        F.count(F.lit(1)).alias("c"), F.first("__n_chars").alias("__n_chars")
    )
    # argmax by (c desc, bigram asc) as a HASH aggregate, not a sort
    # window: min_by over the (-c, w, w2) struct picks the highest
    # count and breaks ties to the smallest bigram — one map-side-
    # combinable pass instead of a per-doc sort
    top = (
        bc.groupBy(id_col)
        .agg(
            F.min_by(
                F.struct(
                    F.concat(F.col("w"), F.lit(" "), F.col("w2")).alias(
                        "bigram"
                    ),
                    F.col("c"),
                    F.col("__n_chars"),
                ),
                F.struct((-F.col("c")).alias("nc"), F.col("w"), F.col("w2")),
            ).alias("__top")
        )
        .select(
            id_col,
            F.col("__top.bigram").alias("top_bigram"),
            F.round(
                F.col("__top.c") * F.length("__top.bigram")
                / F.col("__top.__n_chars"),
                6,
            ).alias("top_bigram_char_frac"),
        )
    )

    return (
        df.select(id_col)
        .join(la, id_col, "left")
        .join(top, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_lines", F.lit(0)).cast("bigint").alias("n_lines"),
            F.round(F.coalesce("__dlf", F.lit(0.0)), 6).alias("dup_line_frac"),
            F.round(F.coalesce("__dlcf", F.lit(0.0)), 6).alias(
                "dup_line_char_frac"
            ),
            F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
            F.coalesce("top_bigram_char_frac", F.lit(0.0)).alias(
                "top_bigram_char_frac"
            ),
        )
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """DataFrame[id, n_bytes, c_bytes, ratio] — zlib-compressed size over
    raw UTF-8 size per document.

    The classic cheap repetition detector (used alongside the Gopher
    rules): templated/spammy text compresses far below ~0.4, fluent
    prose sits near 0.5–0.7, random or already-compressed payloads near
    1.0. Arrow-batched ``mapInPandas`` (stdlib zlib — deterministic for
    a fixed level); no SQL oracle because DuckDB has no zlib, so this
    stays a library operator with pytest coverage rather than a driver
    query. Embarrassingly parallel — zero shuffle.
    """
    import zlib

    import pandas as pd

    schema = (
        f"{id_col} long, n_bytes bigint, c_bytes bigint, ratio double"
    )

    def _ratios(batches):
        for pdf in batches:
            ids, nb, cb = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                raw = (t or "").encode("utf-8")
                comp = zlib.compress(raw, level)
                ids.append(i)
                nb.append(len(raw))
                cb.append(len(comp))
            out = pd.DataFrame(
                {id_col: ids, "n_bytes": nb, "c_bytes": cb}
            )
            out["ratio"] = out["c_bytes"] / out["n_bytes"].clip(lower=1)
            out["ratio"] = out["ratio"].round(6)
            yield out

    return df.select(id_col, text_col).mapInPandas(_ratios, schema)


def drop_frequent_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_count: int = 2,
) -> DataFrame:
    """C4-style global line deduplication: remove every line that occurs
    more than ``max_count`` times across the WHOLE corpus (boilerplate —
    nav bars, cookie banners, license headers — repeats across
    documents; prose does not), then reassemble each document with its
    surviving lines in original order.

    DataFrame[id, cleaned, n_lines_kept, n_lines_dropped].

    Plan: posexplode lines (doc-scoped positions), count per trimmed
    line globally — the one corpus-wide shuffle, map-side combined, one
    row per DISTINCT line — then rejoin counts and rebuild with an
    ordered ``string_agg``-equivalent (sort_array over (pos, line)
    structs). The frequent-line table is usually tiny, but the plan
    never assumes it: the count join is a plain equi-join on the line
    key, broadcast by AQE when it fits. Empty/whitespace lines are kept
    verbatim (they carry formatting, and counting them globally would
    make every paragraph break "frequent").
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(t, "\n")).alias("pos", "line"),
    ).withColumn("key", F.trim(F.col("line")))

    counts = (
        lines.where(F.col("key") != "")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    tagged = lines.join(counts, "key", "left").withColumn(
        "__keep", F.coalesce(F.col("__n"), F.lit(0)) <= max_count
    )
    rebuilt = tagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("cleaned"),
        F.sum(F.when(F.col("__keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_lines_kept"),
        F.sum(F.when(F.col("__keep"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_lines_dropped"),
    )
    return df.select(id_col).join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("cleaned", F.lit("")).alias("cleaned"),
        F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
        F.coalesce("n_lines_dropped", F.lit(0)).alias("n_lines_dropped"),
    )


def vocab_coverage(
    df: DataFrame,
    vocab_size: int = 500,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer-vocabulary coverage report: build the top-``vocab_size``
    corpus vocabulary (frequency desc, token asc — a deterministic
    boundary), then score every doc's out-of-vocabulary rate
    (``doc_id, n_tokens, oov_tokens, oov_frac``).

    The training-data use: before committing a tokenizer vocab, measure
    what fraction of each source's tokens it covers; high-OOV docs are
    transliteration/garbage candidates.

    Scale: the frequency pass is one hash aggregation over (token)
    8-byte-hashable keys; the top-k is Spark's distributed
    TakeOrderedAndProject (never a single-partition window); the vocab
    (≤ ``vocab_size`` rows) broadcasts into the per-doc probe join, so
    the second pass over the corpus is shuffle-free until the final
    doc-keyed aggregation.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(
                rf"regexp_extract_all(lower(coalesce({text_col}, '')), '\\w+', 0)"
            )
        ).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("__n"))
        .orderBy(F.col("__n").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    scored = toks.join(F.broadcast(vocab), "tok", "left").groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)).alias(
            "oov_tokens"
        ),
    )
    base = df.select(F.col(id_col).alias("id"))
    return base.join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce("oov_tokens", F.lit(0)).cast("bigint").alias("oov_tokens"),
        F.round(
            F.coalesce("oov_tokens", F.lit(0))
            / F.greatest(F.coalesce("n_tokens", F.lit(0)), F.lit(1)),
            6,
        ).alias("oov_frac"),
    )


def bigram_logprob_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Self-supervised bigram fluency score: train an add-1-smoothed
    bigram model on the corpus itself, then score each doc by its mean
    ``log10 P(w2 | w1)`` — the bigram upgrade of
    :func:`unigram_logprob_score` (word-order-aware: shuffled or
    boilerplate-spliced text scores visibly lower than fluent text with
    the same unigram profile).

    ``P(w2|w1) = (C(w1 w2) + 1) / (C(w1) + V)``, V = corpus vocabulary
    size. Returns ``(doc_id, n_bigrams, avg_logprob)``; docs with < 2
    tokens get ``(0, 0.0)``.

    Scale: two corpus-wide hash aggregations build the model (bigram and
    unigram counts — model size is the distinct-bigram count, not the
    corpus); the scoring pass joins each doc's bigrams to the model on
    the (w1, w2) pair, an AQE-planned equi-join (broadcast when the
    model is small), then one doc-keyed aggregation. log10/round(6) is
    the same cross-engine determinism device the unigram scorer uses.
    """
    toks = F.expr(
        rf"regexp_extract_all(lower(coalesce({text_col}, '')), '\\w+', 0)"
    )
    # lazy checkpoint: FOUR plan consumers read the token arrays (the
    # bigram probe, the bigram counts, the unigram counts, the id spine)
    # and each union-free subtree re-ran the scan + regexp tokenizer —
    # 4 corpus tokenizations per run. Materializing (id, __ws, n) once
    # tokenizes once; consumers explode from the stored arrays.
    # Measured r13: 2.45 -> 2.09 s at sf0.1, outputs identical at
    # sf0.01/sf0.1 and the oracle twin green.
    base = df.select(F.col(id_col).alias("id"), toks.alias("__ws")).withColumn(
        "n", F.size("__ws")
    ).localCheckpoint(eager=False)
    # int-position explode (r13): pick the two elements per output row
    # instead of materializing a struct-pair array per document
    bigrams = base.where(F.col("n") >= 2).select(
        "id",
        "__ws",
        F.explode(F.sequence(F.lit(1), F.col("n") - 1)).alias("__i"),
    ).select(
        "id",
        F.element_at("__ws", F.col("__i")).alias("w1"),
        F.element_at("__ws", F.col("__i") + 1).alias("w2"),
    )
    unigrams = base.select(F.explode("__ws").alias("tok"))
    uni = unigrams.groupBy("tok").agg(F.count("*").alias("c1"))
    # |vocab| is the unigram model's row count — one tiny agg over the
    # model instead of a second full explode + count_distinct pass
    vocab_n = uni.agg(F.count(F.lit(1)).alias("__v"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    scored = (
        bigrams.join(bi, ["w1", "w2"])
        .join(uni, F.col("w1") == F.col("tok"))
        .crossJoin(F.broadcast(vocab_n))
        .withColumn(
            "__lp",
            F.log10((F.col("c2") + 1) / (F.col("c1") + F.col("__v"))),
        )
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("__lp"), 6).alias("avg_logprob"),
        )
    )
    return base.select("id").join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
    )


def strip_markup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """HTML/markup → plain text: drop <script>/<style> blocks and
    comments, strip tags, unescape the common entities, collapse
    whitespace → ``(doc_id, text, orig_chars, clean_chars)``.

    The first cleaning stage of every web-corpus pipeline. Pure
    regexp_replace chain — whole-stage codegen, zero shuffle, linear in
    input splits at any scale. Patterns avoid backreferences so the
    identical chain runs under both Java regex and RE2 (the SQL
    oracle); lazy quantifiers keep block removal linear-ish and
    non-nested blocks exact (a <script> inside a quoted string is the
    documented false positive, same trade every regex-based stripper
    makes). The whitespace collapse spells out its character class —
    Java's ``\\s`` includes vertical tab (\\x0B), RE2's does not, so a
    bare ``\\s+`` silently diverges cross-engine on scraped text.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    s = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, r"(?is)<style[^>]*>.*?</style>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; decodes in one pass like browsers don't — documented single-pass order
    ):
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.trim(F.regexp_replace(s, r"[ \t\n\x0B\f\r]+", " "))
    return df.select(
        id_col,
        s.alias(text_col),
        F.length(c).cast("bigint").alias("orig_chars"),
        F.length(s).cast("bigint").alias("clean_chars"),
    )


def _hashed_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int,
    use_bigrams: bool,
    hash_family: str,
):
    """Shared feature plumbing for the hashed linear scorers →
    (base[id], feats[id, idx], hash_fn). One explode per n-gram order;
    the feature index is hash(feature) mod dim; ``hash_fn`` is the
    family's Column hasher (the frozen twin derives weights with it)."""
    from reflexiv_spark.datapipe.dedup import md5_long

    def _h(c: Column) -> Column:
        if hash_family == "md5":
            return md5_long(c)
        return F.pmod(F.xxhash64(c), F.lit(1 << 60))

    toks = F.expr(
        rf"regexp_extract_all(lower(coalesce({text_col}, '')), '\\w+', 0)"
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("__ws")).withColumn(
        "n", F.size("__ws")
    )
    # ONE scan, one tokenization: unigram and bigram feature strings
    # concatenate into a single in-row array before the explode. The
    # old form unioned one explode per n-gram order, and each union
    # branch re-ran the scan + regexp tokenizer (2 corpus passes with
    # bigrams on — the waste divergence.py's _bucket_counts documents;
    # r13 applies the same single-scan device here). __ws is a bound
    # projection column, so element_at probes never re-tokenize. Same
    # (id, feature) multiset per document — every consumer aggregates,
    # so outputs are identical (oracle twins verified green).
    uni_arr = F.transform("__ws", lambda x: F.concat(F.lit("u|"), x))
    if use_bigrams:
        bi_arr = F.when(
            F.col("n") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.col("n") - 1),
                lambda i: F.concat(
                    F.lit("b|"),
                    F.element_at("__ws", i),
                    F.lit(" "),
                    F.element_at("__ws", i + 1),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        feat_arr = F.concat(uni_arr, bi_arr)
    else:
        feat_arr = uni_arr
    feats = base.select("id", F.explode(feat_arr).alias("f"))
    idx = F.pmod(_h(F.col("f")), F.lit(dim))
    return base, feats.select("id", idx.alias("idx")), _h


def classifier_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    use_bigrams: bool = True,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Hashed linear (fastText-style) document scorer →
    ``(doc_id, n_feats, logit)``.

    The inference half of the standard quality-classifier pipeline
    stage: each unigram/bigram hashes into one of ``dim`` feature
    buckets and the document logit is the mean bucket weight. Here the
    weight table is a FROZEN pseudo-random model — ``weight(i) =
    hash('w|' + i) mod 2001 - 1000`` milli-units — so the operator is
    self-contained and bit-replayable; swapping in a trained model is a
    broadcast join against a real (index, weight) table with the same
    feature plumbing.

    Determinism: weights are integers and the per-doc sum is a bigint,
    so the ONLY float op is the final division — exact cross-engine
    replay without tolerance games. Scale: weight lookup is a pure
    expression (no model join/shuffle); one doc-keyed aggregation.
    """
    base, fidx, _h = _hashed_features(
        df, text_col, id_col, dim, use_bigrams, hash_family
    )
    wt = F.pmod(
        _h(F.concat(F.lit("w|"), F.col("idx").cast("string"))), F.lit(2001)
    ) - F.lit(1000)
    feats = fidx
    scored = (
        feats.select("id", wt.alias("__w"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("__w").alias("__s"),
        )
        .select(
            "id",
            "n_feats",
            F.round(
                F.col("__s").cast("double")
                / (F.lit(1000.0) * F.col("n_feats")),
                6,
            ).alias("logit"),
        )
    )
    return base.select("id").join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
        F.coalesce("logit", F.lit(0.0)).alias("logit"),
    )


def classifier_score_model(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    use_bigrams: bool = True,
    hash_family: str = "xxhash64",
    bias: float = 0.0,
) -> DataFrame:
    """:func:`classifier_score` with a TRAINED weight table —
    ``weights`` is DataFrame[idx int, weight double] (a model trained
    offline, e.g. logistic regression over the same hashed features) →
    ``(doc_id, n_feats, logit)``.

    The production integration point the frozen-weight twin documents:
    identical feature plumbing (same hash family / dim / n-gram orders,
    so train-time and inference-time buckets line up), with the weight
    lookup a broadcast equi-join against the ≤ ``dim``-row model instead
    of a derived expression. Missing indices weigh 0 (an L2-regularized
    model's absent features). Logit = bias + mean feature weight.
    """
    base, fidx, _h = _hashed_features(
        df, text_col, id_col, dim, use_bigrams, hash_family
    )
    wtab = weights.select(
        F.col("idx").cast("long").alias("idx"),
        F.col("weight").cast("double").alias("__w"),
    )
    scored = (
        fidx.join(F.broadcast(wtab), "idx", "left")
        .select("id", F.coalesce("__w", F.lit(0.0)).alias("__w"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("__w").alias("__s"),
        )
        .select(
            "id",
            "n_feats",
            F.round(
                F.lit(bias) + F.col("__s") / F.col("n_feats"), 6
            ).alias("logit"),
        )
    )
    return base.select("id").join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
        F.coalesce("logit", F.lit(float(bias))).alias("logit"),
    )
