"""BPE tokenizer training — learn merge rules from the corpus.

Byte-pair encoding (Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units", arXiv:1508.07909) is the tokenizer
family behind most LLM vocabularies. Training is iterative: count
adjacent symbol pairs over the word-frequency table, merge the most
frequent pair everywhere, repeat.

The distributed insight is that AFTER one corpus-wide word count, every
merge round runs on the VOCABULARY table (distinct words × counts) —
millions of rows at web scale, not the corpus itself. Rounds here are
fully declarative: the per-round argmax pair is a one-row DataFrame
(orderBy + limit — TakeOrdered, no driver collect), the rewrite is a
Catalyst ``aggregate`` fold whose lambda references the broadcast pair
row, and each round's vocabulary is lazily checkpointed so the unrolled
plan stays linear in the number of merges instead of doubling per
round.

Merge application semantics are the classic leftmost non-overlapping
scan, expressed as a left fold: append each symbol unless the
accumulator's last element is the pair's left and the symbol is the
pair's right, in which case replace the last element with the merged
token. (A fold cannot re-merge the token it just created as a LEFT
element in the same round — exactly the classic behaviour.)

No SQL oracle: replaying a data-dependent leftmost fold per round needs
list-building lambdas DuckDB's ``list_reduce`` cannot express, so this
is a library operator verified against a pure-Python reference BPE in
pytest rather than a driver query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """DataFrame[word, weight] — the corpus word-frequency table
    (lower-cased ``\\w+`` tokens). One corpus-wide aggregation; every
    BPE round afterwards touches only this table."""
    toks = df.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(r"\w+"),
                0,
            )
        ).alias("word")
    )
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("weight"))


def _adjacent_pairs(vocab: DataFrame) -> DataFrame:
    """(left, right, weight) for every adjacent symbol pair occurrence,
    weighted by word frequency."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.zip_with(
            F.slice("syms", 1, F.size("syms") - 1),
            F.slice("syms", 2, F.size("syms") - 1),
            lambda a, b: F.struct(a.alias("left"), b.alias("right")),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    return (
        vocab.select("weight", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("weight").alias("pair_weight"))
    )


def _apply_merge(vocab: DataFrame, merge_row: DataFrame) -> DataFrame:
    """Rewrite every word's symbol array under the (broadcast) 1-row
    merge pair — the leftmost-scan fold."""
    joined = vocab.crossJoin(F.broadcast(merge_row))
    folded = F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.col("left"))
            & (x == F.col("right")),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.col("left"), F.col("right"))),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return joined.select("word", "weight", folded.alias("syms"))


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample: float | None = None,
    sample_salt: str = "bpe",
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merge rules from the corpus →
    (merges DataFrame[step, left, right, merged, pair_weight],
    final vocabulary DataFrame[word, weight, syms]).

    Ties on pair weight break to the lexicographically smallest
    (left, right), so training is deterministic. Rounds that find no
    pair (every word fully merged) emit nothing and stop changing the
    vocabulary.

    ``sample`` is the production shape at corpus scale: each merge
    round costs ~2 Spark jobs (argmax + fold rewrite), so a 50k-merge
    vocabulary over the full corpus would mean ~100k sequential driver
    rounds on a table whose word count barely changes the learned
    merges. Instead train EXACTLY (same algorithm, same tie-breaks) on
    a deterministic ``hash_sample`` of the documents, then broadcast
    the merge list and ``bpe_encode`` the full corpus once — the
    standard train-on-sample / apply-everywhere split. ``sample=0.01``
    reproduces the exact-mode merges whenever the sampled
    word-frequency ranking preserves the pair order (tokenizer
    vocabularies are trained on samples in practice for this reason).
    """
    if sample is not None:
        from reflexiv_spark.datapipe.sampling import hash_sample

        df = hash_sample(df, sample, id_col=id_col, salt=sample_salt)
    vocab = word_counts(df, text_col, id_col).select(
        "word",
        "weight",
        F.filter(
            F.split(F.col("word"), "(?!^)"), lambda x: x != ""
        ).alias("syms"),
    )
    vocab = vocab.localCheckpoint(eager=False)

    merge_frames = []
    for step in range(1, n_merges + 1):
        best = (
            _adjacent_pairs(vocab)
            .orderBy(
                F.col("pair_weight").desc(), F.col("left"), F.col("right")
            )
            .limit(1)
            .localCheckpoint(eager=False)
        )
        # n_merges can exceed the merges the corpus supports: once no
        # adjacent pair remains, `best` is 0 rows and _apply_merge's
        # crossJoin would wipe the vocabulary — stop instead.
        if not best.take(1):
            break
        merge_frames.append(
            best.select(
                F.lit(step).alias("step"),
                "left",
                "right",
                F.concat("left", "right").alias("merged"),
                "pair_weight",
            )
        )
        vocab = _apply_merge(vocab, best).localCheckpoint(eager=False)

    if not merge_frames:
        merges = df.sparkSession.createDataFrame(
            [],
            "step int, left string, right string, merged string,"
            " pair_weight bigint",
        )
        return merges, vocab
    merges = merge_frames[0]
    for f in merge_frames[1:]:
        merges = merges.unionByName(f)
    return merges, vocab


def _train_shaped(merges) -> bool:
    """True iff every rule's multi-char components are outputs of EARLIER
    rules — the invariant bpe_train guarantees, under which the in-order
    catalyst fold equals the rank-based apply loop."""
    known: set = set()
    for left, right in merges:
        for part in (left, right):
            if len(part) > 1 and part not in known:
                return False
        known.add(left + right)
    return True


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    engine: str | None = None,
) -> DataFrame:
    """Tokenize documents with learned merge rules →
    DataFrame[id, tokens array<string>, n_subwords]. Merges apply in
    training order (the BPE contract).

    Two shuffle-free kernels, same result:

    - ``engine="catalyst"`` unrolls one leftmost-scan fold per merge —
      pure JVM expressions, ideal for small rule lists, but the plan
      grows linearly with ``len(merges)`` and Catalyst analysis cost
      grows with it (a 50k-merge vocabulary would be a 50k-deep
      expression tree — unusable).
    - ``engine="pandas"`` broadcasts the merge table into an
      Arrow-batched ``mapInPandas`` kernel: per distinct word (cached
      per batch) repeatedly merge the lowest-rank adjacent pair — the
      standard tokenizer apply loop, O(word²) per distinct word and
      independent of vocabulary size. For merge lists produced by
      training this is provably identical to in-order application:
      a merge can only create pairs involving its new token, and any
      rule over that token was necessarily learned later, so no
      earlier rule ever becomes applicable again.

    Default: catalyst up to 64 merges, pandas beyond — the crossover
    where plan depth starts to dominate. The two engines are only
    provably equivalent for TRAIN-SHAPED merge lists (every multi-char
    component is the output of an earlier rule); for a hand-built list
    violating that, auto mode always picks the rank-based pandas loop
    (the standard BPE apply semantics) instead of letting the list's
    LENGTH silently decide which tokenization you get.
    """
    if engine is None:
        if _train_shaped(merges):
            engine = "catalyst" if len(merges) <= 64 else "pandas"
        else:
            engine = "pandas"
    if engine == "pandas":
        return _bpe_encode_pandas(df, merges, text_col, id_col)
    words = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(r"\w+"), 0
    )
    syms = F.transform(
        words, lambda w: F.filter(F.split(w, "(?!^)"), lambda x: x != "")
    )
    for left, right in merges:
        syms = F.transform(
            syms,
            lambda s: F.aggregate(
                s,
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(left))
                    & (x == F.lit(right)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(left + right)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ),
        )
    flat = F.flatten(syms)
    return df.select(
        F.col(id_col),
        flat.alias("tokens"),
        F.size(flat).cast("bigint").alias("n_subwords"),
    )


def _bpe_encode_pandas(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Arrow-batched BPE apply: rank-loop per distinct word with a
    per-batch cache. The merge list rides the closure (broadcast by
    task serialization — thousands of rules is a few hundred KB)."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    rank = {pair: i for i, pair in enumerate(merges)}
    rules = list(merges)

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("tokens", ArrayType(StringType()), False),
            StructField("n_subwords", LongType(), False),
        ]
    )
    cols = df.select(id_col, text_col)

    def encode(batches):
        import re as _re

        import pandas as pd

        cache: dict[str, list[str]] = {}

        def apply_word(word: str) -> list[str]:
            got = cache.get(word)
            if got is not None:
                return got
            syms = list(word)
            while len(syms) >= 2:
                best = None
                for i in range(len(syms) - 1):
                    r = rank.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                left, right = rules[best]
                out = []
                i = 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[word] = syms
            return syms

        # ASCII \w to match the Catalyst path's Java regex semantics
        word_re = _re.compile(r"\w+", _re.ASCII)
        for pdf in batches:
            toks_col, n_col = [], []
            for txt in pdf[text_col]:
                toks: list[str] = []
                for wd in word_re.findall((txt or "").lower()):
                    toks.extend(apply_word(wd))
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "tokens": toks_col, "n_subwords": n_col}
            )

    return cols.mapInPandas(encode, schema=schema)
