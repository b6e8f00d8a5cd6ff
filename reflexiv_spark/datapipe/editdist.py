"""Edit-distance similarity join — EXACT Levenshtein-≤-d pairs without
the all-pairs cross product.

MinHash/SimHash answer "mostly the same tokens/bits"; the edit-distance
join answers the character-level question — near-identical titles, URLs,
short fields, OCR/typo variants — with an exact threshold semantics
(``levenshtein(a, b) <= max_dist``), which none of the probabilistic
dedup members guarantee.

Candidate generation is the FastSS / SymSpell deletion-neighborhood
scheme (Bocek et al., "Fast Similarity Search in Large Dictionaries",
2007): if ``ed(a, b) <= d`` then deleting at most ``d`` characters from
each side reaches a COMMON variant (take an optimal alignment; each
substitution deletes the aligned pair from both sides, each
insertion/deletion deletes from the longer side), so joining the
``<= d``-deletion neighborhoods is COMPLETE — every true pair is a
candidate, and a built-in JVM ``levenshtein`` verify removes the false
ones. Both stages stay in whole-stage codegen: the neighborhoods are
Catalyst array expressions (``sequence``/``transform``/``concat``), the
join is a string equi-join, the verify is ``F.levenshtein``. No Python
crossing anywhere.

The join key is the first ``key_len`` characters of the normalized text
(``datapipe.dedup.normalize_text`` — the exact-dedup device), NOT the
raw document: edit distance on multi-KB bodies is neither what
dedup pipelines compare nor shuffle-affordable. ``key_len`` bounds both
the neighborhood size and the verify cost.

Scale shape (the 100 TB argument):
- neighborhood size is ``1 + L + L(L-1)/2`` variants at ``d=2``
  (137 strings of <= ``key_len`` bytes at ``key_len=16``) — a constant
  per-row fan-out, generated map-side, never materialized on the driver;
- candidates come from an EQUI-join on variant strings (AQE-skewable,
  salt-free); popular prefixes (boilerplate, empty-ish texts) are the
  skew axis — the documented knob is ``key_len`` (longer key = rarer
  collisions), and duplicate-heavy corpora should exact-dedup first
  (``exact_dedup`` removes identical keys, which are the worst
  offenders);
- the verify is O(``key_len``^2) per candidate pair, JVM-side.

Reference scope note: the reference engine has no text-similarity join;
this module is part of the engine-additions surface (SURVEY §8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.datapipe._layout import spread_batch as _spread_batch
from reflexiv_spark.datapipe.dedup import normalize_text


def _del1(c: Column) -> Column:
    """All single-character deletions of a string column, as an array
    (position i removed, for i = 1..len). Empty string -> empty array:
    the guard is load-bearing, not cosmetic — ``sequence(1, 0)`` yields
    the DESCENDING [1, 0], so an unguarded transform would emit ['', '']
    for the empty string (round-11 ADVICE; the old behavior was masked
    by array_union/array_distinct dedup in deletion_neighborhood, but
    any caller counting variants would have been wrong)."""
    return F.when(
        F.length(c) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: F.concat(
                c.substr(F.lit(1), i - F.lit(1)),
                F.substring(c, i + F.lit(1), F.length(c)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def deletion_neighborhood(col: Column | str, max_dist: int) -> Column:
    """The ``<= max_dist``-deletion neighborhood of a string column as a
    distinct array (the string itself is depth 0). ``max_dist`` in
    {0, 1, 2} — depth 2 is quadratic in the string length, which is why
    callers key on a bounded prefix, and deeper neighborhoods grow
    combinatorially faster than their candidate-pruning pays back."""
    if max_dist not in (0, 1, 2):
        raise ValueError("max_dist must be 0, 1, or 2")
    c = F.col(col) if isinstance(col, str) else col
    out = F.array(c)
    if max_dist >= 1:
        out = F.array_union(out, _del1(c))
    if max_dist >= 2:
        out = F.array_union(
            out, F.array_distinct(F.flatten(F.transform(_del1(c), _del1)))
        )
    return out


def edit_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_len: int = 16,
) -> DataFrame:
    """DataFrame[id, key] — the normalized-prefix join key per non-NULL
    document (lowercase, trimmed, whitespace collapsed, first
    ``key_len`` chars)."""
    t = F.col(text_col)
    # spread(): neighborhood generation is a per-row CPU fan-out (up to
    # 1+L+L(L-1)/2 variant strings); few-file local inputs must reach
    # all cores first, many-file scans pass through untouched
    return _spread_batch(df.where(t.isNotNull())).select(
        F.col(id_col).alias("id"),
        F.substring(normalize_text(t), 1, key_len).alias("key"),
    )


def edit_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 1,
    key_len: int = 16,
) -> DataFrame:
    """All pairs within Levenshtein ``max_dist`` on their normalized
    ``key_len``-prefix keys → DataFrame[id_a, id_b, dist] with
    ``id_a < id_b`` (each unordered pair once), ``dist`` the exact
    distance. NULL texts never pair. EXACT: deletion-neighborhood
    candidates are complete (module docstring), the verify is exact.
    """
    keyed = edit_keys(df, id_col, text_col, key_len)
    ex = keyed.select(
        "id",
        "key",
        F.explode(deletion_neighborhood(F.col("key"), max_dist)).alias("v"),
    )
    a = ex.select(
        F.col("id").alias("id_a"), F.col("key").alias("key_a"), "v"
    )
    b = ex.select(
        F.col("id").alias("id_b"), F.col("key").alias("key_b"), "v"
    )
    # distinct BEFORE the verify: a pair can collide on many shared
    # variants, and the O(key_len^2) levenshtein should run once per pair
    cand = (
        a.join(b, "v")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "key_a", "id_b", "key_b")
        .distinct()
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            F.levenshtein("key_a", "key_b").cast("bigint").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )
