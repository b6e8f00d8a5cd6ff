"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2 (plus the datapipe
extensions); ``oracle_sql()`` gives the DuckDB-equivalent SQL for each.
Column names are aliased identically on both sides so the driver's
order-insensitive value-hash compare works.

Genomic operators are exercised on a DNA corpus derived deterministically
from the ``documents`` table (keep only ACGT letters of the uppercased
text) so the same semantics are expressible in ANSI SQL for the oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → DataFrame[seq] of ACGT-only pseudo-reads."""
    return _t(spark, sf_dir, "documents").select(
        F.regexp_replace(F.upper(F.col("text")), "[^ACGT]", "").alias("seq")
    )


# DuckDB-side equivalents of the helpers above, shared across oracles.
_SQL_DNA = (
    "dna AS (SELECT regexp_replace(upper(text), '[^ACGT]', '', 'g') AS seq"
    " FROM documents)"
)


def _sql_kmers(k: int, src: str = "dna", name: str = "km") -> str:
    """Canonical k-mer explode of ``src(seq)`` as a CTE body."""
    sub = f"substr(seq, CAST(i AS INT), {k})"
    return (
        f"{name} AS (SELECT least({sub}, reverse(translate({sub}, 'ACGT',"
        f" 'TGCA'))) AS kmer FROM {src},"
        f" unnest(generate_series(1, length(seq) - {k - 1})) AS t(i)"
        f" WHERE length(seq) >= {k})"
    )


def _sql_counts(k: int, min_cov: int = 2, src: str = "dna", name: str = "counts") -> str:
    having = f" HAVING count(*) >= {min_cov}" if min_cov > 1 else ""
    return (
        _sql_kmers(k, src=src, name=f"__km{k}")
        + f", {name} AS (SELECT kmer, count(*) AS count FROM __km{k}"
        f" GROUP BY kmer{having})"
    )


_SQL_RC = "reverse(translate(kmer, 'ACGT', 'TGCA'))"

_SQL_EXPANDED = (
    f"{_SQL_DNA}, {_sql_counts(15)}, expanded AS ("
    "SELECT DISTINCT kmer, count FROM ("
    "SELECT kmer, count FROM counts"
    f" UNION ALL SELECT {_SQL_RC} AS kmer, count FROM counts))"
)


# ---------------------------------------------------------------------------
# queries — genomic operator surface (SURVEY.md §2) on the DNA-ified docs
# ---------------------------------------------------------------------------


def q_kmer_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (+F1, C2, C4): canonical k-mer hash-agg count, coverage floor."""
    from reflexiv_spark.operators.counter import count_kmers

    return count_kmers(_dna(spark, sf_dir), 15, min_coverage=2)


def q_kmer_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2: coverage floor and ceiling."""
    from reflexiv_spark.operators.counter import count_kmers

    return count_kmers(_dna(spark, sf_dir), 11, min_coverage=2, max_coverage=50)


def q_kmer_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: front/end read clipping before counting."""
    from reflexiv_spark.operators.counter import count_kmers

    return count_kmers(
        _dna(spark, sf_dir), 15, min_coverage=1, front_clip=5, end_clip=5
    )


def q_rc_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3+U4+A7: canonical counts re-emitted in both orientations."""
    from reflexiv_spark.operators.counter import count_kmers
    from reflexiv_spark.pipelines.assemble import expand_orientations

    return expand_orientations(count_kmers(_dna(spark, sf_dir), 15, min_coverage=2))


def q_prune_forks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W2+A5: fork argmax on forward then reflected sub-k-mers."""
    from reflexiv_spark.operators.counter import count_kmers
    from reflexiv_spark.pipelines.assemble import expand_orientations, prune_forks

    counts = count_kmers(_dna(spark, sf_dir), 15, min_coverage=2)
    return prune_forks(expand_orientations(counts), 15)


def q_fork_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 generic: best row per group by cover desc with tiebreak."""
    from reflexiv_spark.operators.fork import filter_forks

    li = _t(spark, sf_dir, "lineitem")
    return filter_forks(
        li, "l_orderkey", cover_col="l_extendedprice", tie_cols=("l_linenumber",)
    ).select("l_orderkey", "l_partkey", "l_extendedprice", "l_linenumber")


def q_fork_argmax_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 + minErrorCoverage gate: fork winners must clear a floor."""
    from reflexiv_spark.operators.fork import filter_forks

    li = _t(spark, sf_dir, "lineitem")
    return filter_forks(
        li,
        "l_orderkey",
        cover_col="l_extendedprice",
        tie_cols=("l_linenumber",),
        min_winner_cover=30000,
    ).select("l_orderkey", "l_partkey", "l_extendedprice", "l_linenumber")


def q_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2: union of short-k and long-k count sets with a k marker."""
    from reflexiv_spark.operators.counter import count_kmers

    dna = _dna(spark, sf_dir)
    k11 = count_kmers(dna, 11, min_coverage=2).select(
        F.lit(11).alias("k"), "kmer", "count"
    )
    k15 = count_kmers(dna, 15, min_coverage=2).select(
        F.lit(15).alias("k"), "kmer", "count"
    )
    return k11.unionByName(k15)


def q_best_connection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+W6 (patching kernel): pair-support count + best pick per right."""
    from reflexiv_spark.operators.patching import best_connection, count_pair_support

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("left_key"), F.col("l_partkey").alias("right_key")
    )
    support = count_pair_support(li, "left_key", "right_key")
    return best_connection(support, "left_key", "right_key")


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O3/O5: mixed-direction sort + top-k."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: distinct."""
    return _t(spark, sf_dir, "documents").select("lang", "source").distinct()


def q_multi_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family: broadcast dim joins + hash agg (the flagship query)."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style tumbling-window aggregation (batch form)."""
    # events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    # reader rejects; read nanos as long and convert.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q_fasta_wrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: 100-char line wrapping (the FASTA export kernel)."""
    docs = _t(spark, sf_dir, "documents").where(F.length("text") > 0)
    return docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(F.lit(1), F.length("text"), F.lit(100)),
                lambda i: F.col("text").substr(i, F.lit(100)),
            ),
        ).alias("wrapped"),
    )


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_multi_join_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kmer_count": q_kmer_count,
        "kmer_band": q_kmer_band,
        "kmer_clip": q_kmer_clip,
        "rc_expand": q_rc_expand,
        "prune_forks": q_prune_forks,
        "fork_argmax": q_fork_argmax,
        "fork_argmax_gated": q_fork_argmax_gated,
        "union_counts": q_union_counts,
        "best_connection": q_best_connection,
        "top_orders": q_top_orders,
        "distinct_pairs": q_distinct_pairs,
        "multi_join_agg": q_multi_join_agg,
        "events_window": q_events_window,
        "fasta_wrap": q_fasta_wrap,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kmer_count": (
            f"WITH {_SQL_DNA}, {_sql_counts(15, min_cov=2)} "
            "SELECT kmer, count FROM counts"
        ),
        "kmer_band": (
            f"WITH {_SQL_DNA}, {_sql_counts(11, min_cov=1)} "
            "SELECT kmer, count FROM counts WHERE count BETWEEN 2 AND 50"
        ),
        "kmer_clip": (
            f"WITH {_SQL_DNA}, clipped AS ("
            "SELECT substr(seq, 6, length(seq) - 10) AS seq FROM dna"
            " WHERE length(seq) >= 25), "
            + _sql_counts(15, min_cov=1, src="clipped")
            + " SELECT kmer, count FROM counts"
        ),
        "rc_expand": (
            f"WITH {_SQL_EXPANDED} SELECT kmer, count FROM expanded"
        ),
        "prune_forks": (
            f"WITH {_SQL_EXPANDED}, "
            "f AS (SELECT kmer, count, row_number() OVER ("
            "PARTITION BY substr(kmer, 1, 14)"
            " ORDER BY count DESC, kmer DESC) AS rn FROM expanded), "
            "f1 AS (SELECT kmer, count FROM f WHERE rn = 1), "
            "r AS (SELECT kmer, count, row_number() OVER ("
            "PARTITION BY substr(kmer, 2, 14)"
            " ORDER BY count DESC, kmer DESC) AS rn FROM f1) "
            "SELECT kmer, count FROM r WHERE rn = 1"
        ),
        "fork_argmax": (
            "SELECT l_orderkey, l_partkey, l_extendedprice, l_linenumber FROM ("
            "SELECT l_orderkey, l_partkey, l_extendedprice, l_linenumber,"
            " row_number() OVER (PARTITION BY l_orderkey"
            " ORDER BY l_extendedprice DESC, l_linenumber DESC) AS rn"
            " FROM lineitem) WHERE rn = 1"
        ),
        "fork_argmax_gated": (
            "SELECT l_orderkey, l_partkey, l_extendedprice, l_linenumber FROM ("
            "SELECT l_orderkey, l_partkey, l_extendedprice, l_linenumber,"
            " row_number() OVER (PARTITION BY l_orderkey"
            " ORDER BY l_extendedprice DESC, l_linenumber DESC) AS rn,"
            " count(*) OVER (PARTITION BY l_orderkey) AS n"
            " FROM lineitem) WHERE rn = 1 AND (n = 1 OR l_extendedprice >= 30000)"
        ),
        "union_counts": (
            f"WITH {_SQL_DNA}, "
            + _sql_counts(11, min_cov=2, name="c11")
            + ", "
            + _sql_counts(15, min_cov=2, name="c15")
            + " SELECT 11 AS k, kmer, count FROM c11"
            " UNION ALL SELECT 15 AS k, kmer, count FROM c15"
        ),
        "best_connection": (
            "WITH pc AS (SELECT l_suppkey AS left_key, l_partkey AS right_key,"
            " count(*) AS support FROM lineitem GROUP BY 1, 2) "
            "SELECT left_key, right_key, support FROM ("
            "SELECT left_key, right_key, support, row_number() OVER ("
            "PARTITION BY right_key ORDER BY support DESC, left_key) AS rn"
            " FROM pc) WHERE rn = 1"
        ),
        "top_orders": (
            "SELECT o_orderkey, o_totalprice FROM orders"
            " ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "distinct_pairs": "SELECT DISTINCT lang, source FROM documents",
        "multi_join_agg": (
            "SELECT n_name, count(*) AS order_cnt,"
            " round(sum(o_totalprice), 2) AS revenue,"
            " max(o_totalprice) AS max_price"
            " FROM orders JOIN customer ON o_custkey = c_custkey"
            " JOIN nation ON c_nationkey = n_nationkey"
            " JOIN region ON n_regionkey = r_regionkey"
            " WHERE r_name IN ('ASIA', 'EUROPE') GROUP BY n_name"
        ),
        "events_window": (
            "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')"
            " AS win_start, event_type, count(*) AS n,"
            " round(sum(value), 4) AS sum_value"
            " FROM events GROUP BY 1, 2"
        ),
        "fasta_wrap": (
            "SELECT doc_id, array_to_string(list_transform("
            "generate_series(1, length(text), 100),"
            " i -> substr(text, CAST(i AS INT), 100)), chr(10)) AS wrapped"
            " FROM documents WHERE length(text) > 0"
        ),
    }
