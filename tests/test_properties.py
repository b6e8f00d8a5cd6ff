"""Property-based tests (hypothesis) for the algebra the engine relies
on: the 2-bit packed kernels must be a faithful isomorphic image of the
string kernels, and key operators must be partition-count invariant
(determinism under re-layout — what makes results reproducible across
cluster sizes)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

DNA = st.text(alphabet="ACGT", min_size=1, max_size=31)


def _pack(s: str) -> int:
    v = 0
    for c in s:
        v = (v << 2) | "ACGT".index(c)
    return v


def _revcomp(s: str) -> str:
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


class _PyPacked:
    """Driver-side replica of the Catalyst bit ops (same masks/shifts) —
    lets hypothesis hammer thousands of cases without a Spark job each."""

    M2, M4 = 0x3333333333333333, 0x0F0F0F0F0F0F0F0F
    M8, M16 = 0x00FF00FF00FF00FF, 0x0000FFFF0000FFFF
    U = (1 << 64) - 1

    @classmethod
    def revcomp(cls, x: int, k: int) -> int:
        x ^= (1 << (2 * k)) - 1
        for m, n in ((cls.M2, 2), (cls.M4, 4), (cls.M8, 8), (cls.M16, 16)):
            x = ((x & m) << n | (x >> n) & m) & cls.U
        x = ((x << 32) | (x >> 32)) & cls.U
        return x >> (64 - 2 * k)


@given(DNA)
@settings(max_examples=500, deadline=None)
def test_packed_revcomp_is_isomorphic_and_involutive(s):
    k = len(s)
    p = _pack(s)
    rc = _PyPacked.revcomp(p, k)
    assert rc == _pack(_revcomp(s))          # image of the string op
    assert _PyPacked.revcomp(rc, k) == p     # involution
    # order isomorphism: canonical pick agrees in both representations
    assert (min(p, rc) == p) == (min(s, _revcomp(s)) == s)


@given(st.lists(DNA, min_size=0, max_size=20))
@settings(max_examples=200, deadline=None)
def test_packing_is_injective_per_length(strs):
    by_len: dict[int, dict[int, str]] = {}
    for s in strs:
        seen = by_len.setdefault(len(s), {})
        p = _pack(s)
        assert seen.setdefault(p, s) == s  # no collision within a length


def test_catalyst_bitops_match_python_replica(spark):
    """One Spark round-trip pins the replica to the real Catalyst exprs
    (the hypothesis cases above then transfer)."""
    import random

    from reflexiv_spark.operators.counter_packed import (
        kmer_to_packed,
        revcomp_packed,
    )

    rng = random.Random(99)
    rows = [
        ("".join(rng.choice("ACGT") for _ in range(k)),)
        for k in (1, 2, 7, 15, 30, 31)
        for _ in range(20)
    ]
    for k in (1, 2, 7, 15, 30, 31):
        sub = [r for r in rows if len(r[0]) == k]
        df = spark.createDataFrame(sub, "kmer string")
        got = df.select(
            "kmer", revcomp_packed(kmer_to_packed("kmer", k), k).alias("rc")
        ).collect()
        for r in got:
            assert r["rc"] == _PyPacked.revcomp(_pack(r["kmer"]), k)


def test_partition_count_invariance(spark):
    """Key operators return identical results at 1 partition and at 32 —
    re-layout (cluster size, AQE coalescing) must never change answers."""
    import random

    from reflexiv_spark.datapipe.dedup import minhash_lsh_pairs
    from reflexiv_spark.pipelines.assemble import assemble_from_counts
    from reflexiv_spark.operators.counter import count_kmers
    from tests.conftest import random_genome, simulate_reads

    g = random_genome(900, seed=61)
    reads = simulate_reads(g, read_len=80, coverage=10, seed=62)
    rng = random.Random(63)
    docs = [
        (i, " ".join(rng.choice("the and of to in is that fox dog".split())
                     for _ in range(30)))
        for i in range(40)
    ] + [(100, "the fox " * 20), (101, "the fox " * 20 + "tail")]

    results = []
    for parts in (1, 32):
        rdf = spark.createDataFrame([(r,) for r in reads], ["seq"]).repartition(parts)
        ddf = spark.createDataFrame(docs, "doc_id long, text string").repartition(parts)
        contigs = {
            (r["contig_id"], r["seq"])
            for r in assemble_from_counts(
                count_kmers(rdf, 15, min_coverage=2), 15, min_contig=50,
                algorithm="rank",
            ).collect()
        }
        pairs = {
            (r["id1"], r["id2"], r["est_jaccard"])
            for r in minhash_lsh_pairs(ddf, num_hashes=16, bands=4).collect()
        }
        results.append((contigs, pairs))
    assert results[0] == results[1]
    assert results[0][0]  # non-trivial


def _uf_components(edges):
    """Union-find reference: node → min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_connected_components_matches_union_find(spark, edges):
    from reflexiv_spark.datapipe.cluster import connected_components

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id1 long, id2 long"
    )
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == _uf_components(edges)
