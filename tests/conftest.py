"""Shared Spark session + deterministic genomic fixtures (FIXTURES.md)."""

from __future__ import annotations

import random

import pytest

from reflexiv_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="reflexiv-tests", master="local[4]", shuffle_partitions=4)
    yield s


def random_genome(length: int, seed: int = 42) -> str:
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(length))


def revcomp(s: str) -> str:
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def simulate_reads(
    genome: str,
    read_len: int = 100,
    coverage: float = 15.0,
    seed: int = 42,
    rc_prob: float = 0.5,
) -> list[str]:
    """Error-free reads, 50% reverse-complemented (FIXTURES.md §2)."""
    rng = random.Random(seed)
    n_reads = int(len(genome) * coverage / read_len)
    reads = []
    for _ in range(n_reads):
        pos = rng.randrange(0, len(genome) - read_len + 1)
        r = genome[pos : pos + read_len]
        if rng.random() < rc_prob:
            r = revcomp(r)
        reads.append(r)
    return reads


def brute_force_kmer_counts(seqs: list[str], k: int, canonical: bool = True) -> dict[str, int]:
    counts: dict[str, int] = {}
    for s in seqs:
        for i in range(len(s) - k + 1):
            km = s[i : i + k]
            if any(c not in "ACGT" for c in km):
                continue
            if canonical:
                km = min(km, revcomp(km))
            counts[km] = counts.get(km, 0) + 1
    return counts
