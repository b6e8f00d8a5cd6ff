"""Scalar expression kernels (SURVEY.md §2.8 C1-C9).

Everything here is a Catalyst Column expression — JVM-side, whole-stage
codegen'd, no Python UDFs in the hot path.
"""

from reflexiv_spark.functions.kmer import (
    canonical_kmer,
    explode_kmers,
    kmer_array,
    prefix_subkmer,
    reverse_complement,
    suffix_subkmer,
)

__all__ = [
    "canonical_kmer",
    "explode_kmers",
    "kmer_array",
    "prefix_subkmer",
    "reverse_complement",
    "suffix_subkmer",
]
