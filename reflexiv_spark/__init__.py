"""reflexiv_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rhinempi/Reflexiv, rebuilt Spark-first.

Public API mirrors the reference CLI surface (SURVEY.md §2.12) as
composable DataFrame-returning functions (also exposed as a CLI:
``python -m reflexiv_spark <command>``):

- :func:`reflexiv_spark.operators.counter.count_kmers` — ``reflexiv counter``
- :func:`reflexiv_spark.pipelines.assemble.assemble` — ``reflexiv run``
- :func:`reflexiv_spark.operators.reduction.reduce_kmer_ladder` — ``reflexiv reduce``
- :func:`reflexiv_spark.operators.dedup.dedup_contigs` — the ``/Assembly`` dedup stage
- :func:`reflexiv_spark.operators.merger.merge_contigs` — ``reflexiv merger``
- :func:`reflexiv_spark.operators.mercy.mercy_kmers` — ``reflexiv mercy``
- :func:`reflexiv_spark.operators.fixing.fix_junctions` — the 04Fixing stage
- :func:`reflexiv_spark.operators.patching.patch_contigs` — contig patching

plus the large-corpus data-pipeline extensions under
:mod:`reflexiv_spark.datapipe` (exact/MinHash/SimHash/containment dedup,
embedding similarity search, text analysis, multimodal binary columns).
"""

from reflexiv_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.2.0"
