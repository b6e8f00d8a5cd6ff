"""reflexiv_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rhinempi/Reflexiv, rebuilt Spark-first.

Public API mirrors the reference CLI surface (SURVEY.md §2.12) as composable
DataFrame-returning functions:

- :func:`reflexiv_spark.operators.counter.count_kmers` — ``reflexiv counter``
- :func:`reflexiv_spark.pipelines.assemble.assemble` — ``reflexiv run``
- :func:`reflexiv_spark.operators.reduction.reduce_kmer_ladder` — ``reflexiv reduce``
- :func:`reflexiv_spark.operators.dedup.dedup_contigs` — dedup stage
- :func:`reflexiv_spark.operators.merger.merge_contigs` — ``reflexiv merger``
- :func:`reflexiv_spark.operators.mercy.mercy_kmers` — ``reflexiv mercy``

plus the large-corpus data-pipeline extensions under
:mod:`reflexiv_spark.datapipe` (dedup, similarity search, text analysis).
"""

from reflexiv_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
