"""Large-corpus data-pipeline operators (the beyond-reference surface).

Built on the same Spark-first kernels as the genomic engine — the contig
containment dedup (``ReflexivDSDynamicKmerDedup.java:191-300``) is
structurally a bucketed shingle dedup, generalized here to arbitrary text
(SURVEY.md §7.1 item 7).

Modules:
- :mod:`reflexiv_spark.datapipe.dedup` — exact, containment, MinHash/LSH,
  SimHash, n-gram-Jaccard deduplication
- :mod:`reflexiv_spark.datapipe.text` — stats, language ID, quality
  scoring, token counting, fingerprinting
- :mod:`reflexiv_spark.datapipe.similarity` — embedding cosine top-k and
  LSH-bucketed approximate nearest neighbors
- :mod:`reflexiv_spark.datapipe.multimodal` — opaque binary columns with
  typed metadata and (stubbed) decode plumbing
"""
