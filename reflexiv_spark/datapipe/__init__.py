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
  typed metadata; real PNG/JPEG/GIF/BMP/WAV/AVI decode, perceptual-hash
  image near-dup
- :mod:`reflexiv_spark.datapipe.cluster` — connected-components duplicate
  clustering and keep-best-per-cluster dedup
- :mod:`reflexiv_spark.datapipe.pipeline` — the composed corpus-cleaning
  pipeline
- :mod:`reflexiv_spark.datapipe.decontam` — eval-set n-gram
  decontamination
- :mod:`reflexiv_spark.datapipe.retrieval` — BM25 keyword scoring
- :mod:`reflexiv_spark.datapipe.packing` — sequence packing via the
  two-phase distributed prefix sum
- :mod:`reflexiv_spark.datapipe.sketch` — count-min sketch, heavy
  hitters, KMV distinct estimation
- :mod:`reflexiv_spark.datapipe.sampling` — deterministic hash-gated /
  stratified sampling, corpus mixing
- :mod:`reflexiv_spark.datapipe.stats` — histogram-exact group quantiles
- :mod:`reflexiv_spark.datapipe.bpe` — distributed BPE tokenizer
  training and encoding
"""
