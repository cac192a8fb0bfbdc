"""Training-data pipeline operators (beyond the reference's graph surface).

The reference engine has no relational/text operators (SURVEY.md §2.4 —
that absence is a survey finding); these modules add the operations a
large-scale training-data pipeline needs, Ray-Data-first:

- :mod:`flashray.datapipe.textstats` — language-ID, quality scoring (incl.
  per-group percentile gates), token counting, fingerprinting, winnowing,
  TF-IDF/BM25, n-gram LMs, chunking/redaction/packing, mixture resampling.
- :mod:`flashray.datapipe.dedup` — exact, MinHash+LSH, SimHash, n-gram
  Jaccard, line/record unit, substring-level (ExactSubstr), quality-aware
  keep-best dedup; exact + Bloom-prefiltered + MinHash decontamination.
- :mod:`flashray.datapipe.similarity` — brute/IVF cosine kNN, SemDeDup,
  embedding near-dups, k-center coreset, silhouette, PCA + JL sign random
  projection, hard-negative mining.
- :mod:`flashray.datapipe.sketches` — HLL, CMS, Misra–Gries, histogram
  quantiles, exact distributed quantiles/rank (global and per-group),
  weighted/stratified sampling, hash splits.
- :mod:`flashray.datapipe.temporal` — as-of/range joins, sessions, funnels,
  cohorts, transitions, paths, co-occurrence, burstiness, reachability.
- :mod:`flashray.datapipe.ml` — Naive Bayes, prototype classifier, feature
  hashing, DSIR weights, confusion matrices.
- :mod:`flashray.datapipe.bpe` — corpus-trained byte/codepoint BPE.
- :mod:`flashray.datapipe.kmeans` / :mod:`flashray.datapipe.pq` — Lloyd
  k-means and product-quantization ANN.
- :mod:`flashray.datapipe.pipelines` — composed recipes (pretrain corpus).
- :mod:`flashray.datapipe.multimodal` / :mod:`flashray.datapipe.codecs` —
  binary media columns with real pure-numpy codecs (BMP/WAV/FRV1).
- :mod:`flashray.datapipe.windows` — windowed aggregates.
"""
