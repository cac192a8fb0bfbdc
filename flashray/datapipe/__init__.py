"""Training-data pipeline operators (beyond the reference's graph surface).

The reference engine has no relational/text operators (SURVEY.md §2.4 —
that absence is a survey finding); these modules add the operations a
large-scale training-data pipeline needs, Ray-Data-first:

- :mod:`flashray.datapipe.textstats` — language-ID, quality scoring, token
  counting, document fingerprinting (stateful actor-pool map_batches).
- :mod:`flashray.datapipe.dedup` — exact, MinHash+LSH, SimHash and n-gram
  Jaccard near-duplicate detection.
- :mod:`flashray.datapipe.similarity` — brute-force cosine top-k ANN and an
  LSH-bucketed variant over an embedding column.
- :mod:`flashray.datapipe.multimodal` — opaque-binary column plumbing with
  stubbed decoders (no media libs in this environment).
"""
