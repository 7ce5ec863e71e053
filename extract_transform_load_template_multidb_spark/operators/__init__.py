"""Large-scale training-data operators (SURVEY.md §7 Phase 4).

Beyond the reference's ETL surface: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine), similarity search (brute-force
and LSH-bucketed ANN), text analysis (language ID, quality scoring, token
counting, fingerprinting), and multimodal binary-column plumbing.

Determinism note: hash-based operators are built on ``md5`` (identical in
Spark and DuckDB) so every one of them is oracle-checkable; production
variants can switch to ``xxhash64`` (faster, JVM-side) via the ``hash_fn``
hooks without changing the algorithm.
"""
