"""Beyond-reference operator library: the operations a large-scale
training-data pipeline needs, designed 100 TB-first.

The reference engine has no scalar/join/window surface (SURVEY §2.3-2.8) —
Spark provides those natively. This package adds the non-trivial pieces:

- ``dedup``       exact + MinHash-LSH + SimHash + n-gram Jaccard dedup
- ``text``        language ID, quality scoring, token counting, fingerprints
- ``similarity``  brute-force and LSH-bucketed cosine ANN over embeddings
- ``multimodal``  binary-column plumbing for image/audio payloads (decode
                  stubbed — libs not in this container)
- ``sampling``    deterministic fraction / stratified / reservoir sampling
                  (portable arithmetic bucket, reproducible across engines)
- ``timeseries``  as-of join (union + sort + last-carry), sessionize
                  (gaps-and-islands), interval containment join
                  (bucketed equi-join) — one shuffle each, no UDFs
- ``corpus``      chunking, TF-IDF, contamination scan (hot-shingle
                  guarded), C4-style line dedup, n-gram frequency,
                  repetition scores, Gopher-rules quality filter
- ``skew``        salted join + two-stage distinct (exact-equivalence
                  contract)
- ``layout``      Z-order (Morton) clustering keys for multi-dim
                  row-group pruning; deterministic corpus shuffle
- ``dsir``        DSIR importance resampling (hashed n-gram models,
                  deterministic portable Gumbel-top-k; incremental
                  scoring against persisted count tables)
- ``classify``    closed-form multinomial Naive Bayes (training = hash
                  aggregates, the model IS DataFrames)

Design rules applied throughout: built-in ``pyspark.sql.functions`` and
higher-order functions first (JVM-side, codegen'd); every operator is
partition-parallel with no driver-side data; shuffles only on declared
keys; Pandas UDFs only where vectorized Python genuinely wins.
"""
