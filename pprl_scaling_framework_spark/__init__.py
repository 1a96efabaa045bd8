"""PySpark-native privacy-preserving record linkage (PPRL) engine.

A from-scratch, Spark-first rebuild of the capabilities of
whantana/pprl-scaling-framework (Java 7 / Hadoop MapReduce):
encode -> block -> compare -> classify -> cluster over tables of
source-code repositories ``(repo, path, commit, lang, content)``.

Architecture (see SURVEY.md section 7):

- ``core``      pure numpy/python kernels (q-grams, HMAC double hashing with
                Java int32 overflow parity, LSB-first bit packing, popcount
                similarity, FPS parameter planning, Fellegi-Sunter EM).
- ``encoding``  CLK / FBF / RBF Bloom-filter encoders as vectorized Arrow
                (pandas) UDFs producing ``binary`` columns.
- ``blocking``  Hamming-LSH key generation (one UDF -> L int64 keys ->
                posexplode) and FPS candidate generation with hot-key salting.
- ``matching``  batched popcount similarity scoring + threshold classification.
- ``clustering``connected components (alternating large-star/small-star).
- ``pipeline``  stage runner with parquet checkpoints, per-partition lineage
                metrics and resume.
- ``sources``   deterministic synthetic ``repos`` table generator (native
                Spark expressions, seed-fixed) + session builder.
- ``ops``       training-data-pipeline extras: dedup (exact / MinHash-LSH /
                SimHash / n-gram Jaccard), ANN similarity search, text
                analysis, multimodal binary-column plumbing.
- ``streaming`` structured-streaming incremental encode/block.
"""

__version__ = "0.1.0"
