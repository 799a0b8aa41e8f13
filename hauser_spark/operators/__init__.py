"""Large-scale analytics operators beyond the reference's own surface:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search, text analysis, multimodal plumbing.

Design rule: every operator is a declarative DataFrame plan over built-in
functions wherever semantics allow (JVM-side, codegen'd, shuffle-aware);
Pandas UDFs appear only where built-ins genuinely can't express the
semantics (multimodal decode). Hashing is md5-based because md5 is
bit-identical across Spark, DuckDB, and Python — making even the
probabilistic operators (MinHash, SimHash) exactly reproducible and
oracle-checkable cross-engine.
"""
