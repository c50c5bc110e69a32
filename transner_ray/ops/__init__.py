"""General-purpose Ray Data operators beyond the KG pipeline:
relational (groupby/join/sort/dedup/window), text analysis, corpus
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding), similarity search, and multimodal column plumbing."""
