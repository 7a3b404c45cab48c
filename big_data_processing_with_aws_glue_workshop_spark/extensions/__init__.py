"""Training-data-pipeline extensions beyond the reference's inventory:
approximate deduplication (MinHash-LSH, SimHash), approximate similarity
search (random-hyperplane LSH), and multimodal binary-column plumbing.

The exact/SQL-expressible counterparts (exact dedup, n-gram Jaccard,
brute-force cosine top-k, text stats) live in ``queries/`` with DuckDB
oracles; these modules are the scale paths whose semantics are approximate
and therefore checked by recall/property tests instead."""
