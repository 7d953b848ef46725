"""LLM-training-data pipeline operators (BASELINE.json north star).

Beyond the reference's own operator surface: deduplication (exact, MinHash+LSH,
n-gram Jaccard), similarity search (brute-force + LSH-bucketed ANN), text
analysis (lang-id, quality, token stats, fingerprinting), and multimodal
column plumbing. All DataFrame-first; Python appears only in clearly-marked
Pandas-UDF paths (multimodal decode).
"""
