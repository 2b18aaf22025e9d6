"""North-star extensions beyond the reference's operator set:
dedup (exact + MinHash-LSH + SimHash + n-gram Jaccard + embedding),
similarity search, text analysis, multimodal column plumbing.
"""
