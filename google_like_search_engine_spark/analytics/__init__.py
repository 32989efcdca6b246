"""Large-scale training-data pipeline operators.

- dedup: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
- simsearch: brute-force cosine top-k + LSH-bucketed ANN
- text: language-ID, quality scoring, token counting, fingerprinting
- multimodal: binary-column plumbing with stubbed decoders
"""
