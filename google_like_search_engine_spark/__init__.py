"""PySpark-native analytics / full-text search engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference search engine (a Java MapReduce-style
system: custom "Flame" dataflow framework + KVS storage + crawler /
inverted-index / PageRank / TF-IDF ranker jobs), re-expressed on the
Apache Spark DataFrame/SQL stack:

- ``kernels``   : bit-exact scalar kernels (SHA-1 doc hash, Porter
                  stemmer, URL normalization, HTML text cleaning) —
                  pure Python, wrapped in Arrow-batched pandas UDFs.
- ``indexer``   : partition-local posting-list construction + term
                  sharded merge (replaces reference Indexer.java).
- ``pagerank``  : iterative DataFrame PageRank (replaces PageRank.java).
- ``ranker``    : TF-IDF x PageRank and BM25 top-k query scoring
                  (replaces ranker/Ranker.java).
- ``operators`` : DataFrame equivalents of the reference's Flame
                  RDD/PairRDD operator inventory (SURVEY.md section 2.1).
- ``analytics`` : large-scale training-data pipeline ops (dedup,
                  similarity search, text quality, multimodal plumbing).
- ``streaming`` : Structured Streaming operators over event streams.
- ``corpus``    : deterministic synthetic Common-Crawl-style page
                  generator used by tests and benchmarks.

Everything is DataFrame-first: Catalyst handles pushdown/pruning/join
selection; custom logic runs only in Arrow-batched pandas UDFs (never
per-row Python UDFs).
"""

__version__ = "0.1.0"
