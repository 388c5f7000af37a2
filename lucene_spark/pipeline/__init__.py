"""Training-data pipeline operators over document tables.

Everything here is expressed with built-in ``pyspark.sql.functions`` (JVM
side, whole-stage codegen) — no per-row Python. The modules:

* :mod:`.textstats` — token counting, quality scoring, language ID,
  document fingerprinting.
* :mod:`.dedup` — exact dedup, n-gram Jaccard, MinHash+LSH, SimHash.
* :mod:`.simsearch` — embedding cosine top-k (brute force + LSH-bucketed).
* :mod:`.multimodal` — opaque binary payload plumbing with stubbed decode.
"""
