"""mediaduplicatefinder_spark — a from-scratch PySpark-native near-duplicate
detection + clustering engine over Common-Crawl-style web pages.

Re-expresses the query semantics of DimitriosPournarkas/MediaDuplicateFinder
(reference at /root/reference, MIT) as an idiomatic Spark DataFrame pipeline:

    pages -> extract_text -> sha2 exact clusters
          -> MinHash/SimHash signatures (mapInPandas, numpy-vectorized)
          -> LSH band self-join (salted for skew) -> candidate pairs
          -> exact-Jaccard / Hamming verify (reference thresholds)
          -> distributed connected components -> clusters + keepers

No code is copied from the reference; reference file:line cites in
docstrings identify the *semantics* being reproduced.
"""

from mediaduplicatefinder_spark.config import EngineConfig

__version__ = "0.1.0"
__all__ = ["EngineConfig"]
