from mediaduplicatefinder_spark.functions import hashing, text, textstats  # noqa: F401
