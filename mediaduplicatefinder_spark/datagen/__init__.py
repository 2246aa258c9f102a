from mediaduplicatefinder_spark.datagen.pages import generate_pages, write_pages  # noqa: F401
