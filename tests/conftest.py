from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mdf-tests", parallelism=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus():
    from mediaduplicatefinder_spark.datagen.pages import generate_pages

    pages, truth = generate_pages(n_docs=200, seed=42, min_words=30, max_words=120)
    return pages, truth


@pytest.fixture(scope="session")
def tiny_pages_df(spark, tiny_corpus):
    pages, _ = tiny_corpus
    return spark.createDataFrame(pages)
