from __future__ import annotations

import pytest

from docinsight_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="docinsight_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """200-row deterministic code corpus (fixture F1 'tiny')."""
    from docinsight_spark.corpus import make_corpus

    df = make_corpus(spark, 200, seed=42, partitions=4).cache()
    df.count()
    return df
