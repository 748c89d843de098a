"""Table IO abstraction: parquet path, schema validation, iceberg gate."""

import pytest

from docinsight_spark.corpus import make_corpus
from docinsight_spark.sources.tables import (
    iceberg_available,
    read_corpus,
    write_table,
)


def test_parquet_roundtrip_and_schema_check(spark, tmp_path):
    path = str(tmp_path / "corpus")
    corpus = make_corpus(spark, 20)
    write_table(corpus, path)
    back = read_corpus(spark, path)
    assert back.count() == 20
    assert back.columns == ["repo", "path", "commit", "lang", "content"]


def test_read_corpus_rejects_wrong_schema(spark, tmp_path):
    path = str(tmp_path / "bad")
    spark.range(3).write.parquet(path)
    with pytest.raises(ValueError, match="missing columns"):
        read_corpus(spark, path)


def test_iceberg_detection_graceful(spark):
    # sandbox has no iceberg jar: detection must return False, not raise
    assert iceberg_available(spark) is False


def test_write_table_append_mode(spark, tmp_path):
    path = str(tmp_path / "app")
    write_table(make_corpus(spark, 5), path)
    write_table(make_corpus(spark, 5, seed=43), path, mode="append")
    assert spark.read.parquet(path).count() == 10
