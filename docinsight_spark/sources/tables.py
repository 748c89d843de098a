"""Table IO abstraction: Iceberg when available, Parquet fallback.

The production input is an Iceberg table of source-code repositories
``(repo, path, commit, lang, content)``.  This sandbox has no Iceberg
runtime jar, so every reader/writer goes through this module: the
Iceberg path is exercised when ``spark.sql.catalog.*`` is configured,
and the Parquet path is a drop-in otherwise (same schemas, same
partition columns).  Reference analog: the pluggable loader registry
(``/root/reference/ingestion/pipeline_ingest.py:182-191``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm_class = "org.apache.iceberg.spark.SparkCatalog"
        spark.sparkContext._jvm.java.lang.Class.forName(jvm_class)  # noqa: SLF001
        return True
    except Exception:
        return False


def read_corpus(spark: SparkSession, locator: str) -> DataFrame:
    """``locator`` = ``iceberg:<catalog.db.table>`` or a parquet path."""
    if locator.startswith("iceberg:"):
        df = spark.read.format("iceberg").load(locator[len("iceberg:"):])
    else:
        df = spark.read.parquet(locator)
    missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"corpus table missing columns {missing}; has {df.columns}")
    return df.select(*CORPUS_COLUMNS)


def write_table(
    df: DataFrame, locator: str, mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    if locator.startswith("iceberg:"):
        writer = df.writeTo(locator[len("iceberg:"):])
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(locator)


# DDL kept ready for the Iceberg deployment (not executable in-sandbox):
CORPUS_DDL = """
CREATE TABLE IF NOT EXISTS {catalog}.{db}.source_files (
    repo    string,
    path    string,
    commit  string,
    lang    string,
    content string
)
USING iceberg
PARTITIONED BY (bucket(1024, repo))
TBLPROPERTIES (
    'write.target-file-size-bytes' = '536870912',
    'read.split.target-size'       = '268435456'
)
"""
