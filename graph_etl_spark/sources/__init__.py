"""Source adapters: schema-exact table readers for the engine and the
test harness.

``read_table`` centralizes the one physical-format quirk in the
driver's testdata — ``events.parquet`` stores TIMESTAMP(NANOS), which
Spark reads only as long (``spark.sql.legacy.parquet.nanosAsLong``) —
and converts it back to a proper timestamp column so downstream
operators see the same schema DuckDB does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def ns_to_timestamp(col):
    """Nanosecond epoch long -> timestamp (microsecond precision,
    matching DuckDB's cast of TIMESTAMP_NS to TIMESTAMP)."""
    return F.timestamp_micros((col / 1000).cast("long"))


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with schema normalization."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        # nanosAsLong leaves ns-timestamps as LongType; restore them.
        if name == "events" and field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", ns_to_timestamp(F.col("ts")))
    return df


def read_csv(spark: SparkSession, path: str, sep: str = ",") -> DataFrame:
    """User-side CSV scan (S4 parity — reference example/imdb.py:12)."""
    return spark.read.option("sep", sep).option("header", True).option(
        "inferSchema", True
    ).csv(path)
