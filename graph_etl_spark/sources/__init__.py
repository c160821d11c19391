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


# Confs the engine needs but cannot assume: any caller (notably the
# driver's correctness harness) may hand us a SparkSession built with
# Spark 4 defaults — ANSI on, no parquet legacy confs. Both of these
# are runtime-settable, so we pin them before every read instead of
# relying on session-construction time.
_RUNTIME_CONFS = {
    # events.parquet stores TIMESTAMP(NANOS); without this the scan
    # throws PARQUET_TYPE_ILLEGAL. With it, ns-timestamps arrive as
    # long and read_table restores them to timestamp below.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Reference semantics are permissive-cast (polars); ANSI-on turns
    # heterogeneous coalesce/comparison into hard cast errors.
    "spark.sql.ansi.enabled": "false",
    # Epoch<->wall-clock conversions (events windows, date_trunc) must
    # agree with the DuckDB oracle's naive-UTC timestamps regardless of
    # the host session's timezone.
    "spark.sql.session.timeZone": "UTC",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Make the current session driver-proof (idempotent, cheap).

    SIDE EFFECT — this mutates the caller's SparkSession GLOBALLY and
    for the rest of the session: ANSI mode off, UTC session timezone,
    legacy nanos-as-long parquet reads. Every ``read_table`` call
    applies it, so embedding this engine in a host application changes
    the semantics of the host's own subsequent queries (e.g. permissive
    casts where ANSI would have errored). This is deliberate: the
    engine's semantics are defined under these confs, and they must
    hold on ANY session handed to us, including the correctness
    driver's ANSI-on default session. Hosts that need ANSI behavior for
    their own queries should run them on a separate SparkSession (conf
    isolation comes free with ``SparkSession.newSession()``... note
    runtime confs are per-session there, shared SparkContext)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            current = spark.conf.get(k, None)
        except Exception:
            current = None
        if current != v:
            spark.conf.set(k, v)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with schema normalization.

    Shuffle-bound plans read the scan as-is (no blanket repartition —
    it would add an exchange to every query); per-row compute-heavy
    operators opt into ``fan_out`` themselves."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        # nanosAsLong leaves ns-timestamps as LongType; restore them.
        if name == "events" and field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", ns_to_timestamp(F.col("ts")))
    return df


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough input splits for a per-row compute-heavy stage
    (shingling, hashing, embedding math).

    Single-row-group parquet cannot be split, so locally such a scan is
    ONE task and the expensive expressions serialize onto one core —
    measured 2-3× on the sf0.1 dedup bench. Real corpora arrive in
    thousands of splits, so the repartition branch is a no-op at
    cluster scale (partitions >= parallelism) and costs one small
    round-robin exchange only when the input is under-split. Apply at
    the START of compute-heavy operators, never in plain SQL-shaped
    queries (it would pollute their plans with an extra exchange)."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, target // 2):
        return df.repartition(target)
    return df


def read_csv(
    spark: SparkSession, path: str, sep: str = ",", schema: T.StructType | None = None
) -> DataFrame:
    """User-side CSV scan (S4 parity — reference example/imdb.py:12).
    Pass ``schema`` to skip the inference pass (one full read saved)."""
    reader = spark.read.option("sep", sep).option("header", True)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", True).csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan — the common training-data interchange format.
    Explicit schema strongly recommended at scale (inference reads
    everything once)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan — same predicate-pushdown/column-pruning behavior as
    parquet via the vectorized ORC reader."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Raw text scan: one row per line (``value`` string), or one row
    per FILE with ``wholetext`` — the ingest shape for line-delimited
    corpora respectively document-per-file dumps."""
    # NB: must go through the text() kwarg — DataFrameReader.text()
    # overwrites a previously-set "wholetext" option with its own
    # parameter default
    return spark.read.text(path, wholetext=whole_file)


def compact_dataset(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Rewrite a many-small-files dataset into ~``target_file_mb``
    outputs — the small-files remedy (a staged corpus accumulated over
    thousands of incremental writes scans at metadata speed, not I/O
    speed). Returns the number of output files requested.

    Sizing reads the FILESYSTEM byte count (Hadoop FS, works on any
    scheme Spark can read), not a row sample — compressed size is what
    file targets mean. The rewrite is one round-robin repartition to
    ceil(bytes/target): no shuffle key, so it parallelizes perfectly
    and preserves nothing but the data (use write_bucketed instead
    when downstream joins deserve co-location)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = path.getFileSystem(hconf)
    total_bytes = fs.getContentSummary(path).getLength()
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(src_path)
    writer = df.repartition(int(n_files)).write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(dst_path)
    else:
        writer.format(fmt).save(dst_path)
    return int(n_files)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_col) at
    WRITE time so equi-joins/aggregations between tables bucketed the
    same way need no shuffle at READ time — the pre-partitioning lever
    for repeated large joins (e.g. a fact table joined on the same key
    every run). sortBy additionally enables shuffle-free sort-merge."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def write_chunked(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    max_records_per_file: int = 200_000,
    partition_by: list[str] | None = None,
    sep: str = ";",
) -> None:
    """S5 chunked sink for arbitrary DataFrames: bounded file sizes via
    the writer option (no global row-number shuffle), optional
    partition columns for downstream pruning."""
    writer = df.write.mode("overwrite").option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("sep", sep).option("header", True).csv(path)
    else:
        writer.parquet(path)
