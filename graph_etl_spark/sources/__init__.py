"""Source adapters: schema-exact table readers for the engine and the
test harness.

``read_table`` centralizes the one physical-format quirk in the
driver's testdata: the ``events.parquet`` ``ts`` column's physical
type has varied across driver generations — TIMESTAMP(NANOS) (which
Spark reads only as long via ``spark.sql.legacy.parquet.nanosAsLong``)
in earlier rounds, micros-without-tz (which Spark 4 reads as
TIMESTAMP_NTZ) currently.  ``read_table`` normalizes BOTH to a plain
TIMESTAMP (session-tz, UTC under ``runtime_confs``) so downstream
operators see one stable schema that matches what DuckDB reads.
"""

from __future__ import annotations

from contextlib import contextmanager

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
    # Robustness for TIMESTAMP(NANOS) events data (earlier testdata
    # generations): without this such a scan throws
    # PARQUET_TYPE_ILLEGAL; with it ns-timestamps arrive as long and
    # read_table restores them to timestamp below. Harmless no-op for
    # the current micros-NTZ data.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Reference semantics are permissive-cast (polars); ANSI-on turns
    # heterogeneous coalesce/comparison into hard cast errors.
    "spark.sql.ansi.enabled": "false",
    # Epoch<->wall-clock conversions (events windows, date_trunc) must
    # agree with the DuckDB oracle's naive-UTC timestamps regardless of
    # the host session's timezone.
    "spark.sql.session.timeZone": "UTC",
}


@contextmanager
def runtime_confs(spark: SparkSession):
    """Scoped engine semantics: snapshot the host's values, set the
    engine's runtime confs, RESTORE the host's values on exit — the
    session is left exactly as handed to us.

    Why scoping is sound: Spark bakes all three semantics into the plan
    while the DataFrame is being BUILT, not when it is executed —
    parquet type mapping at ``spark.read`` (scan schema is captured in
    the relation), cast/arithmetic EvalMode and the session timezone at
    the eager per-transformation analysis PySpark performs. Verified
    empirically on this build: a frame built inside the scope keeps
    permissive casts, UTC timestamps, and a readable ns-timestamp scan
    when collected AFTER restore under opposite host confs. The
    corollary: everything that builds the frame (including any
    driver-side collects an operator performs) must happen inside the
    scope — which is why ``read_table`` scopes its own body and
    ``__spark_entry__.queries()`` wraps each query builder whole.

    Conf mutation is session-global, so the scope assumes the session
    is not concurrently building queries on another thread — the same
    single-threaded-driver assumption Spark's own conf API makes.
    """
    snapshot: dict[str, str | None] = {}
    try:
        # snapshot+set INSIDE the try: if a set raises mid-loop (e.g. a
        # conf made static in a future Spark), finally still restores
        # every key snapshotted so far — the session is never left
        # partially switched.
        for k, v in _RUNTIME_CONFS.items():
            try:
                snapshot[k] = spark.conf.get(k, None)
            except Exception:
                snapshot[k] = None
            spark.conf.set(k, v)
        yield spark
    finally:
        for k, prev in snapshot.items():
            try:
                if prev is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, prev)
            except Exception:
                pass


def ensure_runtime_confs(spark: SparkSession) -> None:
    """STICKY escape hatch: pin the engine's runtime confs on the
    session for the rest of its lifetime (idempotent, cheap).

    Prefer the scoped ``runtime_confs`` context manager — it restores
    the host's values on exit. Use this form when an application runs
    the engine's semantics everywhere and wants them set once (e.g. a
    dedicated session from ``get_spark``, which already applies them at
    construction). SIDE EFFECT when called on a shared host session:
    ANSI off / UTC timezone / nanos-as-long parquet reads persist and
    change the semantics of the host's own subsequent queries."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            current = spark.conf.get(k, None)
        except Exception:
            current = None
        if current != v:
            spark.conf.set(k, v)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with schema normalization.

    Conf-neutral: the scan + normalization build inside a scoped
    ``runtime_confs`` block, so the returned frame carries engine
    semantics while the caller's session confs are left untouched.

    Shuffle-bound plans read the scan as-is (no blanket repartition —
    it would add an exchange to every query); per-row compute-heavy
    operators opt into ``fan_out`` themselves."""
    with runtime_confs(spark):
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for field in df.schema.fields:
            if name == "events" and field.name == "ts":
                # Normalize every physical variant the testdata has
                # shipped to ONE logical type (plain TIMESTAMP, UTC
                # session tz) so downstream temporal operators never
                # see a type drift:
                if isinstance(field.dataType, T.LongType):
                    # nanosAsLong left a ns-epoch long; restore it.
                    df = df.withColumn("ts", ns_to_timestamp(F.col("ts")))
                elif isinstance(field.dataType, T.TimestampNTZType):
                    # micros-without-tz reads as TIMESTAMP_NTZ in
                    # Spark 4; NTZ->TIMESTAMP resolves in the session
                    # timezone (UTC here), matching DuckDB's naive-UTC
                    # reading of the same file.
                    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
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
    queries (it would pollute their plans with an extra exchange).

    The under-split probe is FILE COUNT, not ``df.rdd`` partition
    count: ``.rdd`` forces full physical planning of a throwaway RDD
    plan at BUILD time, once per operator invocation (driver-side
    latency on every compute-heavy operator). ``inputFiles()`` reads
    the already-listed FileIndex — no planning. File count is the right
    proxy for the failure mode this guards (row-group-limited local
    parallelism): a corpus in >= target/2 files is split enough; a
    few-file input gets the round-robin exchange, which in a
    compute-heavy stage is noise next to the work it balances. Frames
    with no file lineage (in-memory ingest) keep the exact RDD probe —
    planning a LocalRelation is trivial, so the cost concern doesn't
    apply there."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    threshold = max(1, target // 2)
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= threshold:
        return df
    if n_files == 0 and df.rdd.getNumPartitions() >= threshold:
        return df
    return df.repartition(target)


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
    dst = jvm.org.apache.hadoop.fs.Path(dst_path)
    # the read is lazy — overwriting the source mid-scan would destroy
    # it, so refuse dst==src outright (qualified-path equality covers
    # relative/absolute/scheme spellings on the same filesystem)
    wd = fs.getWorkingDirectory()
    if path.makeQualified(fs.getUri(), wd).equals(dst.makeQualified(fs.getUri(), wd)):
        raise ValueError(
            f"compact_dataset: dst_path == src_path ({src_path!r}); "
            "write to a new location, then swap"
        )
    total_bytes = fs.getContentSummary(path).getLength()
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(src_path)
    writer = df.repartition(int(n_files)).write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(dst_path)
    else:
        writer.format(fmt).save(dst_path)
    # report what actually landed, not what was requested
    actual = sum(
        1
        for st in fs.listStatus(dst)
        if st.getPath().getName().startswith("part-")
    )
    return actual


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


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | str,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout — the 100 TB data-skipping
    staple: a reader filtering on a partition column scans ONLY the
    matching directories (partition pruning happens at planning, before
    any file I/O; see the PartitionFilters plan guard). Choose LOW
    cardinality columns (date, language, source) — a high-cardinality
    partition key explodes into millions of tiny directories.

    ``max_records_per_file`` additionally bounds file size inside each
    partition (the write_chunked knob)."""
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    writer = df.write.mode(mode).partitionBy(*cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.parquet(path)


def zorder_key(
    df,
    cols: list[str],
    bits: int = 16,
    out: str = "zkey",
):
    """Morton (Z-order) clustering key over 2+ numeric columns: each
    column min-max-scales to a ``bits``-bit integer and the bits
    interleave — rows close in EVERY dimension land close in the key,
    so sorting files by it makes min/max footer pruning effective for
    predicates on ANY of the dimensions (the Delta/Iceberg OPTIMIZE
    ZORDER layout primitive; pair with ``repartitionByRange(zkey)``
    before the write).

    Determinism: scaling is one IEEE floor per column (bounds from an
    in-plan 1-row broadcast aggregate); interleaving is pure integer
    shift/mask arithmetic — identical on any engine.

    Scale: one bounds aggregate (scalar broadcast) + map-side
    expression work; total interleave terms = bits x n_cols, each a
    shift-and-or — no shuffle until the caller's range partitioning."""
    from pyspark.sql import functions as F

    n = int(bits)
    if n * len(cols) > 62:
        raise ValueError(
            f"zorder_key: {n} bits x {len(cols)} cols exceeds the signed "
            "64-bit key space; lower bits or drop a dimension"
        )
    bounds = df.agg(
        *[
            x
            for c in cols
            for x in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            )
        ]
    )
    base = df.crossJoin(F.broadcast(bounds))
    scaled = {}
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        frac = F.when(hi > lo, (F.col(c).cast("double") - lo) / (hi - lo)).otherwise(
            F.lit(0.0)
        )
        scaled[c] = F.least(
            F.lit((1 << n) - 1),
            F.greatest(F.lit(0), F.floor(frac * (1 << n))),
        ).cast("long")
    z = F.lit(0).cast("long")
    for bit in range(n):
        for ci, c in enumerate(cols):
            # Column.__and__ is LOGICAL and in PySpark — bit masking
            # needs the explicit bitwiseAND
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(scaled[c], bit).bitwiseAND(F.lit(1).cast("long")),
                    bit * len(cols) + ci,
                ).cast("long")
            )
    return base.withColumn(out, z).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def file_level_stats(spark, path: str, cols: list[str]):
    """Per-file min/max manifest over a parquet dataset: one row per
    physical file with each requested column's range — the
    data-skipping audit that shows whether a layout (natural,
    partitioned, Z-ordered) actually makes footer pruning effective.
    Tight, non-overlapping per-file ranges mean a predicate on the
    column can skip files; full-span ranges in every file mean every
    scan reads everything.

    Scale: one pass, map-side-combined aggregation keyed by
    input_file_name() — file count rows out."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(*aggs)
        .withColumnRenamed("__file", "file")
    )


def compaction_plan(
    df,
    partition_cols: list[str],
    target_bytes: int = 128 * 1024 * 1024,
    tiny_fraction: float = 0.125,
    count_files: bool = False,
):
    """Small-file compaction planner — the table-maintenance advisory a
    100 TB lakehouse runs nightly: for each value of ``partition_cols``
    estimate the partition's uncompressed payload, derive how many
    ``target_bytes`` output files a rewrite should produce, and flag
    the partitions worth acting on:

      - ``split``   — payload exceeds one target file (write N files)
      - ``tiny``    — payload under ``tiny_fraction``·target (merge
                      candidate: many such siblings = the classic
                      small-file problem that floods the NameNode /
                      object-store listing and starves scan parallelism)
      - ``compact`` — (only with ``count_files=True``) more physical
                      files than the target count: rewrite shrinks the
                      file inventory
      - ``ok``      — leave alone

    Size model (deterministic, engine-mirrorable — no sampling, no
    file-footer reads): per row, strings/binaries count their byte
    length, arrays 8 bytes per element, everything else 8 bytes.
    A heuristic for PLANNING (real parquet compresses), but monotone
    in payload, which is what the split/tiny thresholds need.

    Scale: one scan, one map-side-combinable aggregation keyed by the
    partition columns — output is partition-count rows. The optional
    file count rides the same agg via ``input_file_name()`` (exact
    only when files don't interleave partitions — true for
    directory-partitioned layouts)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    size_terms = []
    for f in df.schema.fields:
        if f.name in partition_cols:
            continue
        c = F.col(f.name)
        if isinstance(f.dataType, (T.StringType, T.BinaryType)):
            size_terms.append(F.coalesce(F.octet_length(c), F.lit(0)))
        elif isinstance(f.dataType, T.ArrayType):
            # size(NULL) is -1 on non-ANSI sessions (never NULL), so an
            # outer coalesce would silently subtract 8 per null row
            size_terms.append(
                F.when(c.isNull(), F.lit(0))
                .otherwise(F.size(c) * F.lit(8))
                .cast("int")
            )
        else:
            size_terms.append(F.lit(8))
    # every column may be a partition column — the estimate is then the
    # row count alone, not a crash
    row_bytes = size_terms[0] if size_terms else F.lit(0)
    for t in size_terms[1:]:
        row_bytes = row_bytes + t
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_bytes.cast("long")).alias("est_bytes"),
    ]
    if count_files:
        # materialized pre-agg: input_file_name() is non-deterministic
        # to the analyzer and may not sit inside an aggregate directly
        df = df.withColumn("__file", F.input_file_name())
        aggs.append(F.countDistinct(F.col("__file")).alias("n_files"))
    plan = df.groupBy(*partition_cols).agg(*aggs)
    n_target = F.greatest(
        F.lit(1), F.ceil(F.col("est_bytes") / F.lit(int(target_bytes)))
    ).cast("long")
    plan = plan.withColumn("n_files_target", n_target)
    action = F.when(
        F.col("est_bytes") > F.lit(int(target_bytes)), F.lit("split")
    ).when(
        F.col("est_bytes") < F.lit(int(target_bytes * tiny_fraction)),
        F.lit("tiny"),
    )
    if count_files:
        action = action.when(
            F.col("n_files") > F.col("n_files_target"), F.lit("compact")
        )
    return plan.withColumn("action", action.otherwise(F.lit("ok")))
