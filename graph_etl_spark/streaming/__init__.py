"""Structured Streaming surface (new capability beyond the reference —
SURVEY.md §2.9: the reference is strictly batch).

Three pieces:
  * ``stream_save_nodes``: readStream → foreachBatch → the SAME
    save_nodes normalization chain as batch — streaming ingest into
    the staged graph without a second code path.
  * ``windowed_event_counts``: watermarked tumbling-window aggregation
    (the canonical late-data-tolerant streaming agg).
  * ``sessionize``: gap-based session assignment, usable in batch
    (window functions) and as a model for
    ``applyInPandasWithState`` in streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stream_batch_sink(store, label: str, primary_key: str = "id"):
    """The foreachBatch sink for ``stream_save_nodes``, idempotent
    under micro-batch re-delivery.

    Structured Streaming's foreachBatch contract is at-least-once: on
    failure recovery the SAME ``batch_id`` is delivered again, and the
    sink — not the engine — must make the second delivery a no-op.
    This applies the reference's P8 run-ledger contract
    (``graph_etl/utils.py:21-42``: skip work whose id is already in
    the ledger) at micro-batch granularity, with TWO layers so a crash
    anywhere in the commit window still cannot double-count:

      1. The staged file name is DERIVED from ``(label, batch_id)``
         (not a fresh uuid), so a re-delivered batch that raced a crash
         between the save and the ledger append overwrites its own
         earlier staging directory and re-registers the same
         dict-keyed catalog entry — a true overwrite, not a second
         copy (the stats counter nets out the prior count too).
      2. A ``label:batch_id`` entry in ``log_stream.txt`` is appended
         after the catalog flush; a re-delivered batch whose entry
         exists is skipped entirely (no redundant write)."""
    from ..context import Context

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        entry = f"{label}:{batch_id}"
        if store.ledger_contains("log_stream.txt", entry):
            return  # re-delivered micro-batch: already staged
        ctx = Context(store, {"stream_batch": batch_id})
        ctx.save_nodes(
            batch_df,
            label=label,
            primary_key=primary_key,
            file_name=f"FILE_STREAM_{label}_{batch_id}",
        )
        store.flush_configs()
        store.ledger_append("log_stream.txt", entry)

    return sink


def stream_save_nodes(
    stream_df: DataFrame,
    label: str,
    primary_key: str = "id",
    checkpoint_dir: str = "./output/checkpoints",
    trigger_once: bool = True,
):
    """Pipe a streaming DataFrame through the batch save_nodes chain
    via foreachBatch. Each micro-batch is normalized (flatten, strip,
    dedup, null-drop) and staged exactly like a batch save; the
    ``log_stream.txt`` ledger makes micro-batch re-delivery idempotent
    (see ``stream_batch_sink``)."""
    from ..catalog import get_store

    writer = (
        stream_df.writeStream.foreachBatch(
            stream_batch_sink(get_store(), label, primary_key)
        ).option("checkpointLocation", f"{checkpoint_dir}/{label}")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_quality_gate(
    docs: DataFrame,
    min_tokens: int = 10,
    max_dup_word_frac: float = 0.5,
    max_contact_strings: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-quality admission filter as a STREAMING stage: scrub
    contact strings, compute repetition signals, and keep only
    documents passing the gates — all stateless per-row expressions, so
    the same plan runs on a batch frame or a readStream with no
    watermark/state (ingest-time filtering, the shape a live crawl
    pipeline uses before anything stateful sees the data).

    Returns the filtered frame with the quality columns attached;
    callers write it with ``writeStream`` (streaming) or a batch write.

    The admission predicates are LEAN re-expressions of the gated
    columns, not references to them: Catalyst pushes deterministic
    filters through projections by SUBSTITUTING the column's defining
    expression into the predicate, so gating on
    ``repetition_stats``' columns would re-evaluate its interpreted
    sort + run-length lambda chain once per predicate per row at the
    scan (measured 12.4 s vs 1.0 s for the unfiltered composition at
    sf0.1). The lean forms — ``size(array_distinct(toks))`` for the
    distinct count, ``size(tokens)`` for length — are lambda-free,
    whole-stage-codegen expressions computing bit-identical gate
    values (distinct-token count is distinct-token count), so the
    pushed-down duplicates are cheap and the expensive stat columns
    evaluate only for admitted rows. No optimizer barrier needed, so
    the plan stays stateless and streaming-legal.
    """
    from ..operators.quality import EMAIL_RE, URL_RE, repetition_stats, scrub_contact_strings
    from ..operators.text import tokens_col

    scored = repetition_stats(scrub_contact_strings(docs, text_col=text_col),
                              text_col=text_col)
    toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(toks)
    dup = F.round(
        F.when(n > 0, F.lit(1.0) - F.size(F.array_distinct(toks)) / n).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    contacts = F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)) + F.regexp_count(
        F.col(text_col), F.lit(URL_RE)
    )
    return scored.filter(
        (n >= min_tokens) & (dup <= max_dup_word_frac) & (contacts <= max_contact_strings)
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts + value sum with a late-data watermark.
    Works on both batch and streaming DataFrames (same plan; the
    watermark only constrains state in streaming mode)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("win"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # round-then-DECIMAL-sum: double summation is order-dependent
            # (quality.py saw a 6th-decimal divergence at 60k rows), so sum
            # exact decimals of the rounded values — order-free, oracle-safe.
            F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
):
    """Custom stateful streaming operator: gap-based session counts via
    ``applyInPandasWithState`` — per-user state carries (last event ts,
    session counter) across micro-batches, with a processing-time
    timeout closing idle sessions. The streaming twin of
    ``sessionize`` (same gap rule).

    Returns an *unstarted* transformed streaming DataFrame with schema
    (user_id long, session_id long, n_events long) — one row per
    updated user per micro-batch.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_secs = gap_minutes * 60

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_ts, session_id, n_events = state.get
        else:
            last_ts, session_id, n_events = None, 0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            # vectorized gap scan (no per-event Python loop): sort,
            # diff against the previous event — seeding the diff with
            # the carried state (or -inf for a fresh user, so the
            # first event always opens a session) — and count the
            # gap-exceeding boundaries in one numpy pass
            s = pdf[ts_col].sort_values()
            if pd.api.types.is_datetime64_any_dtype(s):
                epochs = s.astype("int64").to_numpy() / 1e9  # ns → sec
            else:
                epochs = s.to_numpy(dtype="float64")
            prev = last_ts if last_ts is not None else -np.inf
            gaps = np.diff(epochs, prepend=prev)
            session_id += int((gaps > gap_secs).sum())
            last_ts = float(epochs[-1])
            n_events += len(epochs)
        state.update((last_ts, session_id, n_events))
        yield pd.DataFrame(
            {"user_id": [user_id], "session_id": [session_id], "n_events": [n_events]}
        )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType="user_id long, session_id long, n_events long",
        stateStructType="last_ts double, session_id long, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes it, so state size is O(keys per watermark window),
    not O(all keys ever) — the only dedup form that survives an
    unbounded stream. On a batch DataFrame it degrades to plain
    dropDuplicates (same result set when all data is 'on time').

    The streaming twin of ``operators.dedup.exact_dedup`` for ingest
    paths: run this at the stream edge, run the batch MinHash/SimHash
    passes on the staged output."""
    cols = keys or [c for c in events.columns if c != ts_col]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            cols
        )
    return events.dropDuplicates(cols)


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "1 hour",
    right_suffix: str = "_right",
) -> DataFrame:
    """Stream-stream equi + interval join: pair each left event with
    the right events of the same key whose timestamp falls in
    ``[left_ts - within, left_ts]`` (e.g. clicks joined to the errors
    that preceded them by at most 10 minutes).

    Streaming semantics: BOTH sides get a watermark and the join
    condition carries the two-sided time bound Structured Streaming
    requires to expire join state — without it, stream-stream join
    state grows without bound (every past right row is a potential
    match forever). State per key is O(events per watermark window).

    Batch semantics: the same plan with no watermark — an equi-join
    plus interval predicate — so one function serves both the live
    pipeline and its backfill, and the batch form is what the tests
    compare against a hand-built join.

    The right side's key/ts are renamed with ``right_suffix``; its
    payload columns keep their names (callers project/rename when the
    two sides share payload column names)."""
    r = right.select(
        F.col(on).alias(f"{on}{right_suffix}"),
        F.col(right_ts).alias(f"{right_ts}{right_suffix}"),
        *[F.col(c) for c in right.columns if c not in (on, right_ts)],
    )
    l_df = left
    if l_df.isStreaming:
        l_df = l_df.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(f"{right_ts}{right_suffix}", watermark)
    rts = F.col(f"{right_ts}{right_suffix}")
    lts = F.col(left_ts)
    cond = (
        (F.col(on) == F.col(f"{on}{right_suffix}"))
        & (rts >= lts - F.expr(f"INTERVAL {within}"))
        & (rts <= lts)
    )
    return l_df.join(r, cond, "inner").drop(f"{on}{right_suffix}")


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization (batch form): a new session starts when
    the inter-event gap exceeds ``gap_minutes``. One shuffle on the
    user key; cumulative-sum session ids via two windows.

    Epoch extraction casts through ``timestamp`` first: TIMESTAMP_NTZ
    (what parquet micros-without-tz reads as in Spark 4) cannot be cast
    straight to long, but NTZ->TIMESTAMP is legal and resolves in the
    session timezone (UTC under ``runtime_confs``), and is a no-op when
    the column is already TIMESTAMP — so one expression covers both
    types the testdata has shipped."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return (
        events.withColumn("__new", new_session)
        .withColumn(
            "session_id",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .drop("__new")
    )


def incremental_ingest_sink(
    index_df: DataFrame,
    admitted_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **dedup_kw,
):
    """foreachBatch sink for ``streaming_incremental_ingest``: vet each
    micro-batch with the batch ``incremental_dedup`` operator against
    the static index PLUS everything already admitted from earlier
    micro-batches, and persist only the survivors — the index GROWS as
    the stream runs, so a doc admitted in batch 3 blocks its re-crawl
    in batch 7 (true incremental semantics, not per-batch amnesia).

    Replay idempotence (foreachBatch is at-least-once): the output
    path is DERIVED from the batch id (``batch_id=N`` partition dir,
    overwritten on re-delivery), and the accumulated-index read
    excludes the current batch id — so a re-delivered batch is vetted
    against exactly the same index it saw the first time and
    overwrites its own earlier output. No ledger needed: the write is
    idempotent by construction.
    """
    import os

    from ..operators.dedup import incremental_dedup

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        idx = index_df.select(id_col, text_col)
        # First-delivery detection must be NARROW: only a missing/empty
        # admitted_dir means "no prior batches". Any other read failure
        # (corrupt file, permissions, FS hiccup) must fail the batch —
        # swallowing it would vet the batch against an index missing
        # all previously admitted docs and silently re-admit duplicates.
        from pyspark.errors import AnalysisException

        try:
            prior = spark.read.parquet(admitted_dir)
            idx = idx.unionByName(
                prior.filter(F.col("batch_id") != batch_id).select(id_col, text_col)
            )
        except AnalysisException as e:
            msg = str(e)
            if not (
                "PATH_NOT_FOUND" in msg
                or "Path does not exist" in msg
                or "UNABLE_TO_INFER_SCHEMA" in msg  # dir exists but empty
            ):
                raise  # real analysis failure: do not admit blindly
        verdicts = incremental_dedup(
            idx,
            batch_df.select(id_col, text_col),
            text_col=text_col,
            id_col=id_col,
            **dedup_kw,
        )
        kept = batch_df.join(
            verdicts.filter(F.col("verdict") == "kept"), id_col, "left_semi"
        )
        kept.write.mode("overwrite").parquet(
            os.path.join(admitted_dir, f"batch_id={batch_id}")
        )

    return sink


def streaming_incremental_ingest(
    stream_docs: DataFrame,
    index_df: DataFrame,
    admitted_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_once: bool = True,
    **dedup_kw,
):
    """The nightly-crawl admission pipeline as a STREAMING stage: a
    live document stream is vetted batch-by-batch against a static
    indexed corpus (exact content hash + MinHash band buckets, all
    semi-joins — ``operators.dedup.incremental_dedup``) plus the
    stream's own previously-admitted docs; survivors land under
    ``admitted_dir`` partitioned by micro-batch.

    State posture: the vetting itself is stateless per micro-batch
    (the \"state\" is the admitted parquet, re-read per batch — at
    cluster scale that read is partition-pruned to nothing by the
    batch_id filter and the index side reduces to distinct
    hash/bucket keys); no watermark needed.
    """
    writer = stream_docs.writeStream.foreachBatch(
        incremental_ingest_sink(
            index_df, admitted_dir, id_col=id_col, text_col=text_col, **dedup_kw
        )
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _cdc_index_dir(chunk_dir: str, index_dir: str | None) -> str:
    return index_dir if index_dir is not None else chunk_dir.rstrip("/") + "_index"


class LocalFsLister:
    """The driver-side directory/metadata surface the CDC index
    maintenance needs (VERDICT r14 #4) — local-filesystem default.
    All CDC maintenance routes through this interface instead of raw
    ``os.listdir``/``shutil`` calls, so an object-store deployment
    swaps ONE object (``HadoopFsLister``), not the maintenance code."""

    def list(self, path: str) -> list[str]:
        import os

        return os.listdir(path) if os.path.isdir(path) else []

    def is_dir(self, path: str) -> bool:
        import os

        return os.path.isdir(path)

    def is_file(self, path: str) -> bool:
        import os

        return os.path.isfile(path)

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()

    def write_text(self, path: str, text: str) -> None:
        with open(path, "w") as fh:
            fh.write(text)

    def remove_dir(self, path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


class HadoopFsLister:
    """The same surface through the JVM Hadoop ``FileSystem`` API —
    ``s3a://`` / ``gs://`` / ``abfs://`` paths list and delete through
    their configured connector (and ``file://`` through the local FS,
    which is how the test exercises this class without an object
    store). Listing returns child NAMES, matching ``os.listdir``."""

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _fs_path(self, path: str):
        p = self._jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(self._conf), p

    def list(self, path: str) -> list[str]:
        fs, p = self._fs_path(path)
        if not fs.exists(p) or not fs.getFileStatus(p).isDirectory():
            return []
        return [st.getPath().getName() for st in fs.listStatus(p)]

    def is_dir(self, path: str) -> bool:
        fs, p = self._fs_path(path)
        return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())

    def is_file(self, path: str) -> bool:
        fs, p = self._fs_path(path)
        return bool(fs.exists(p) and fs.getFileStatus(p).isFile())

    def read_text(self, path: str) -> str:
        fs, p = self._fs_path(path)
        stream = fs.open(p)
        try:
            try:
                # one py4j call for the whole payload (commons-io ships
                # with Hadoop); the byte-loop fallback costs one RPC
                # per byte and only ever reads tiny _graft_meta.json
                data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(
                    stream
                )
                return bytes(data).decode("utf-8")
            except Exception:
                # toByteArray may have consumed part of the stream —
                # rewind before the byte-loop or the fallback would
                # return tail-only content (FSDataInputStream.seek)
                stream.seek(0)
                out = bytearray()
                b = stream.read()
                while b >= 0:
                    out.append(b)
                    b = stream.read()
                return out.decode("utf-8")
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        fs, p = self._fs_path(path)
        stream = fs.create(p, True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()

    def remove_dir(self, path: str) -> None:
        fs, p = self._fs_path(path)
        if fs.exists(p):
            fs.delete(p, True)


def cdc_fs_lister(path: str, spark=None, lister=None):
    """Resolve the lister for a CDC directory: an explicit ``lister``
    wins (tests inject mocks here); ANY scheme-qualified path —
    including ``file:`` — takes the Hadoop FS route (code-review r15:
    ``os.path.isdir('file:/x')`` is False, so handing a file: URI to
    the local lister silently listed it as empty, the exact no-op
    failure this router exists to prevent); bare paths stay on ``os``.
    A scheme-qualified path with NEITHER spark NOR a lister raises
    instead of silently no-opping (code-review r15 on
    ``prune_cdc_raw``): maintenance that quietly prunes/compacts
    nothing is worse than one loud error."""
    if lister is not None:
        return lister
    if "://" not in path and not path.startswith("file:"):
        return LocalFsLister()
    if spark is not None:
        return HadoopFsLister(spark)
    raise ValueError(
        f"cdc_fs_lister: scheme-qualified path {path!r} needs `spark` "
        f"(routes through the Hadoop FileSystem connector) or an explicit "
        f"`lister` — an os-level scan would silently list it as empty"
    )


def _latest_cdc_index(spark, index_dir: str, lister=None):
    """Locate the newest COMPLETE compacted index version.

    Returns ``(df, high_water, version)`` where ``df`` has columns
    ``(chunk_hash, first_batch_id)`` and ``high_water`` is the largest
    raw ``batch_id`` folded into it — or ``(None, -1, 0)`` when no
    complete version exists. A version is complete only once its
    ``_graft_meta.json`` is present (written LAST by the compactor),
    so a crash mid-compaction leaves the previous version authoritative.

    Listing is a driver-side directory scan of version names only —
    O(kept versions), not O(batches) — routed through the lister
    (``cdc_fs_lister``), so on object storage it goes through the
    Hadoop FileSystem connector, not ``os``."""
    import json
    import os

    fs = cdc_fs_lister(index_dir, spark, lister)
    best = None
    for name in fs.list(index_dir):
        if not name.startswith("version="):
            continue
        try:
            v = int(name.split("=", 1)[1])
        except ValueError:
            continue
        meta_path = os.path.join(index_dir, name, "_graft_meta.json")
        if not fs.is_file(meta_path):
            continue  # incomplete (crashed) compaction — ignore
        meta = json.loads(fs.read_text(meta_path))
        if best is None or v > best[1]:
            best = (int(meta["high_water"]), v)
    if best is None:
        return None, -1, 0
    high_water, version = best
    df = spark.read.parquet(os.path.join(index_dir, f"version={version}"))
    return df, high_water, version


def compact_cdc_index(
    spark,
    chunk_dir: str,
    index_dir: str | None = None,
    up_to_batch: int | None = None,
    n_buckets: int = 32,
    keep_versions: int = 2,
    lister=None,
) -> dict:
    """Fold the raw per-batch chunk dirs into a compact FIRST-SEEN
    hash index so ``cdc_ingest_sink`` stops re-reading the whole
    ``chunk_dir`` tree every micro-batch (the thousand-batch
    bottleneck flagged at round 13).

    The index is one distinct row per first-seen chunk hash —
    ``(chunk_hash, first_batch_id)`` — hash-repartitioned into
    ``n_buckets`` files (the path-based stand-in for a bucketed
    table: the sink's probe join shuffles only the batch side once
    both sides are hashed on ``chunk_hash``). Versions are written to
    ``index_dir/version=K`` with a ``_graft_meta.json`` high-water
    marker written LAST, so readers never see a half-written version
    and a crashed compaction is simply re-run.

    Idempotent under replay: a re-run folds the same raw rows and the
    ``min(first_batch_id)`` aggregation reproduces the same index
    byte-for-byte in value space; a call whose ``up_to_batch`` is
    already covered returns without writing.

    Scale: reads raw dirs ONLY above the previous high water
    (partition-pruned on the ``batch_id`` directory column), keeps
    first occurrences only (``NOT shared_with_index``), and unions
    with the prior compact index — per-compaction work is
    O(new batches + distinct hashes), never O(all batches)."""
    import json
    import os

    if int(keep_versions) < 1:
        raise ValueError(
            f"keep_versions must be >= 1 (got {keep_versions}): the newest "
            "version is the readers' source of truth and cannot be pruned"
        )
    idx_dir = _cdc_index_dir(chunk_dir, index_dir)
    # per-directory lister resolution: chunk_dir and an explicit
    # index_dir may live on DIFFERENT filesystems (s3a chunks + local
    # index and vice versa) — routing index maintenance through the
    # chunk dir's scheme would write _graft_meta.json to the wrong FS
    fs = cdc_fs_lister(chunk_dir, spark, lister)
    idx_fs = cdc_fs_lister(idx_dir, spark, lister)
    prior_idx, high_water, version = _latest_cdc_index(
        spark, idx_dir, lister=lister
    )
    # explicit path list: listing + read bounded to the un-compacted
    # tail (never the whole tree); basePath keeps the batch_id column
    batch_ids = []
    for name in fs.list(chunk_dir):
        if name.startswith("batch_id="):
            try:
                batch_ids.append(int(name.split("=", 1)[1]))
            except ValueError:
                pass
    if up_to_batch is None:
        up_to_batch = max(batch_ids, default=-1)
    if up_to_batch <= high_water:
        return {"version": version, "high_water": high_water, "wrote": False}
    raw_paths = [
        os.path.join(chunk_dir, f"batch_id={b}")
        for b in batch_ids
        if high_water < b <= up_to_batch
    ]
    if not raw_paths:
        return {"version": version, "high_water": high_water, "wrote": False}
    fresh = (
        spark.read.option("basePath", chunk_dir)
        .parquet(*raw_paths)
        .filter(~F.col("shared_with_index"))
        .select(
            "chunk_hash", F.col("batch_id").cast("long").alias("first_batch_id")
        )
    )
    if prior_idx is not None:
        fresh = prior_idx.select("chunk_hash", "first_batch_id").unionByName(fresh)
    merged = (
        fresh.groupBy("chunk_hash")
        .agg(F.min("first_batch_id").alias("first_batch_id"))
        .repartition(n_buckets, "chunk_hash")
    )
    new_version = version + 1
    out = os.path.join(idx_dir, f"version={new_version}")
    merged.write.mode("overwrite").parquet(out)
    idx_fs.write_text(
        os.path.join(out, "_graft_meta.json"),
        json.dumps({"high_water": int(up_to_batch)}),
    )
    # prune stale versions (keep the newest `keep_versions`, >= 1 by
    # the guard above — [:-k] with k=0 would silently keep everything)
    versions = sorted(
        int(n.split("=", 1)[1])
        for n in idx_fs.list(idx_dir)
        if n.startswith("version=") and n.split("=", 1)[1].isdigit()
    )
    for v in versions[:-int(keep_versions)]:
        idx_fs.remove_dir(os.path.join(idx_dir, f"version={v}"))
    return {"version": new_version, "high_water": int(up_to_batch), "wrote": True}


def prune_cdc_raw(
    chunk_dir: str,
    index_dir: str | None = None,
    lister=None,
    spark=None,
) -> list[int]:
    """Delete raw ``batch_id=N`` dirs already folded into the newest
    COMPLETE compact index (N <= its high water) — the retention step
    that makes the sink's bounded read CONTRACTUAL: after pruning,
    per-batch read work is exactly the compact index (distinct
    first-seen hashes) plus the un-compacted tail. Flags are provably
    unchanged (the compact index carries every first-seen hash the
    deleted dirs contributed), including for a REPLAYED old batch —
    its ``first_batch_id != bid`` filter reproduces the exact prior
    view it saw originally, and its overwrite recreates the dir.

    Returns the pruned batch ids. Never touches dirs above the high
    water (not yet folded) and is a no-op without a complete index.
    All FS traffic goes through per-directory listers
    (``cdc_fs_lister``): pass ``spark`` so scheme-qualified paths
    auto-route through the Hadoop FS, or inject a lister directly
    (tests, exotic stores) — a scheme-qualified path with neither
    RAISES rather than silently listing empty and pruning nothing
    (code-review r15). chunk_dir and an explicit index_dir may live
    on different filesystems."""
    import json
    import os

    idx_dir = _cdc_index_dir(chunk_dir, index_dir)
    fs = cdc_fs_lister(chunk_dir, spark, lister)
    idx_fs = cdc_fs_lister(idx_dir, spark, lister)
    # meta-only scan: reuse the version listing without reading data
    best_hw = -1
    for name in idx_fs.list(idx_dir):
        meta_path = os.path.join(idx_dir, name, "_graft_meta.json")
        if name.startswith("version=") and idx_fs.is_file(meta_path):
            best_hw = max(best_hw, int(json.loads(idx_fs.read_text(meta_path))["high_water"]))
    pruned = []
    if best_hw < 0:
        return pruned
    for name in fs.list(chunk_dir):
        if not name.startswith("batch_id="):
            continue
        try:
            b = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if b <= best_hw:
            fs.remove_dir(os.path.join(chunk_dir, name))
            pruned.append(b)
    return sorted(pruned)


def cdc_ingest_sink(
    chunk_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 4,
    mask_bits: int = 4,
    min_tokens: int | None = 4,
    max_tokens: int | None = 24,
    index_dir: str | None = None,
    compact_every: int | None = None,
    lister=None,
):
    """foreachBatch sink for ``streaming_cdc_ingest``: chunk each
    micro-batch's documents with the GUARDED content-defined chunker
    (chunking is a pure per-document function, so per-batch chunking
    is EXACT — no cross-batch chunk state), then mark every chunk
    whose hash already exists in the ACCUMULATED chunk index (the
    static-plus-admitted posture of ``incremental_ingest_sink`` at
    CHUNK granularity: a doc arriving in batch 7 that shares chunks
    with batch-3 docs is caught, not just byte-identical re-crawls).

    Replay idempotence (foreachBatch is at-least-once): output under
    ``batch_id=N`` partition dirs, overwritten on re-delivery; the
    prior-index read excludes the current batch id AND every chunk
    that itself flagged shared (first occurrences only), so a
    re-delivered batch sees exactly the index it saw first time — a
    chunk first seen in a later batch cannot appear in an earlier one.

    Scale: chunking is the batch-sized Arrow walk; the shared-flag
    join shuffles chunk HASHES only. The prior-index read is HYBRID:
    the newest COMPLETE compacted index version (one distinct row per
    first-seen hash, see ``compact_cdc_index``) plus ONLY the raw
    batch dirs above its high-water mark — per-batch read work is
    O(distinct hashes + un-compacted batches), never O(all batches).
    With ``compact_every=K`` the sink folds the index itself every K
    batches (the fold is replay-idempotent, so at-least-once delivery
    of the triggering batch is safe).
    """
    import os

    from ..operators.dedup import cdc_chunk_hashes

    idx_dir = _cdc_index_dir(chunk_dir, index_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        chunks = cdc_chunk_hashes(
            batch_df.select(id_col, text_col),
            window=window,
            mask_bits=mask_bits,
            min_tokens=min_tokens,
            max_tokens=max_tokens,
        )
        bid = int(batch_id)
        fs = cdc_fs_lister(chunk_dir, spark, lister)
        compact_idx, high_water, _v = _latest_cdc_index(
            spark, idx_dir, lister=lister
        )
        prior_parts = []
        if compact_idx is not None:
            # a compact row first seen in THIS batch id is this
            # batch's own output folded in — a replayed batch must
            # not flag against itself (rows first seen LATER are by
            # construction absent from this batch, so harmless)
            prior_parts.append(
                compact_idx.filter(F.col("first_batch_id") != bid)
                .select("chunk_hash")
            )
        # raw dirs strictly above the compacted high water; the
        # explicit path list bounds BOTH file listing and read to the
        # un-compacted tail (basePath keeps the batch_id partition
        # column). Driver-side dirname scan — O(batch dirs) names,
        # no data read; routed through the lister, so object-store
        # layouts list via the Hadoop FileSystem connector.
        raw_paths = []
        for name in fs.list(chunk_dir):
            if not name.startswith("batch_id="):
                continue
            try:
                b = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if b > high_water and b != bid:
                raw_paths.append(os.path.join(chunk_dir, name))
        if raw_paths:
            raw = spark.read.option("basePath", chunk_dir).parquet(*raw_paths)
            # first occurrences only: a chunk that itself flagged
            # shared was already represented by its first occurrence,
            # and excluding it makes replay exactly idempotent — a
            # chunk first seen in a LATER batch cannot exist in an
            # earlier one, so a re-delivered batch's flags are
            # untouched by everything that ran after it
            prior_parts.append(
                raw.filter(~F.col("shared_with_index")).select("chunk_hash")
            )
        prior_hashes = None
        if prior_parts:
            prior_hashes = prior_parts[0]
            for part in prior_parts[1:]:
                prior_hashes = prior_hashes.unionByName(part)
            prior_hashes = prior_hashes.distinct()
        if prior_hashes is not None:
            flagged = chunks.join(
                prior_hashes.withColumn("__seen", F.lit(True)),
                "chunk_hash",
                "left",
            ).select(
                id_col,
                "chunk_idx",
                "n_tokens",
                "chunk_hash",
                F.coalesce(F.col("__seen"), F.lit(False)).alias(
                    "shared_with_index"
                ),
            )
        else:
            flagged = chunks.select(
                id_col,
                "chunk_idx",
                "n_tokens",
                "chunk_hash",
                F.lit(False).alias("shared_with_index"),
            )
        # batch_id comes from the partition DIRECTORY on read-back
        # (the incremental_ingest_sink convention) — no duplicate column
        flagged.write.mode("overwrite").parquet(
            os.path.join(chunk_dir, f"batch_id={bid}")
        )
        if compact_every is not None and (bid + 1) % int(compact_every) == 0:
            # idempotent fold (returns without writing when this
            # high water is already covered — safe under replay)
            compact_cdc_index(
                spark, chunk_dir, index_dir=idx_dir, up_to_batch=bid,
                lister=lister,
            )

    return sink


def streaming_cdc_ingest(
    stream_docs: DataFrame,
    chunk_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_once: bool = True,
    **cdc_kw,
):
    """Guarded CDC chunking as a STREAMING ingestion stage: each
    micro-batch's documents are chunked (per-doc pure function —
    batch == stream bit-for-bit) and every chunk is flagged against
    the ACCUMULATED chunk-hash index under ``chunk_dir``, which grows
    as the stream runs. The chunk-granularity sibling of
    ``streaming_incremental_ingest``; same stateless-per-batch
    posture (the "state" is the chunk parquet), no watermark.

    Long streams: pass ``compact_every=K`` (and optionally
    ``index_dir``) through ``cdc_kw`` to fold the accumulated index
    into the versioned compact form every K batches, and run
    ``prune_cdc_raw`` on a maintenance cadence — per-batch read work
    is then bounded by distinct first-seen hashes, not stream length
    (see ``compact_cdc_index``)."""
    writer = stream_docs.writeStream.foreachBatch(
        cdc_ingest_sink(chunk_dir, id_col=id_col, text_col=text_col, **cdc_kw)
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hopping_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Hopping (sliding) window counts + value sum: every event
    contributes to duration/slide overlapping windows — the smoothing
    complement to the tumbling agg (rate dashboards, rolling SLO
    windows). Same plan in batch and streaming; the watermark bounds
    state only when streaming. Window starts align to the epoch (the
    ``F.window`` contract), emitted as epoch SECONDS so the output is
    timezone-free.

    Scale: the window expansion is a map-side ×(duration/slide) row
    blowup feeding one map-side-combinable aggregation — the shuffle
    carries (windows × groups) partial sums, never raw events."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration, slide).alias("win"),
            F.col(group_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # round-then-DECIMAL-sum (see windowed_event_counts): order-free.
            F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").cast("long").alias("window_start"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_threshold_alerts(
    events: DataFrame,
    threshold: int = 5,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
):
    """Custom stateful streaming operator: per-(user, event_type)
    cumulative counts with a one-shot ALERT row when the running count
    first crosses ``threshold`` — the alerting/rate-limit primitive
    (abuse detection, quota enforcement) as ``applyInPandasWithState``.

    State per key: (count so far, fired flag, the ``threshold``
    SMALLEST timestamps seen so far — a bounded array, never the
    timeline). Exactly ONE alert per key ever fires (the fired flag
    survives micro-batches), and the alert timestamp is the
    threshold-th SMALLEST timestamp among all events seen up to and
    including the firing micro-batch — NOT the arrival-order
    threshold-th. Out-of-order events that land in the same or any
    earlier micro-batch as the crossing are therefore incorporated
    exactly as the batch twin (``threshold_crossings``, which orders
    globally by ts) would: the two agree whenever no event with
    ts below the emitted crossing arrives in a LATER micro-batch
    than the crossing one. (An append-mode one-shot alert cannot
    retract, so events that late shift only the batch twin; with
    in-order or same-batch-late delivery the twins are identical
    under ANY batch split.)

    Returns an unstarted transformed frame with schema
    (user_id long, event_type string, crossed_at double) — one row
    per key, emitted in the micro-batch where the crossing happens.

    Scale: state is O(active keys) × (2 scalars + ``threshold``
    doubles) and the array never exceeds ``threshold`` entries, so
    state never grows with event volume.

    State-schema compatibility: round 9 changed ``stateStructType``
    from ``count long, fired long, crossed_at double`` to
    ``count long, fired long, smallest array<double>`` — checkpoints
    written by the pre-round-9 schema CANNOT be resumed (Spark will
    fail or mis-deserialize the state row). Discard old checkpoints
    when upgrading; there is no in-place state migration.

    For exact alert timestamps under ANY bounded lateness — not just
    same-or-earlier-batch late events — use
    ``streaming_threshold_alerts_watermarked``, which delays firing
    until the event-time watermark passes the candidate crossing.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        user_id, event_type = key
        if state.exists:
            count, fired, smallest = state.get
            smallest = list(smallest or [])
        else:
            count, fired, smallest = 0, 0, []
        newly_fired = False
        crossed_at = 0.0
        for pdf in pdfs:
            if not len(pdf):
                continue
            count += len(pdf)
            if fired:
                continue
            s = pdf[ts_col]
            if pd.api.types.is_datetime64_any_dtype(s):
                epochs = s.astype("int64").to_numpy() / 1e9
            else:
                epochs = s.to_numpy(dtype="float64")
            # merge into the bounded smallest-k buffer: the k smallest
            # of (state ∪ batch) — order of arrival is irrelevant, so
            # the same events always produce the same buffer
            smallest = sorted(smallest + [float(e) for e in epochs])[:threshold]
        if not fired and count >= threshold and len(smallest) >= threshold:
            crossed_at = smallest[threshold - 1]
            fired = 1
            newly_fired = True
        state.update((count, fired, smallest))
        if newly_fired:
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "event_type": [event_type],
                    "crossed_at": [crossed_at],
                }
            )
        else:
            yield pd.DataFrame(
                {"user_id": [], "event_type": [], "crossed_at": []}
            ).astype({"user_id": "int64", "event_type": "object", "crossed_at": "float64"})

    return events.groupBy(user_col, type_col).applyInPandasWithState(
        update,
        outputStructType="user_id long, event_type string, crossed_at double",
        stateStructType="count long, fired long, smallest array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_threshold_alerts_watermarked(
    events: DataFrame,
    threshold: int = 5,
    delay: str = "10 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
):
    """Watermark-delayed variant of ``streaming_threshold_alerts``
    (VERDICT r9 #6): instead of firing in the micro-batch where the
    count crosses ``threshold``, the candidate crossing (the
    threshold-th SMALLEST event time seen so far) is held in state and
    the alert fires only once the EVENT-TIME WATERMARK passes it — via
    ``EventTimeTimeout``, so the firing needs no further events for
    the key. Any late event with ts at or below the candidate that
    arrives within the watermark ``delay`` lands BEFORE the firing and
    re-lowers the candidate, so the emitted timestamp equals the batch
    twin (``threshold_crossings``) under ANY lateness bounded by
    ``delay`` and ANY micro-batch split — closing the one documented
    divergence of the immediate-firing variant (events below the
    crossing arriving in a later batch). The trade is latency: alerts
    arrive one watermark delay after the crossing.

    State per key: same bounded (count, fired, smallest[threshold])
    as the immediate variant, plus Spark's per-key timeout timestamp.
    The input gets ``withWatermark(ts_col, delay)`` applied here.

    Returns an unstarted transformed frame with schema
    (user_id long, event_type string, crossed_at double).
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        user_id, event_type = key
        if state.exists:
            count, fired, smallest = state.get
            smallest = list(smallest or [])
        else:
            count, fired, smallest = 0, 0, []
        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                count += len(pdf)
                if fired:
                    continue
                s = pdf[ts_col]
                if pd.api.types.is_datetime64_any_dtype(s):
                    epochs = s.astype("int64").to_numpy() / 1e9
                else:
                    epochs = s.to_numpy(dtype="float64")
                smallest = sorted(smallest + [float(e) for e in epochs])[
                    :threshold
                ]
        emit = None
        pending = (
            not fired and count >= threshold and len(smallest) >= threshold
        )
        if pending:
            candidate = smallest[threshold - 1]
            # CEIL the ms conversion: flooring would let the alert fire
            # while an event between watermark and the sub-ms candidate
            # fraction could still legally arrive and lower the crossing
            cand_ms = math.ceil(candidate * 1000)
            if state.getCurrentWatermarkMs() >= cand_ms:
                fired = 1
                emit = candidate
                pending = False
        state.update((count, fired, smallest))
        if pending:
            # wake this key when the watermark passes the candidate,
            # even if no further events arrive for it
            state.setTimeoutTimestamp(math.ceil(smallest[threshold - 1] * 1000))
        if emit is not None:
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "event_type": [event_type],
                    "crossed_at": [emit],
                }
            )
        else:
            yield pd.DataFrame(
                {"user_id": [], "event_type": [], "crossed_at": []}
            ).astype(
                {
                    "user_id": "int64",
                    "event_type": "object",
                    "crossed_at": "float64",
                }
            )

    return (
        events.withWatermark(ts_col, delay)
        .groupBy(user_col, type_col)
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, event_type string, crossed_at double",
            stateStructType="count long, fired long, smallest array<double>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def threshold_crossings(
    events: DataFrame,
    threshold: int = 5,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """BATCH twin of ``streaming_threshold_alerts``: for every
    (user, event_type) with at least ``threshold`` events, the epoch
    seconds of the threshold-th event in timestamp order (event-id
    tiebreak for determinism at equal timestamps). Oracle-checkable —
    a green batch verdict certifies the same crossing semantics the
    stateful stream applies per micro-batch."""
    w = Window.partitionBy(user_col, type_col).orderBy(
        F.col(ts_col).asc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == int(threshold))
        .select(
            user_col,
            type_col,
            F.col(ts_col).cast("long").cast("double").alias("crossed_at"),
        )
    )


def streaming_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    dim_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join the unbounded stream
    against a bounded dimension table (user profile, catalog, config)
    — the lookup stage every event pipeline runs before aggregation.

    The static side is explicitly BROADCAST: stream-static joins
    re-plan the static side per micro-batch, and broadcasting it keeps
    every batch map-side — the stream never shuffles for the lookup
    and no state store is involved (unlike stream-stream joins, this
    is stateless and needs no watermark).

    Works identically on a batch frame (the oracle twin): the plan is
    the same broadcast join either way."""
    cols = dim_cols or [c for c in dim.columns if c != on]
    d = dim.select(on, *cols)
    return stream.join(F.broadcast(d), on, how)


def streaming_ohlc(
    events: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming OHLC bars: the stream twin of
    ``operators.resample_ohlc`` — tumbling event-time windows with a
    watermark, open/close by min_by/max_by over the unique
    epoch-nanos order key (tie-free; ids and timestamps must be
    non-negative — the zero-padded key is sign-blind), high/low/sum
    over 4-dp decimals. State is one partial bar per open
    (key, window); the watermark closes and evicts bars, so state
    stays bounded on an unbounded stream.

    Works identically on a batch frame (drop the watermark no-op) —
    the oracle-checked batch path and the streaming path share every
    aggregate expression."""
    okey = F.concat(
        F.lpad(F.col(ts_col).cast("long").cast("string"), 12, "0"),
        F.lpad(F.col(id_col).cast("string"), 20, "0"),
    )
    v4 = F.round(F.col(value_col), 4).cast("decimal(19,4)")
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.select(
            F.col(key).alias("k"),
            F.col(ts_col),
            okey.alias("__o"),
            v4.alias("__v"),
        )
        .groupBy(F.window(ts_col, window_duration).alias("win"), "k")
        .agg(
            F.min_by("__v", "__o").cast("double").alias("open"),
            F.max("__v").cast("double").alias("high"),
            F.min("__v").cast("double").alias("low"),
            F.max_by("__v", "__o").cast("double").alias("close"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("__v").cast("decimal(28,4)")).cast("double").alias("total"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("k").alias(key),
            "open", "high", "low", "close", "n_rows", "total",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-session aggregates via Spark's NATIVE session_window (gap-
    close semantics identical to the ``sessionize`` operator, but
    expressed as a windowed aggregation Catalyst understands) — the
    form that runs unchanged as a watermarked streaming query, with
    merging session state handled by the engine instead of
    applyInPandasWithState.

    Output: (key, session_start, session_end, n_events) — start/end
    are the min event time and max event time + gap of the merged
    session.

    Scale: one shuffle on the key; streaming state is one row per
    OPEN session, evicted at the watermark."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
