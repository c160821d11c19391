"""Skew tooling + stateful streaming operator tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from graph_etl_spark.operators.skew import key_skew_report, salted_count, salted_join


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(1, f"l{i}") for i in range(50)] + [(2, "x"), (3, "y")], ["k", "lv"]
    )
    right = spark.createDataFrame([(1, "A"), (2, "B"), (4, "D")], ["k", "rv"])
    plain = {(r["k"], r["lv"], r["rv"]) for r in left.join(right, "k").collect()}
    salted = {(r["k"], r["lv"], r["rv"]) for r in salted_join(left, right, "k").collect()}
    assert salted == plain and len(plain) == 51


def test_salted_count_matches_plain(spark):
    df = spark.createDataFrame([(i % 3,) for i in range(99)], ["k"])
    plain = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r["k"]: r["cnt"] for r in salted_count(df, "k").collect()}
    assert salted == plain


def test_key_skew_report(spark):
    df = spark.createDataFrame([(1,)] * 90 + [(2,)] * 10, ["k"])
    rows = key_skew_report(df, "k", top=2).collect()
    assert rows[0]["k"] == 1 and abs(rows[0]["share"] - 0.9) < 1e-6


def test_streaming_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState across TWO micro-batches: state (session
    counter, last ts) must persist between batches."""
    import pandas as pd

    from graph_etl_spark.streaming import streaming_sessionize

    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    base = pd.Timestamp("2024-01-01 00:00:00")

    def write_batch(rows, name):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        spark.createDataFrame(pdf).write.mode("append").parquet(src)

    # batch 1: user 1 two close events (1 session)
    write_batch([(1, base), (1, base + pd.Timedelta(minutes=5))], "b1")

    results: list = []

    def run_once():
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
        q = (
            streaming_sessionize(stream, gap_minutes=30)
            .writeStream.foreachBatch(
                lambda bdf, bid: results.extend(r.asDict() for r in bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)  # same ckpt: resumes state
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert results and results[-1]["session_id"] == 1  # one session so far

    # batch 2: a far-future event → must open session 2 (state carried)
    write_batch([(1, base + pd.Timedelta(hours=5))], "b2")
    results.clear()
    run_once()
    assert results, "no output from resumed stateful query"
    final = {r["user_id"]: (r["session_id"], r["n_events"]) for r in results}
    assert final[1] == (2, 3)  # second session opened, 3 events total


def test_streaming_interval_join_stream_and_batch_agree(spark, tmp_path):
    """Stream-stream interval join: the watermarked streaming run over
    file sources must produce exactly the rows the batch form of the
    SAME function produces on the same data — and both must equal the
    hand-built equi+interval join."""
    import pandas as pd

    from graph_etl_spark.streaming import streaming_interval_join

    base = pd.Timestamp("2024-01-01 00:00:00")

    def at(m):
        return (base + pd.Timedelta(minutes=m)).to_pydatetime()

    clicks = [(1, at(m), f"c{m}") for m in (5, 20, 40)] + [(2, at(10), "c2a")]
    errors = [(1, at(m), f"e{m}") for m in (0, 16, 39)] + [(2, at(50), "e2z")]

    csrc, esrc = str(tmp_path / "clicks"), str(tmp_path / "errors")
    spark.createDataFrame(clicks, "user_id long, ts timestamp, click_id string").write.parquet(csrc)
    spark.createDataFrame(errors, "user_id long, ts timestamp, error_id string").write.parquet(esrc)

    # batch form
    cb = spark.read.parquet(csrc)
    eb = spark.read.parquet(esrc)
    batch = {
        (r["user_id"], r["click_id"], r["error_id"])
        for r in streaming_interval_join(cb, eb, on="user_id", within="10 minutes").collect()
    }
    # expectation: error within [click_ts - 10min, click_ts], same user
    expected = {
        (uk, cid, eid)
        for (uk, cts, cid) in clicks
        for (ek, ets, eid) in errors
        if uk == ek
        and cts - pd.Timedelta(minutes=10).to_pytimedelta() <= ets <= cts
    }
    assert batch == expected and expected  # non-vacuous

    # streaming form: two file streams, availableNow, append sink
    cs = spark.readStream.schema("user_id long, ts timestamp, click_id string").parquet(csrc)
    es = spark.readStream.schema("user_id long, ts timestamp, error_id string").parquet(esrc)
    rows: list = []
    q = (
        streaming_interval_join(cs, es, on="user_id", within="10 minutes")
        .writeStream.foreachBatch(
            lambda bdf, bid: rows.extend(r.asDict() for r in bdf.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {(r["user_id"], r["click_id"], r["error_id"]) for r in rows}
    assert streamed == expected


def test_stream_replay_ledger_idempotence(spark, output_dir, tmp_path):
    """The reference's P8 run-ledger contract under micro-batch replay
    (VERDICT r4 item 7): foreachBatch is at-least-once — on failure
    recovery Spark re-delivers the SAME batch id — and the sink's
    ``log_stream.txt`` ledger must make the second delivery a no-op so
    staged files and catalog counts never double."""
    import graph_etl_spark as getl
    from graph_etl_spark.streaming import stream_batch_sink, stream_save_nodes

    getl.init(spark, output_folder=output_dir)
    src = str(tmp_path / "replay_src")
    spark.range(25).selectExpr("id", "concat('u', id) as name").write.parquet(src)
    stream = spark.readStream.schema("id long, name string").parquet(src)

    q = stream_save_nodes(stream, label="ReplayUser", checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(60)

    store = getl.get_store()
    files = store._configs["nodes"]["ReplayUser"]["files"]
    n_files, n_rows = len(files), sum(f["count"] for f in files.values())
    assert n_rows == 25
    assert store.ledger_contains("log_stream.txt", "ReplayUser:0")

    # simulate the at-least-once failure path: the engine re-delivers
    # batch 0 to the sink (exactly what foreachBatch does after a
    # mid-commit crash) — the ledger entry must short-circuit it
    sink = stream_batch_sink(store, "ReplayUser")
    sink(spark.read.parquet(src), 0)

    files2 = store._configs["nodes"]["ReplayUser"]["files"]
    assert len(files2) == n_files, "re-delivered batch staged new files"
    assert sum(f["count"] for f in files2.values()) == n_rows, (
        "re-delivered batch double-counted rows"
    )

    # a genuinely NEW batch id must still stage (the ledger guards
    # replays, not progress)
    sink(spark.range(25, 30).selectExpr("id", "concat('u', id) as name"), 1)
    files3 = store._configs["nodes"]["ReplayUser"]["files"]
    assert sum(f["count"] for f in files3.values()) == 30


def test_stream_replay_mid_commit_crash(spark, output_dir, tmp_path):
    """ADVICE r6 (medium): a crash AFTER the staged write but BEFORE
    the ledger append means the re-delivered batch finds no ledger
    entry and stages again. The staged file name is derived from
    (label, batch_id), so the replay must OVERWRITE its own earlier
    staging — same file count, same row count, no double-count."""
    import graph_etl_spark as getl
    from graph_etl_spark.streaming import stream_batch_sink

    getl.init(spark, output_folder=output_dir)
    store = getl.get_store()
    src = spark.range(20).selectExpr("id", "concat('u', id) as name")

    sink = stream_batch_sink(store, "CrashUser")
    sink(src, 0)
    files = store._configs["nodes"]["CrashUser"]["files"]
    assert len(files) == 1 and store._stats["nodes"] == 20

    # simulate the mid-commit crash window: wipe the ledger entry (as
    # if the process died between flush_configs and ledger_append),
    # then let the engine re-deliver batch 0
    import os

    os.remove(store._ledger_path("log_stream.txt"))
    sink(src, 0)

    files2 = store._configs["nodes"]["CrashUser"]["files"]
    assert len(files2) == 1, "replayed batch staged a second copy"
    assert sum(f["count"] for f in files2.values()) == 20
    assert store._stats["nodes"] == 20, "replayed batch double-counted stats"


def test_ledger_delete_all_spares_live_stream_ledger(spark, output_dir, tmp_path):
    """ADVICE r6 (low): ledger_delete_all must NOT clear the stream
    ledger while a streaming query is active — it guards a live query's
    micro-batch replay, unlike the batch ledgers which guard completed
    steps. With no active query it clears like the rest."""
    import graph_etl_spark as getl

    getl.init(spark, output_folder=output_dir)
    store = getl.get_store()
    store.ledger_append("log_stream.txt", "X:0")
    store.ledger_append("log_parser.txt", "p1")

    # keep a trivial stream alive across the delete call
    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck_rate"))
        .start()
    )
    try:
        store.ledger_delete_all()
        assert store.ledger_contains("log_stream.txt", "X:0"), (
            "stream ledger cleared under an active query"
        )
        assert not store.ledger_contains("log_parser.txt", "p1")
    finally:
        q.stop()
    # once the stream is down, delete-all clears the stream ledger too
    q.awaitTermination(30)
    store.ledger_delete_all()
    assert not store.ledger_contains("log_stream.txt", "X:0")


def test_streaming_incremental_ingest_grows_index(spark, tmp_path):
    """Cross-batch accumulation: a doc admitted in batch 0 must block
    its re-crawl in batch 1 even though the STATIC index never saw it;
    and a re-delivered batch overwrites its own output (idempotent by
    construction, no ledger)."""
    from graph_etl_spark.streaming import (
        incremental_ingest_sink,
        streaming_incremental_ingest,
    )

    idx_text = " ".join(f"i{j}" for j in range(12))
    novel = " ".join(f"n{j}" for j in range(12))
    index = spark.createDataFrame([(1, idx_text)], "doc_id long, text string")

    src = str(tmp_path / "crawl_src")
    admitted = str(tmp_path / "admitted")
    ck = str(tmp_path / "ck")

    # batch 0: one novel doc + one exact index re-crawl
    spark.createDataFrame(
        [(10, novel), (11, idx_text)], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    q = streaming_incremental_ingest(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        index, admitted, ck,
    )
    q.awaitTermination(60)
    got = {r["doc_id"] for r in spark.read.parquet(admitted).collect()}
    assert got == {10}  # novel admitted, re-crawl blocked by static index

    # batch 1: a re-crawl of the doc admitted in batch 0 (new id, same
    # text) — only the GROWN index can block it
    spark.createDataFrame(
        [(20, novel)], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    q2 = streaming_incremental_ingest(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        index, admitted, ck,
    )
    q2.awaitTermination(60)
    got2 = {r["doc_id"] for r in spark.read.parquet(admitted).collect()}
    assert got2 == {10}, f"re-crawl of an admitted doc leaked through: {got2}"

    # replay batch 0 directly (the at-least-once path): output must be
    # unchanged — same verdicts, overwritten in place
    sink = incremental_ingest_sink(index, admitted)
    sink(spark.createDataFrame([(10, novel), (11, idx_text)],
                               "doc_id long, text string"), 0)
    got3 = {r["doc_id"] for r in spark.read.parquet(admitted).collect()}
    assert got3 == {10}


def test_streaming_threshold_alerts_one_shot_across_batches(spark, tmp_path):
    """The alert must fire EXACTLY ONCE per key, in the micro-batch
    where the running count crosses the threshold, with the
    threshold-th event's timestamp — and agree with the batch twin."""
    import pandas as pd

    from graph_etl_spark.streaming import (
        streaming_threshold_alerts,
        threshold_crossings,
    )

    src = str(tmp_path / "alert_src")
    ckpt = str(tmp_path / "alert_ckpt")
    base = pd.Timestamp("2024-01-01 00:00:00")

    def write_batch(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
        spark.createDataFrame(pdf).write.mode("append").parquet(src)

    results: list = []

    def run_once():
        stream = spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts timestamp"
        ).parquet(src)
        q = (
            streaming_threshold_alerts(stream, threshold=3)
            .writeStream.foreachBatch(
                lambda bdf, bid: results.extend(r.asDict() for r in bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: user 1 has 2 clicks (below threshold 3) -> no alert
    write_batch([
        (1, 1, "click", base),
        (2, 1, "click", base + pd.Timedelta(minutes=1)),
        (3, 2, "click", base),
    ])
    run_once()
    assert results == []

    # batch 2: user 1's third click crosses -> ONE alert with its ts
    write_batch([
        (4, 1, "click", base + pd.Timedelta(minutes=2)),
        (5, 1, "click", base + pd.Timedelta(minutes=3)),
    ])
    results.clear()
    run_once()
    assert len(results) == 1
    alert = results[0]
    assert alert["user_id"] == 1 and alert["event_type"] == "click"
    assert alert["crossed_at"] == (base + pd.Timedelta(minutes=2)).timestamp()

    # batch 3: more clicks must NOT re-fire (one-shot flag in state)
    write_batch([(6, 1, "click", base + pd.Timedelta(minutes=9))])
    results.clear()
    run_once()
    assert results == []

    # batch twin agrees on the crossing timestamp
    batch = spark.read.parquet(src)
    twin = {
        (r["user_id"], r["event_type"]): r["crossed_at"]
        for r in threshold_crossings(batch, threshold=3).collect()
    }
    assert twin[(1, "click")] == float(int(alert["crossed_at"]))


def test_streaming_enrich_stream_and_batch_agree(spark, tmp_path):
    """Stream-static enrichment: the streaming run over a file source
    must produce exactly the rows the batch form produces, and the
    static side must broadcast (stateless — no watermark, no state
    store)."""
    from graph_etl_spark.streaming import streaming_enrich

    src = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (9, 1.0)], "uid long, v double"
    ).write.parquet(src)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "basic")], "uid long, tier string"
    )

    batch = {
        (r["uid"], r["tier"])
        for r in streaming_enrich(spark.read.parquet(src), dim, "uid").collect()
    }
    assert batch == {(1, "gold"), (2, "basic"), (9, None)}

    stream = spark.readStream.schema("uid long, v double").parquet(src)
    rows: list = []
    q = (
        streaming_enrich(stream, dim, "uid")
        .writeStream.foreachBatch(
            lambda bdf, bid: rows.extend(r.asDict() for r in bdf.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {(r["uid"], r["tier"]) for r in rows} == batch


def test_streaming_ohlc_stream_and_batch_agree(spark, tmp_path):
    """Streaming OHLC: the watermarked streaming run over a file
    source must produce the same bars the batch form produces on the
    same data (shared aggregate expressions)."""
    import pandas as pd

    from graph_etl_spark.streaming import streaming_ohlc

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (1, (base + pd.Timedelta(minutes=m)).to_pydatetime(), "click", float(v))
        for m, v in [(0, 10.0), (10, 30.0), (50, 20.0), (70, 5.0)]
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).write.parquet(src)

    batch = {
        (r["window_start"], r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_rows"], r["total"]
        )
        for r in streaming_ohlc(spark.read.parquet(src)).collect()
    }
    first_hour = min(k[0] for k in batch)
    assert batch[(first_hour, "click")] == (10.0, 30.0, 10.0, 20.0, 3, 60.0)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(src)
    rows_out: list = []
    q = (
        streaming_ohlc(stream, watermark="0 seconds")
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda bdf, bid: rows_out.extend(r.asDict() for r in bdf.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_rows"], r["total"]
        )
        for r in rows_out
    }
    # append mode emits a bar only once the watermark passes its
    # window end — the final (still-open) window is withheld by
    # DESIGN in a bounded run; every emitted bar must match the batch
    # bar exactly, and the closed first hour must have emitted
    assert streamed, "no closed windows emitted"
    assert (first_hour, "click") in streamed
    for k, v in streamed.items():
        assert batch[k] == v
    assert set(streamed) == {k for k in batch if k[0] != max(b[0] for b in batch)}


def test_session_window_stats_streaming_closed_sessions(spark, tmp_path):
    """Native session_window as a watermarked streaming query: closed
    sessions must match the batch form exactly; the still-open final
    session is withheld by append semantics in a bounded run."""
    import pandas as pd

    from graph_etl_spark.streaming import session_window_stats

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [(1, (base + pd.Timedelta(minutes=m)).to_pydatetime())
            for m in (0, 10, 120, 125)] + [
        (2, (base + pd.Timedelta(minutes=5)).to_pydatetime())
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(src)

    batch = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in session_window_stats(
            spark.read.parquet(src), gap="30 minutes"
        ).collect()
    }
    assert len(batch) == 3   # user1 splits at the 110-min gap; user2 one

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    rows_out: list = []
    q = (
        session_window_stats(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda bdf, bid: rows_out.extend(r.asDict() for r in bdf.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in rows_out
    }
    assert streamed, "no closed sessions emitted"
    for k, v in streamed.items():
        assert batch[k] == v


def test_streaming_cdc_ingest_chunk_index_grows(spark, tmp_path):
    """Chunk-granularity streaming dedup: per-batch chunking equals
    the batch operator bit-for-bit; a batch-1 doc sharing chunks with
    a batch-0 doc flags shared_with_index even though no byte-level
    re-crawl occurred; a re-delivered batch overwrites itself."""
    from graph_etl_spark.operators.dedup import cdc_chunk_hashes
    from graph_etl_spark.streaming import cdc_ingest_sink, streaming_cdc_ingest

    t0 = " ".join(f"w{j % 7}" for j in range(40))
    t1 = " ".join(f"x{j}" for j in range(40))
    src = str(tmp_path / "cdc_src")
    chunks_dir = str(tmp_path / "cdc_chunks")
    ck = str(tmp_path / "cdc_ck")

    spark.createDataFrame(
        [(1, t0), (2, t1)], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    q = streaming_cdc_ingest(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        chunks_dir, ck,
    )
    q.awaitTermination(60)
    got0 = spark.read.parquet(chunks_dir)
    # batch chunking == stream chunking, bit for bit
    batch = cdc_chunk_hashes(
        spark.createDataFrame([(1, t0), (2, t1)], "doc_id long, text string"),
        min_tokens=4, max_tokens=24,
    )
    assert sorted(
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_hash"])
        for r in got0.collect()
    ) == sorted(map(tuple, batch.collect()))
    assert not any(r["shared_with_index"] for r in got0.collect())

    # batch 1: doc 3 repeats doc 1's text (different id) — every one
    # of its chunks must flag against the GROWN chunk index
    spark.createDataFrame(
        [(3, t0)], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    q2 = streaming_cdc_ingest(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        chunks_dir, ck,
    )
    q2.awaitTermination(60)
    got1 = spark.read.parquet(chunks_dir).collect()  # materialize NOW:
    # the replay below overwrites batch_id=0's files in place
    d3 = [r for r in got1 if r["doc_id"] == 3]
    assert d3 and all(r["shared_with_index"] for r in d3)

    # replay batch 0 (at-least-once): verdicts unchanged, overwritten
    sink = cdc_ingest_sink(chunks_dir)
    sink(spark.createDataFrame([(1, t0), (2, t1)],
                               "doc_id long, text string"), 0)
    got2 = spark.read.parquet(chunks_dir).collect()
    assert not any(
        r["shared_with_index"] for r in got2 if r["doc_id"] in (1, 2)
    )
    assert sorted(map(tuple, got2)) == sorted(map(tuple, got1))


def test_cdc_index_compaction_twin_and_bounded_read(spark, tmp_path):
    """VERDICT r13 Next #5: the compacted first-seen index is a DROP-IN
    twin of the raw-tree read — flags identical with compaction on,
    after pruning the folded raw dirs (proving the sink no longer
    needs them), for a fresh batch AND for a replayed old batch."""
    from graph_etl_spark.streaming import (
        _latest_cdc_index,
        cdc_ingest_sink,
        compact_cdc_index,
        prune_cdc_raw,
    )

    tA = " ".join(f"a{j % 9}" for j in range(40))
    tB = " ".join(f"b{j}" for j in range(40))
    tC = " ".join(f"c{j % 5}" for j in range(40))
    tD = " ".join(f"d{j}" for j in range(40))
    tE = " ".join(f"e{j % 7}" for j in range(40))
    batches = [
        [(1, tA), (2, tB)],
        [(3, tA), (4, tC)],  # doc 3 shares every chunk with batch 0
        [(5, tB), (6, tD)],
        [(7, tC), (8, tE)],
        [(9, tD), (10, tA)],
    ]
    plain_dir = str(tmp_path / "plain")
    comp_dir = str(tmp_path / "comp")
    sink_plain = cdc_ingest_sink(plain_dir)
    sink_comp = cdc_ingest_sink(comp_dir, compact_every=2)

    def run(sink, rows, bid):
        sink(spark.createDataFrame(rows, "doc_id long, text string"), bid)

    for bid, rows in enumerate(batches):
        run(sink_plain, rows, bid)
        run(sink_comp, rows, bid)

    cols = ["doc_id", "chunk_idx", "chunk_hash", "shared_with_index", "batch_id"]

    def flags(d, bid=None):
        df = spark.read.parquet(d).select(*cols)
        if bid is not None:
            df = df.filter(F.col("batch_id") == bid)
        return sorted(map(tuple, df.collect()))

    # twin: identical flags with compaction folding every 2 batches
    assert flags(plain_dir) == flags(comp_dir)

    # compaction ran after batches 1 and 3 -> newest high water is 3,
    # and the index is EXACTLY the first-seen hashes of batches 0..3
    idx, hw, _v = _latest_cdc_index(spark, comp_dir + "_index")
    assert hw == 3 and idx is not None
    expect_first = {
        (r["chunk_hash"], r["batch_id"])
        for r in spark.read.parquet(plain_dir)
        .filter((F.col("batch_id") <= 3) & ~F.col("shared_with_index"))
        .collect()
    }
    # min(first_batch_id) per hash over the raw first occurrences
    first_by_hash = {}
    for h, b in expect_first:
        first_by_hash[h] = min(first_by_hash.get(h, b), b)
    assert {
        (r["chunk_hash"], r["first_batch_id"]) for r in idx.collect()
    } == set(first_by_hash.items())

    # re-fold with an already-covered high water: no write (idempotent)
    assert compact_cdc_index(spark, comp_dir, up_to_batch=3)["wrote"] is False

    # an INCOMPLETE version dir (no meta — crashed compaction) is ignored
    import os

    bogus = os.path.join(comp_dir + "_index", "version=99")
    os.makedirs(bogus, exist_ok=True)
    assert _latest_cdc_index(spark, comp_dir + "_index")[1] == 3

    # prune the folded raw dirs; the sink must not miss them
    assert prune_cdc_raw(comp_dir) == [0, 1, 2, 3]
    new5 = [(11, tA), (12, " ".join(f"f{j}" for j in range(40)))]
    run(sink_plain, new5, 5)
    run(sink_comp, new5, 5)  # doc 11 must flag via the COMPACT index
    assert flags(plain_dir, 5) == flags(comp_dir, 5)
    assert all(
        r["shared_with_index"]
        for r in spark.read.parquet(comp_dir)
        .filter(F.col("doc_id") == 11)
        .collect()
    )

    # replay an already-pruned batch (at-least-once): identical flags
    run(sink_comp, batches[2], 2)
    assert flags(plain_dir, 2) == flags(comp_dir, 2)


def test_cdc_compaction_edges(spark, tmp_path):
    """Version retention (keep_versions), prune-without-index no-op,
    and fold-after-prune: the compactor only ever needs the raw tail
    above its own high water, so pruning folded dirs cannot break the
    NEXT fold."""
    import os

    from graph_etl_spark.streaming import (
        _latest_cdc_index,
        cdc_ingest_sink,
        compact_cdc_index,
        prune_cdc_raw,
    )

    chunk_dir = str(tmp_path / "chunks")
    # prune with no index at all: no-op, nothing deleted
    assert prune_cdc_raw(chunk_dir) == []

    sink = cdc_ingest_sink(chunk_dir)
    texts = [" ".join(f"t{b}_{j}" for j in range(30)) for b in range(6)]
    for b in range(4):
        sink(
            spark.createDataFrame([(b, texts[b])], "doc_id long, text string"),
            b,
        )
    r1 = compact_cdc_index(spark, chunk_dir, up_to_batch=1, keep_versions=1)
    assert r1["wrote"] and r1["high_water"] == 1
    assert prune_cdc_raw(chunk_dir) == [0, 1]
    # fold the remaining tail AFTER the early dirs are gone
    r2 = compact_cdc_index(spark, chunk_dir, keep_versions=1)
    assert r2["wrote"] and r2["high_water"] == 3
    # keep_versions=1: only the newest version directory remains
    idx_dir = chunk_dir + "_index"
    versions = [n for n in os.listdir(idx_dir) if n.startswith("version=")]
    assert versions == [f"version={r2['version']}"]
    idx, hw, _ = _latest_cdc_index(spark, idx_dir)
    assert hw == 3
    # all four batches' first-seen hashes present exactly once
    rows = idx.collect()
    assert sorted({r["first_batch_id"] for r in rows}) == [0, 1, 2, 3]
    assert len({r["chunk_hash"] for r in rows}) == len(rows)
    # batch 4 against the lone compact version + empty tail still flags
    sink2 = cdc_ingest_sink(chunk_dir)
    prune_cdc_raw(chunk_dir)
    sink2(
        spark.createDataFrame([(9, texts[0])], "doc_id long, text string"), 4
    )
    got = (
        spark.read.parquet(chunk_dir)
        .filter("doc_id = 9")
        .collect()
    )
    assert got and all(r["shared_with_index"] for r in got)
