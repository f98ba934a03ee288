"""Structured Streaming: batch/stream parity for windows, watermarking,
stateful ops. Streams replay the events parquet (availableNow trigger)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from deepcell_data_engineering_spark.catalog import load_table
from deepcell_data_engineering_spark.sources.codecs import decode_y, encode_y
from deepcell_data_engineering_spark.streaming.stateful import (
    stateful_frame_relabel,
    stateful_user_stats,
)
from deepcell_data_engineering_spark.streaming.windows import (
    dedup_events,
    read_events_stream,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

from conftest import SF_SMOKE


def _run_stream(df, tmp_path, name, mode="complete"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_batch_stream_parity(spark, tmp_path):
    batch = load_table(spark, SF_SMOKE, "events")
    expected = {
        (r["w_start"], r["event_type"]): (r["cnt"], r["sv"])
        for r in tumbling_counts(batch, "1 hour").collect()
    }
    stream = read_events_stream(spark, SF_SMOKE)
    _run_stream(tumbling_counts(stream, "1 hour"), tmp_path, "tumbling")
    got = {
        (r["w_start"], r["event_type"]): (r["cnt"], r["sv"])
        for r in spark.sql("SELECT * FROM tumbling").collect()
    }
    assert got == expected and len(got) > 0


def test_sliding_and_session_windows_batch(spark):
    batch = load_table(spark, SF_SMOKE, "events")
    slid = sliding_counts(batch, "2 hours", "1 hour").collect()
    # every event lands in exactly 2 sliding windows
    assert sum(r["cnt"] for r in slid) == 2 * batch.count()
    sess = session_counts(batch, gap="30 minutes").collect()
    assert sum(r["cnt"] for r in sess) == batch.count()
    # sessions are per-user, disjoint, each at least 1 event
    assert all(r["cnt"] >= 1 for r in sess)


def test_watermarked_stream_agg(spark, tmp_path):
    stream = read_events_stream(spark, SF_SMOKE)
    agg = tumbling_counts(stream, "1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows closed by the watermark; with a single
    # batch the final windows stay open -> emitted rows form a subset of batch
    batch = load_table(spark, SF_SMOKE, "events")
    expected = {
        (r["w_start"], r["event_type"]): (r["cnt"], r["sv"])
        for r in tumbling_counts(batch, "1 hour").collect()
    }
    got = spark.sql("SELECT * FROM wm").collect()
    for r in got:
        assert expected[(r["w_start"], r["event_type"])] == (r["cnt"], r["sv"])


def test_stream_dedup(spark, tmp_path):
    stream = read_events_stream(spark, SF_SMOKE)
    doubled = stream.union(stream)  # every event twice
    q = (
        dedup_events(doubled, ["event_id"], watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) AS n FROM dedup").collect()[0]["n"]
    assert n == load_table(spark, SF_SMOKE, "events").count()


def test_stateful_user_stats(spark, tmp_path):
    stream = read_events_stream(spark, SF_SMOKE)
    q = (
        stateful_user_stats(stream)
        .writeStream.format("memory")
        .queryName("ustats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ustats"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in spark.sql("SELECT * FROM ustats").collect()}
    batch = load_table(spark, SF_SMOKE, "events")
    expected = {
        r["user_id"]: (r["n"], r["tv"])
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .collect()
    }
    assert got == expected


def test_stateful_frame_relabel_stream(spark, tmp_path):
    # build a 4-frame drifting-cell stack, stream it from parquet
    ys = np.zeros((4, 30, 30), dtype=np.int32)
    for s in range(4):
        ys[s, s : s + 10, s : s + 10] = 42  # same cell drifting
    rows = [
        {"fov": "fov1", "stack": s, "height": 30, "width": 30, "y": encode_y(ys[s])}
        for s in range(4)
    ]
    src = str(tmp_path / "frames_src")
    spark.createDataFrame(
        rows, "fov STRING, stack INT, height INT, width INT, y BINARY"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "fov STRING, stack INT, height INT, width INT, y BINARY"
    ).parquet(src)
    q = (
        stateful_frame_relabel(stream)
        .writeStream.format("memory")
        .queryName("frames")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "frames_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM frames ORDER BY stack").collect()
    assert len(out) == 4
    for r in out:
        m = decode_y(r["y"], 30, 30)
        assert set(np.unique(m[ys[r["stack"]] == 42])) == {1}  # id propagated


def test_interval_join_batch_stream_parity(spark, tmp_path):
    """Stream-stream interval join (click->purchase attribution within
    1 hour) must equal the identical batch-plan join."""
    from deepcell_data_engineering_spark.streaming.windows import interval_join

    batch = load_table(spark, SF_SMOKE, "events")
    types = [r["event_type"] for r in batch.select("event_type").distinct().collect()]
    t_left, t_right = sorted(types)[:2]
    bl = batch.where(F.col("event_type") == t_left)
    br = batch.where(F.col("event_type") == t_right)
    expected = {
        (r["event_id"], r["event_id_r"])
        for r in interval_join(bl, br, max_delay="1 hour")
        .select("event_id", "event_id_r")
        .collect()
    }
    assert len(expected) > 0

    stream = read_events_stream(spark, SF_SMOKE)
    sl = stream.where(F.col("event_type") == t_left)
    sr = stream.where(F.col("event_type") == t_right)
    joined = interval_join(sl, sr, max_delay="1 hour").select("event_id", "event_id_r")
    _run_stream(joined, tmp_path, "ij", mode="append")
    got = {
        (r["event_id"], r["event_id_r"])
        for r in spark.sql("SELECT * FROM ij").collect()
    }
    assert got == expected


def test_stream_static_enrich_parity(spark, tmp_path):
    """Stream-static broadcast enrichment equals the batch join."""
    from deepcell_data_engineering_spark.streaming.windows import (
        stream_static_enrich,
    )

    dim = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch = load_table(spark, SF_SMOKE, "events")
    expected = {
        (r["event_id"], r["c_mktsegment"])
        for r in stream_static_enrich(batch, dim)
        .select("event_id", "c_mktsegment")
        .collect()
    }
    assert len(expected) > 0

    stream = read_events_stream(spark, SF_SMOKE)
    out = stream_static_enrich(stream, dim).select("event_id", "c_mktsegment")
    _run_stream(out, tmp_path, "enrich", mode="append")
    got = {
        (r["event_id"], r["c_mktsegment"])
        for r in spark.sql("SELECT * FROM enrich").collect()
    }
    assert got == expected


def test_idempotent_sink_replay_safe(spark, tmp_path):
    """Replaying an epoch (the at-least-once crash case) must not
    duplicate rows; distinct epochs must coexist."""
    from deepcell_data_engineering_spark.streaming.sinks import (
        start_idempotent_parquet_sink,
        write_epoch_idempotent,
    )

    out = str(tmp_path / "sink")
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    b0 = ev.where(F.col("event_id") % 2 == 0)
    b1 = ev.where(F.col("event_id") % 2 == 1)
    write_epoch_idempotent(b0, 0, out)
    write_epoch_idempotent(b1, 1, out)
    write_epoch_idempotent(b1, 1, out)  # replay of epoch 1
    got = spark.read.parquet(out)
    assert got.count() == ev.count()  # no dupes from the replay
    assert got.select("_epoch").distinct().count() == 2

    # end-to-end through a real stream with availableNow trigger
    out2 = str(tmp_path / "sink2")
    stream = read_events_stream(spark, SF_SMOKE).select("event_id", "user_id")
    q = start_idempotent_parquet_sink(
        stream, out2, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out2).count() == ev.count()


def test_streaming_incremental_agg_equals_batch(spark, tmp_path):
    """Maintained aggregate (fold of per-epoch delta states) must equal
    the batch recompute over all events — including after an epoch
    replay."""
    from deepcell_data_engineering_spark.streaming.sinks import (
        maintained_agg,
        start_incremental_agg,
        write_epoch_idempotent,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    expected = {
        (r["event_type"], r["n"], r["cents"])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents"))
        .collect()
    }

    out = str(tmp_path / "state")
    stream = read_events_stream(spark, SF_SMOKE)
    q = start_incremental_agg(
        stream,
        out,
        str(tmp_path / "ckpt"),
        ["event_type"],
        [F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents")],
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in maintained_agg(
            spark, out, ["event_type"], ["n", "cents"]
        ).collect()
    }
    assert got == expected

    # replay the last epoch by hand: state must not double-count
    last = spark.read.parquet(out)
    eid = last.agg(F.max("_epoch")).first()[0]
    # a replay writes the same delta again under the same epoch
    same_delta = spark.read.parquet(out).where(F.col("_epoch") == eid).drop("_epoch")
    write_epoch_idempotent(same_delta, eid, out)
    got2 = {
        tuple(r)
        for r in maintained_agg(
            spark, out, ["event_type"], ["n", "cents"]
        ).collect()
    }
    assert got2 == expected


def test_dedup_within_watermark_bounded_state(spark, tmp_path):
    from deepcell_data_engineering_spark.streaming.windows import (
        dedup_within_watermark,
    )

    batch = load_table(spark, SF_SMOKE, "events").withColumn(
        "dup_key", F.col("event_id") % 50
    )
    expected = batch.dropDuplicates(["dup_key"]).count()
    assert expected == 50

    stream = read_events_stream(spark, SF_SMOKE).withColumn(
        "dup_key", F.col("event_id") % 50
    )
    out = dedup_within_watermark(stream, ["dup_key"], watermark="10 days")
    _run_stream(out.select("dup_key"), tmp_path, "wmdedup", mode="append")
    # all testdata events fall inside one watermark interval, so the
    # bounded-state dedup equals the global dedup here
    got = spark.sql("SELECT COUNT(DISTINCT dup_key) c FROM wmdedup").first()["c"]
    n = spark.sql("SELECT COUNT(*) c FROM wmdedup").first()["c"]
    assert got == 50 and n == 50


def test_ts_normalization_batch_and_stream_agree(spark):
    """Both readers must yield TimestampType on every testdata encoding
    (nanos-LONG or TIMESTAMP_NTZ) — regression for the r3 split where the
    batch path was patched for NTZ but the stream path was not."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    from deepcell_data_engineering_spark.catalog import normalize_event_ts

    batch = load_table(spark, SF_SMOKE, "events")
    assert isinstance(batch.schema["ts"].dataType, TimestampType)
    stream = read_events_stream(spark, SF_SMOKE)
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    # withWatermark is the op that throws EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    stream.withWatermark("ts", "1 hour")

    # the helper handles both physical encodings on synthetic frames
    ntz = spark.createDataFrame(
        [], StructType([StructField("ts", TimestampNTZType())])
    )
    assert isinstance(
        normalize_event_ts(ntz).schema["ts"].dataType, TimestampType
    )
    nanos = spark.createDataFrame(
        [], StructType([StructField("ts", LongType())])
    )
    assert isinstance(
        normalize_event_ts(nanos).schema["ts"].dataType, TimestampType
    )


def test_stateful_user_stats_tws_parity(spark, tmp_path):
    """transformWithState (Spark 4 state API) twin of stateful_user_stats
    must produce identical per-user running aggregates. Skips where the
    protobuf runtime (required by the TWS state server) is absent; the
    gate itself is asserted either way."""
    from deepcell_data_engineering_spark.streaming.stateful import (
        stateful_user_stats_tws,
        tws_available,
    )

    if not tws_available():
        with pytest.raises(NotImplementedError, match="protobuf"):
            stateful_user_stats_tws(
                read_events_stream(spark, SF_SMOKE).select("user_id", "value")
            )
        pytest.skip("google.protobuf runtime absent: TWS state server cannot start")

    batch = load_table(spark, SF_SMOKE, "events")
    expected = {
        (r["user_id"]): (r["n_events"], r["total_value"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    stream = read_events_stream(spark, SF_SMOKE).select("user_id", "value")
    _run_stream(
        stateful_user_stats_tws(stream), tmp_path, "tws_stats", mode="update"
    )
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            "SELECT user_id, n_events, total_value FROM tws_stats"
        ).collect()
    }
    assert got == expected and len(got) > 0

    # direct twin-vs-twin parity: the applyInPandasWithState production
    # path and the TWS path must agree row-for-row on the same fixture
    from deepcell_data_engineering_spark.streaming.stateful import (
        stateful_user_stats,
    )

    twin_stream = read_events_stream(spark, SF_SMOKE).select("user_id", "value")
    _run_stream(
        stateful_user_stats(twin_stream), tmp_path, "apiws_stats", mode="update"
    )
    twin = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            "SELECT user_id, n_events, total_value FROM apiws_stats"
        ).collect()
    }
    assert got == twin


def test_stream_index_collisions_batch_stream_parity(spark, tmp_path):
    """Streaming near-dup screening: documents replayed as a file stream
    are flagged against a static LSH band index identically to the
    batch run of the same function (source-agnostic contract). The
    plan is stateless — per-row signatures + a stream-static left-semi
    join — so no watermark is required and state stays empty."""
    from deepcell_data_engineering_spark.functions.dedup import (
        lsh_band_index,
        minhash_signatures,
        stream_index_collisions,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    old = docs.where(F.col("doc_id") % 4 != 0)
    new = docs.where(F.col("doc_id") % 4 == 0)
    bands = [["h0", "h1", "h2"], ["h3", "h4", "h5"]]
    index = lsh_band_index(
        minhash_signatures(old, num_hashes=6, k=5), bands=bands
    ).cache()

    batch_hits = {
        (r["doc_id"], r["band"])
        for r in stream_index_collisions(new, index, bands=bands).collect()
    }
    assert batch_hits  # the planted duplicates guarantee collisions

    new_dir = tmp_path / "newdocs"
    new.write.parquet(str(new_dir))
    stream = (
        spark.readStream.schema(new.schema).format("parquet").load(str(new_dir))
    )
    flagged = stream_index_collisions(stream, index, bands=bands)
    q = (
        flagged.writeStream.format("memory")
        .queryName("neardup_flags")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_hits = {
        (r["doc_id"], r["band"])
        for r in spark.sql("SELECT * FROM neardup_flags").collect()
    }
    assert stream_hits == batch_hits


def test_streaming_hll_register_maintenance_equals_batch(spark, tmp_path):
    """Sketch state maintained BY a stream: each micro-batch appends its
    HLL register delta; the live estimate is a grouped max over the
    append-only log. Because register merge is max (idempotent +
    associative + commutative), the maintained state equals the batch
    rebuild exactly AND replaying a batch is a no-op — exactly-once
    semantics without a transactional sink."""
    from deepcell_data_engineering_spark.functions.sketch import hll_registers

    ev = load_table(spark, SF_SMOKE, "events")
    vals = ["event_type", F.col("user_id").cast("string").alias("v")]
    batch_regs = sorted(
        map(tuple, hll_registers(ev.select(*vals), "v", ["event_type"], p=10).collect())
    )

    state = str(tmp_path / "reg_log")

    def append_delta(bdf, _bid):
        hll_registers(bdf.select(*vals), "v", ["event_type"], p=10).write.mode(
            "append"
        ).parquet(state)

    q = (
        read_events_stream(spark, SF_SMOKE)
        .writeStream.foreachBatch(append_delta)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def folded():
        return sorted(
            map(
                tuple,
                spark.read.parquet(state)
                .groupBy("event_type", "bucket")
                .agg(F.max("r").alias("r"))
                .collect(),
            )
        )

    assert folded() == batch_regs
    # replay one delta: append the whole current log again — max is
    # idempotent, so the folded state must not move
    spark.read.parquet(state).write.mode("append").parquet(state + "_copy")
    spark.read.parquet(state + "_copy").write.mode("append").parquet(state)
    assert folded() == batch_regs


def test_streaming_daily_registers_roll_into_sliding_windows(spark, tmp_path):
    """The x75 sliding-window rollup runs unchanged on register state
    MAINTAINED BY a stream: micro-batches append per-day register
    deltas, the log folds by (day, bucket) max, and
    hll_sliding_registers over the folded state equals the batch
    pipeline from the raw events — streaming ingest and batch rebuild
    answer every trailing window identically."""
    from deepcell_data_engineering_spark.functions.sketch import (
        hll_registers,
        hll_sliding_registers,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("day"),
        F.col("user_id").cast("string").alias("v"),
    )
    batch = sorted(
        map(
            tuple,
            hll_sliding_registers(
                hll_registers(du, "v", ["day"], p=10), "day", 7
            ).collect(),
        )
    )

    state = str(tmp_path / "day_regs")

    def append_delta(bdf, _bid):
        d = bdf.select(
            F.col("ts").cast("date").alias("day"),
            F.col("user_id").cast("string").alias("v"),
        )
        hll_registers(d, "v", ["day"], p=10).write.mode("append").parquet(state)

    q = (
        read_events_stream(spark, SF_SMOKE)
        .writeStream.foreachBatch(append_delta)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    folded = (
        spark.read.parquet(state)
        .groupBy("day", "bucket")
        .agg(F.max("r").alias("r"))
    )
    streamed = sorted(map(tuple, hll_sliding_registers(folded, "day", 7).collect()))
    assert streamed == batch


def test_streaming_kmv_state_maintenance_equals_batch(spark, tmp_path):
    """KMV state maintained BY a stream: each micro-batch appends its
    per-group k-smallest-hash delta; the live state is a re-rank over
    the append-only log (min-k is idempotent + associative +
    commutative, like the HLL max), so the maintained sketch equals
    the batch rebuild exactly and replaying a batch is a no-op."""
    from deepcell_data_engineering_spark.functions.sketch import (
        kmv_merge,
        kmv_registers,
    )

    k = 64
    ev = load_table(spark, SF_SMOKE, "events")
    vals = ["event_type", F.col("user_id").cast("string").alias("v")]
    batch_state = sorted(
        map(
            tuple,
            kmv_registers(ev.select(*vals), "v", ["event_type"], k=k).collect(),
        )
    )

    state = str(tmp_path / "kmv_log")

    def append_delta(bdf, _bid):
        kmv_registers(bdf.select(*vals), "v", ["event_type"], k=k).write.mode(
            "append"
        ).parquet(state)

    q = (
        read_events_stream(spark, SF_SMOKE)
        .writeStream.foreachBatch(append_delta)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def folded():
        log = spark.read.parquet(state)
        # fold the whole log with kmv_merge's re-rank (merge with an
        # empty right side = re-rank of the union of all deltas)
        empty = log.limit(0)
        return sorted(
            map(tuple, kmv_merge(log, empty, ["event_type"], k=k).collect())
        )

    assert folded() == batch_state
    # replay: append the entire current log again — state must not move
    spark.read.parquet(state).write.mode("append").parquet(state + "_copy")
    spark.read.parquet(state + "_copy").write.mode("append").parquet(state)
    assert folded() == batch_state


def test_streaming_retention_state_maintenance_equals_batch(spark, tmp_path):
    """x89's retention cohort matrix maintained BY a stream: the state
    is (a) per-user first-seen — a grouped MIN, mergeable by min-fold
    over micro-batch deltas — and (b) the distinct (user, day)
    activity set — idempotent under append+distinct. Each micro-batch
    appends both deltas; the cohort matrix computed from the folded
    state equals the batch x89 rebuild exactly, and replaying a batch
    is a no-op (exactly-once without a transactional sink, like the
    HLL/KMV state stories)."""
    from deepcell_data_engineering_spark.relational import QUERIES

    batch = sorted(
        map(tuple, QUERIES["x89_retention_cohorts"].build(spark, SF_SMOKE).collect())
    )

    seen_log = str(tmp_path / "first_seen")
    act_log = str(tmp_path / "activity")

    def append_delta(bdf, _bid):
        bdf.groupBy("user_id").agg(F.min("ts").alias("min_ts")).write.mode(
            "append"
        ).parquet(seen_log)
        bdf.select(
            "user_id", F.col("ts").cast("date").alias("day")
        ).distinct().write.mode("append").parquet(act_log)

    q = (
        read_events_stream(spark, SF_SMOKE)
        .writeStream.foreachBatch(append_delta)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def matrix_from_state():
        f = (
            spark.read.parquet(seen_log)
            .groupBy("user_id")
            .agg(F.min("min_ts").cast("date").alias("cohort_day"))
        )
        act = spark.read.parquet(act_log).distinct()
        r = (
            act.join(f, "user_id")
            .groupBy(
                "cohort_day",
                F.datediff(F.col("day"), F.col("cohort_day"))
                .cast("bigint")
                .alias("offset_days"),
            )
            .agg(F.countDistinct("user_id").cast("bigint").alias("retained"))
        )
        sz = f.groupBy("cohort_day").agg(
            F.count(F.lit(1)).cast("bigint").alias("cohort_size")
        )
        return sorted(
            map(
                tuple,
                r.join(F.broadcast(sz), "cohort_day")
                .select(
                    F.col("cohort_day").cast("string").alias("cohort_day"),
                    "offset_days",
                    "cohort_size",
                    "retained",
                    F.round(
                        F.col("retained").cast("double")
                        / F.col("cohort_size").cast("double")
                        + F.lit(0.0),
                        4,
                    ).alias("retention"),
                )
                .collect(),
            )
        )

    assert matrix_from_state() == batch
    # replay: append both logs to themselves — min-fold and distinct
    # are idempotent, the matrix must not move
    for log in (seen_log, act_log):
        spark.read.parquet(log).write.mode("append").parquet(log + "_copy")
        spark.read.parquet(log + "_copy").write.mode("append").parquet(log)
    assert matrix_from_state() == batch


def test_streaming_scd2_maintenance_equals_batch(spark, tmp_path):
    """x101's SCD2 dimension maintained BY a stream: each micro-batch
    folds into the version table via scd2_apply — touched keys rebuild
    their own chain (state rows replay + batch union + one partitioned
    window), untouched keys pass through. The batches here slice the
    click stream by event_id residue (NOT chronologically), so the fold
    also proves out-of-order absorption; the final state projected to
    x101's columns equals the batch rebuild exactly."""
    from deepcell_data_engineering_spark.operators.diff import scd2_apply
    from deepcell_data_engineering_spark.relational import QUERIES

    batch = sorted(
        map(tuple, QUERIES["x101_scd2_build"].build(spark, SF_SMOKE).collect())
    )
    clicks = load_table(spark, SF_SMOKE, "events").where(
        F.col("event_type") == "click"
    )
    src = str(tmp_path / "src")
    for i in range(3):
        clicks.where(F.pmod(F.col("event_id"), F.lit(3)) == i).coalesce(
            1
        ).write.mode("append").parquet(src)

    state_paths = []

    def apply_batch(bdf, bid):
        prev = spark.read.parquet(state_paths[-1]) if state_paths else None
        out = str(tmp_path / f"state_{bid}")
        scd2_apply(prev, bdf).write.mode("overwrite").parquet(out)
        state_paths.append(out)

    q = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(state_paths) >= 2  # the fold actually iterated

    final = spark.read.parquet(state_paths[-1])
    got = sorted(
        map(
            tuple,
            final.select(
                "user_id",
                "version",
                F.round(F.col("value") + F.lit(0.0), 2).alias("value"),
                "valid_from_us",
                "valid_to_us",
                "is_current",
            ).collect(),
        )
    )
    assert got == batch


def test_streaming_ivm_join_maintenance_equals_batch(spark, tmp_path):
    """x119's aggregated-join view maintained BY a CDC stream carrying
    BOTH tables: each micro-batch holds an uncorrelated slice of
    orders (by orderkey residue) and lineitem (by suppkey residue),
    and the view state folds through the delta rule
    Delta(O JOIN L) = dO JOIN L_new  UNION  O_old JOIN dL
    — the maintenance path joins each delta against the other side's
    accumulated log, NEVER old against old. The final folded state
    equals x119's output (itself hash-certified against the straight
    rebuild), proving a 100 TB join view refreshes at micro-batch
    cost."""
    from deepcell_data_engineering_spark.functions.stats import (
        merge_grouped_sums,
    )
    from deepcell_data_engineering_spark.relational import QUERIES

    batch = sorted(
        map(tuple, QUERIES["x119_ivm_join_delta"].build(spark, SF_SMOKE).collect())
    )

    o = load_table(spark, SF_SMOKE, "orders").select(
        F.lit("o").alias("side"),
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("priority"),
        F.lit(None).cast("long").alias("cents"),
        F.pmod(F.col("o_orderkey"), F.lit(3)).alias("slice"),
    )
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.lit("l").alias("side"),
        F.col("l_orderkey").alias("k"),
        F.lit(None).cast("string").alias("priority"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("cents"),
        F.pmod(F.col("l_suppkey"), F.lit(3)).alias("slice"),
    )
    cdc = o.unionByName(li)
    src = str(tmp_path / "src")
    for i in range(3):
        cdc.where(F.col("slice") == i).drop("slice").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    o_log = str(tmp_path / "o_log")
    l_log = str(tmp_path / "l_log")
    state_paths: list[str] = []

    def _agg(joined):
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )

    def apply_batch(bdf, bid):
        d_o = bdf.where(F.col("side") == "o").select(
            F.col("k").alias("o_orderkey"),
            F.col("priority").alias("o_orderpriority"),
        )
        d_l = bdf.where(F.col("side") == "l").select(
            F.col("k").alias("l_orderkey"), "cents"
        )
        import os

        empty_o = d_o.limit(0)
        empty_l = d_l.limit(0)
        o_old = spark.read.parquet(o_log) if os.path.exists(o_log) else empty_o
        l_old = spark.read.parquet(l_log) if os.path.exists(l_log) else empty_l
        l_new = l_old.unionByName(d_l)
        parts = [
            _agg(d_o.join(l_new, d_o.o_orderkey == l_new.l_orderkey)),
            _agg(o_old.join(d_l, o_old.o_orderkey == d_l.l_orderkey)),
        ]
        if state_paths:
            parts.insert(0, spark.read.parquet(state_paths[-1]))
        out = str(tmp_path / f"state_{bid}")
        merge_grouped_sums(
            parts, ["o_orderpriority"], ["n", "sum_cents"]
        ).write.mode("overwrite").parquet(out)
        state_paths.append(out)
        d_o.write.mode("append").parquet(o_log)
        d_l.write.mode("append").parquet(l_log)

    q = (
        spark.readStream.schema(cdc.drop("slice").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(state_paths) >= 2  # the fold actually iterated

    got = sorted(
        map(
            tuple,
            spark.read.parquet(state_paths[-1])
            .select(
                "o_orderpriority",
                F.col("n").cast("bigint").alias("n"),
                F.col("sum_cents").cast("bigint").alias("sum_cents"),
            )
            .collect(),
        )
    )
    assert got == batch


def test_streaming_zscore_monitor_equals_batch(spark, tmp_path):
    """x125's trailing z-score monitor fed BY a stream: the state is
    the per-day event count — a mergeable grouped sum — folded from
    micro-batch deltas; the monitor query over the folded state equals
    the batch x125 rebuild exactly (counts are integers and the z
    derivation is one fixed IEEE expression tree, so state-fed and
    rebuild-fed answers are bit-identical)."""
    from pyspark.sql import Window

    from deepcell_data_engineering_spark.functions.stats import (
        merge_grouped_sums,
    )
    from deepcell_data_engineering_spark.relational import QUERIES

    batch = sorted(
        map(tuple, QUERIES["x125_trailing_zscore"].build(spark, SF_SMOKE).collect())
    )

    day_log = str(tmp_path / "day_counts")

    def append_delta(bdf, _bid):
        bdf.groupBy(F.col("ts").cast("date").alias("day")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ).write.mode("append").parquet(day_log)

    q = (
        read_events_stream(spark, SF_SMOKE)
        .writeStream.foreachBatch(append_delta)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    d = merge_grouped_sums(
        [spark.read.parquet(day_log)], ["day"], ["c"]
    )
    tw = Window.orderBy("day").rowsBetween(-7, -1)
    w = d.select(
        "day",
        "c",
        F.count(F.lit(1)).over(tw).alias("n7"),
        F.sum("c").over(tw).alias("s7"),
        F.sum(F.col("c") * F.col("c")).over(tw).alias("ss7"),
    ).where(F.col("n7") == 7)
    n7 = F.col("n7").cast("double")
    s7 = F.col("s7").cast("double")
    ss7 = F.col("ss7").cast("double")
    cd = F.col("c").cast("double")
    mean7 = s7 / n7
    var7 = (n7 * ss7 - s7 * s7) / (n7 * (n7 - F.lit(1.0)))
    zexpr = F.when(var7 > 0, (cd - mean7) / F.sqrt(var7))
    got = sorted(
        map(
            tuple,
            w.select(
                "day",
                F.col("c").cast("bigint").alias("c"),
                F.round(mean7 + F.lit(0.0), 4).alias("mean7"),
                F.round(zexpr + F.lit(0.0), 4).alias("z"),
                ((var7 > 0) & (F.abs(zexpr) >= 2.0)).alias("is_anomaly"),
            ).collect(),
        )
    )
    assert got == batch


def test_streaming_interval_overlap_equals_batch(spark, tmp_path):
    """The bucket-decomposition interval join (operators/joins.py:
    interval_overlap_join) is STATELESS per bucket — explode arriving
    intervals to bucket ids, equi-join the static side, keep a pair
    only in the first shared bucket — so it runs unchanged as a
    stream-static join: arriving sessions probe a static incident
    table with no watermark and no state store, and every micro-batch
    emits exactly its own pairs (the x54 screen pattern for joins)."""
    from deepcell_data_engineering_spark.operators.joins import (
        interval_overlap_join,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    sess = (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("s_start"),
            F.unix_micros(F.col("w.end")).alias("s_end"),
        )
    )
    inc = ev.where(F.col("event_type") == "error").select(
        "event_id",
        (F.unix_micros(F.col("ts")) - F.lit(300_000_000)).alias("i_start"),
        (F.unix_micros(F.col("ts")) + F.lit(300_000_000)).alias("i_end"),
    )
    cols = ["user_id", "s_start", "event_id"]
    expected = {
        tuple(r)
        for r in interval_overlap_join(
            sess, inc, "s_start", "s_end", "i_start", "i_end",
            bucket=1_800_000_000,
        )
        .select(*cols)
        .collect()
    }
    assert len(expected) > 0

    sess_path = str(tmp_path / "sessions")
    sess.write.parquet(sess_path)
    stream = (
        spark.readStream.schema(sess.schema)
        .option("maxFilesPerTrigger", 4)  # several micro-batches
        .parquet(sess_path)
    )
    out = interval_overlap_join(
        stream, inc, "s_start", "s_end", "i_start", "i_end",
        bucket=1_800_000_000,
    ).select(*cols)
    _run_stream(out, tmp_path, "interval_overlap", mode="append")
    got = {
        tuple(r)
        for r in spark.sql("SELECT * FROM interval_overlap").collect()
    }
    assert got == expected


def test_streaming_aqp_sample_maintenance_equals_batch(spark, tmp_path):
    """x135's AQP estimator is incrementally maintainable: the md5
    residue sample filter is STATELESS (each row decides membership
    alone) and the Horvitz-Thompson estimate is a scaled grouped sum —
    so folding per-epoch delta states over a micro-batched stream must
    reproduce the batch estimator exactly."""
    from deepcell_data_engineering_spark.streaming.sinks import (
        maintained_agg,
        start_incremental_agg,
    )

    def with_sample_flag(df):
        key = (F.col("event_id") * 2 + 1).cast("string")
        h = F.conv(F.substring(F.md5(key), 1, 7), 16, 10).cast("long")
        return df.select(
            "event_type",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
            F.when(F.pmod(h, F.lit(20)) == 0, 1).otherwise(0).alias("s"),
        )

    ev = with_sample_flag(load_table(spark, SF_SMOKE, "events"))
    aggs = [
        F.count(F.lit(1)).alias("n_exact"),
        (F.lit(20) * F.sum(F.col("s") * F.col("cents"))).alias("sum_est"),
    ]
    expected = {
        tuple(r)
        for r in ev.groupBy("event_type").agg(*aggs).collect()
    }
    assert any(r[2] != 0 for r in expected)  # the sample is non-empty

    out = str(tmp_path / "state")
    stream = with_sample_flag(read_events_stream(spark, SF_SMOKE))
    q = start_incremental_agg(
        stream, out, str(tmp_path / "ckpt"), ["event_type"], aggs
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in maintained_agg(
            spark, out, ["event_type"], ["n_exact", "sum_est"]
        ).collect()
    }
    assert got == expected


def test_streaming_session_window_equals_batch_sessionization(spark, tmp_path):
    """x140 certifies session_window == the LAG/SUM flag idiom in
    batch; session_window is Structured-Streaming-native, so the
    parity extends to a streamed fold: a watermarked gap-session
    aggregation in append mode (two far-future sentinel files advance
    the watermark so every real session is closed and emitted) must
    equal the batch LAG/SUM sessionization event-for-event."""
    import datetime

    from pyspark.sql import Window

    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "ts")
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    # sentinel events far past the corpus: the first advances the
    # watermark over every real session, the second triggers the
    # micro-batch that emits them (append mode flushes on the NEXT
    # batch after the watermark passes)
    max_ts = ev.agg(F.max("ts")).first()[0]
    for days in (30, 60):
        spark.createDataFrame(
            [(-1, max_ts + datetime.timedelta(days=days))],
            ev.schema,
        ).coalesce(1).write.mode("append").parquet(src)

    sess_agg = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            .cast("long")
            .alias("dur_us"),
        )
        .select("user_id", "n_events", "dur_us")
    )
    _run_stream(sess_agg, tmp_path, "sessparity", mode="append")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM sessparity WHERE user_id >= 0"
        ).collect()
    )

    # batch twin: the LAG/SUM flag idiom (x140's oracle formulation)
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
            >= 30 * 60 * 1_000_000,
            1,
        ).otherwise(0),
    )
    sess = (
        flagged.withColumn(
            "sid",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            .cast("long")
            .alias("dur_us"),
        )
        .select("user_id", "n_events", "dur_us")
    )
    expected = sorted(tuple(r) for r in sess.collect())
    assert len(got) > 0
    assert got == expected


def test_streaming_ks_drift_monitor_equals_batch(spark, tmp_path):
    """Whole-CDF drift monitoring from maintained state: the merged
    value histogram (purchase vs click cents) is maintained as
    per-epoch delta states; ks_distance over the FOLDED state must
    equal ks_distance computed directly over all events — the
    histogram is the statistic's mergeable state, so the monitor
    never rescans raw history."""
    from deepcell_data_engineering_spark.functions.stats import ks_distance
    from deepcell_data_engineering_spark.streaming.sinks import (
        maintained_agg,
        start_incremental_agg,
    )

    cents = F.round(F.col("value") * 100, 0).cast("long")
    side_a = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    side_b = F.when(F.col("event_type") == "click", 1).otherwise(0)

    def hist(df):
        return df.where(
            F.col("event_type").isin("purchase", "click")
        ).groupBy(cents.alias("v")).agg(
            F.sum(side_a).cast("long").alias("h_a"),
            F.sum(side_b).cast("long").alias("h_b"),
        )

    batch = ks_distance(
        hist(load_table(spark, SF_SMOKE, "events")), "v", "h_a", "h_b"
    ).collect()

    out = str(tmp_path / "state")
    q = start_incremental_agg(
        read_events_stream(spark, SF_SMOKE)
        .where(F.col("event_type").isin("purchase", "click"))
        .select(cents.alias("v"), side_a.alias("a"), side_b.alias("b")),
        out,
        str(tmp_path / "ckpt"),
        ["v"],
        [
            F.sum("a").cast("long").alias("h_a"),
            F.sum("b").cast("long").alias("h_b"),
        ],
    )
    q.awaitTermination(120)
    maintained = maintained_agg(spark, out, ["v"], ["h_a", "h_b"])
    stream = ks_distance(maintained, "v", "h_a", "h_b").collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]
