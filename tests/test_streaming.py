"""Structured Streaming operators: drain the sf0.001 events file through
each streaming op and cross-check against the batch corpus twins."""

import tempfile

import pytest
from pyspark.sql import functions as F

from empujar_spark.plans.corpus import load
from empujar_spark.streaming import stream_ops as SO

SF = "/root/testdata/sf0.001"


def drain(spark, df, name, mode="append"):
    q = SO.memory_sink(df, name, mode)
    SO.run_to_completion(q)
    # memory-sink tables are session-scoped, and reader streams run on a
    # private session (_stream_session) — look the table up there
    return df.sparkSession.sql(f"SELECT * FROM {name}")


def test_hourly_counts_matches_batch(spark):
    out = drain(spark, SO.hourly_counts(SO.read_events_stream(spark, SF)),
                "hourly_stream")
    batch = (
        load(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r["hour"], r["event_type"]): r["n"] for r in out.collect()}
    exp = {(r["hour"], r["event_type"]): r["n"] for r in batch.collect()}
    # watermark may hold back the tail hour in append mode; everything
    # emitted must match the batch result exactly
    assert got
    for k, v in got.items():
        assert exp[k] == v


def test_sessionized_runs(spark):
    out = drain(spark, SO.sessionized(SO.read_events_stream(spark, SF)),
                "sessions_stream")
    rows = out.collect()
    assert rows
    assert all(r["session_start"] <= r["session_end"] for r in rows)


def test_dedup_stream(spark):
    out = drain(spark, SO.dedup_stream(SO.read_events_stream(spark, SF)),
                "dedup_stream_out")
    n_events = load(spark, SF, "events").count()
    assert out.count() == n_events  # event_ids are unique already


def test_stream_upsert_into_warehouse(spark, warehouse):
    warehouse.primary_key = "event_id"
    with tempfile.TemporaryDirectory() as ckpt:
        q = SO.stream_upsert(
            SO.read_events_stream(spark, SF), warehouse, "events_sink",
            checkpoint=ckpt,
        )
        SO.run_to_completion(q)
    assert warehouse.table_size("events_sink") == load(spark, SF, "events").count()
    # upsert key present and deduplicated
    df = warehouse.read("events_sink")
    assert df.select("event_id").distinct().count() == df.count()


def test_running_user_totals_stateful(spark):
    out = drain(
        spark,
        SO.running_user_totals(SO.read_events_stream(spark, SF)),
        "running_totals",
        mode="update",
    )
    rows = {r["user_id"]: r for r in out.collect()}  # last update per user
    batch = {
        r["user_id"]: r
        for r in load(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert set(rows) == set(batch)
    for uid, r in rows.items():
        assert r["n_events"] == batch[uid]["n_events"]


def test_state_bounded_by_watermark(spark, tmp_path):
    """Streaming-state honesty at scale: with sequential micro-batches the
    watermark must EVICT finalized windows — state is O(open windows), not
    O(all windows ever seen). Reads stateOperators.numRowsTotal from query
    progress: the final total must be far below the number of distinct
    (hour, event_type) windows in the whole month of events (which is what
    an eviction-less store would hold)."""
    import os

    ev = load(spark, SF, "events")
    n_windows_total = (
        ev.select(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .distinct()
        .count()
    )

    # Split the month into 6 ts-ordered chunks, one file-batch each, so
    # the watermark advances between micro-batches (single-file input =
    # single batch = no mid-run eviction to observe).
    src = str(tmp_path / "chunks")
    day = F.dayofmonth("ts")
    for i in range(6):
        chunk = ev.filter(((day - 1) / 5).cast("int") == i)
        chunk.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"c{i}")
        )

    stream = (
        spark.readStream.schema(SO.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = SO.memory_sink(SO.hourly_counts(stream), "state_bound_sink")
    try:
        q.processAllAvailable()
        progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    finally:
        q.stop()

    assert progresses, "no state-operator progress recorded"
    final = progresses[-1]["stateOperators"][0]
    # eviction-less state would hold every window of the month
    assert final["numRowsTotal"] < n_windows_total / 3, (
        final["numRowsTotal"], n_windows_total,
    )
    # and rows really were evicted along the way, not never-added
    assert sum(p["stateOperators"][0].get("numRowsRemoved", 0)
               for p in progresses) > 0


def test_stream_dir_cache_tracks_source_mtime(tmp_path):
    """Regenerating a source file in place must yield a FRESH stream dir:
    the cache key includes (mtime, size), so a stale /tmp symlink dir from
    the previous file generation can never be silently re-read."""
    import os
    import shutil
    import time

    src = str(tmp_path / "events.parquet")
    shutil.copyfile("/root/testdata/sf0.001/events.parquet", src)
    d1 = SO._as_stream_dir(src)
    assert os.path.islink(os.path.join(d1, "events.parquet"))
    # same file, untouched → same cached dir
    assert SO._as_stream_dir(src) == d1
    # regenerate in place (mtime changes) → different dir
    time.sleep(0.01)
    os.utime(src)
    d2 = SO._as_stream_dir(src)
    assert d2 != d1


def test_late_data_audit_counts_dropped_rows(spark, tmp_path):
    """Watermark honesty: rows arriving after the watermark has passed
    their window must be DROPPED and ACCOUNTED. Batch 0 = days 11-28,
    batch 1 = days 29-30 (the watermark needs a committed batch to take
    effect, so this bridge batch arms it at late-month), batch 2 =
    days 1-5 — every group beyond the 10-minute tolerance → dropped.
    numRowsDroppedByWatermark counts rows reaching the state operator,
    i.e. post-partial-aggregation (window, event_type) groups, not raw
    input rows — asserted exactly against the late batch's distinct
    group count."""
    import os

    ev = load(spark, SF, "events")
    day = F.dayofmonth("ts")
    src = str(tmp_path / "late")
    ev.filter(day.between(11, 28)).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "c0")
    )
    ev.filter(day >= 29).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "c1")
    )
    late = ev.filter(day <= 5)
    n_late_groups = (
        late.select(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .distinct()
        .count()
    )
    assert n_late_groups > 0
    late.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "c2"))

    stream = (
        spark.readStream.schema(SO.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = SO.memory_sink(SO.hourly_counts(stream), "late_audit_sink")
    try:
        q.processAllAvailable()
        audit = SO.late_data_audit(q)
    finally:
        q.stop()

    assert audit["rows_dropped_by_watermark"] == n_late_groups, audit
    assert len(audit["watermarks"]) >= 2
    # and none of the late windows leaked into the emitted results
    leaked = (
        spark.sql("SELECT * FROM late_audit_sink")
        .filter(F.dayofmonth("hour") <= 5)
        .count()
    )
    assert leaked == 0


def test_quality_monitor_stream_counts_planted_violations(spark, tmp_path):
    """Planted bad rows are counted by the per-batch monitor even when
    the source splits into multiple micro-batches (additive checks are
    batching-invariant)."""
    import datetime as dt

    from empujar_spark.streaming.stream_ops import quality_monitor_stream

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "view", 10.0, "{}"),
        (2, None, 1, "view", 10.0, "{}"),             # null ts
        (3, dt.datetime(2024, 1, 1), 1, "bogus", 10.0, "{}"),  # bad type
        (4, dt.datetime(2024, 1, 1), 1, "click", -5.0, "{}"),  # range
        (5, dt.datetime(2024, 1, 1), 1, "click", 2000.0, "{}"),
    ]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    src = str(tmp_path / "events")
    df = spark.createDataFrame(rows, schema)
    # two files -> (with maxFilesPerTrigger=1) two micro-batches
    df.filter("event_id <= 2").coalesce(1).write.parquet(src)
    df.filter("event_id > 2").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    audit = {
        r.check: (r.n_violations, r.passed)
        for r in quality_monitor_stream(stream).collect()
    }
    assert audit["not_null(ts)"] == (1, 0)
    assert audit["in_range(value,0.0,1000.0)"] == (2, 0)
    assert audit["accepted_values(event_type)"] == (1, 0)


def test_running_user_totals_multi_batch_state_roundtrip(spark, tmp_path):
    """State must survive ACROSS micro-batches: two files + 
    maxFilesPerTrigger=1 forces two batches, so batch 2 hits the
    state.exists=True path for returning users (the path a single-batch
    drain never exercises — a state.get misuse crashes exactly here)."""
    import os

    d = str(tmp_path / "in")
    os.makedirs(d)
    spark.createDataFrame(
        [(1, 10.0, "2024-01-01 00:00:00"), (2, 5.0, "2024-01-01 00:01:00")],
        "user_id long, value double, ts string",
    ).selectExpr("user_id", "value", "CAST(ts AS TIMESTAMP) ts").coalesce(
        1
    ).write.mode("overwrite").parquet(d + "/b1")
    spark.createDataFrame(
        [(1, 7.0, "2024-01-01 00:02:00")],
        "user_id long, value double, ts string",
    ).selectExpr("user_id", "value", "CAST(ts AS TIMESTAMP) ts").coalesce(
        1
    ).write.mode("overwrite").parquet(d + "/b2")
    # one flat dir with both files so maxFilesPerTrigger splits batches
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    import glob, shutil

    for i, f in enumerate(
        sorted(glob.glob(d + "/b*/part-*.parquet"))
    ):
        shutil.copy(f, f"{flat}/{i:03d}.parquet")
    stream = (
        spark.readStream.schema("user_id long, value double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out = drain(spark, SO.running_user_totals(stream), "rt_multibatch",
                mode="update")
    last = {r["user_id"]: r for r in out.collect()}
    # user 1 appears in both batches: final update must ACCUMULATE
    assert last[1]["n_events"] == 2 and last[1]["total_value"] == 17.0
    assert last[2]["n_events"] == 1 and last[2]["total_value"] == 5.0


def test_neardup_ingest_stream_multibatch_equals_batch_twin(spark):
    """The streaming admission gate drains the 4-file landing split in
    REAL multiple micro-batches (maxFilesPerTrigger=1) and its
    accumulated audit equals the batch twin exactly — per-document
    verdicts against a frozen history are batch-boundary-invariant."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import dedup as D
    from empujar_spark.streaming import stream_ops as SO

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    hist_sh = D.history_shingle_table(hist)

    stream = SO.read_documents_stream(spark, sf).filter(F.col("doc_id") % 5 == 0)
    out = SO.neardup_ingest_stream(stream, hist_sh, threshold=0.3)
    assert len(out._neardup_batches) >= 2, "expected real multi-batch drain"

    twin = D.containment_incremental_pairs(new, hist, threshold=0.3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, twin.collect()))
    assert out.count() > 0


def test_left_outer_join_emits_unmatched_after_flush(spark):
    from pyspark.sql import functions as F

    from empujar_spark.streaming import stream_ops as SO

    sf = "/root/testdata/sf0.001"
    ev = SO.read_events_stream_flushed(spark, sf)
    drained = SO.drain_to_memory(
        SO.purchase_followers_left_join(ev, ev),
        "__t_left_outer_join",
    ).filter(F.col("user_id") != SO.FLUSH_USER_ID)
    got = {tuple(r) for r in drained.collect()}

    batch = spark.read.parquet(f"{sf}/events.parquet")
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    o = batch.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", "event_type"
    )
    want_df = o.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("ts") >= F.col("p_ts"))
        & (F.col("ts") <= F.col("p_ts") + F.expr("INTERVAL 30 minutes")),
        "left_outer",
    ).select(
        "event_id", "user_id", "ts", "event_type",
        "purchase_id", "purchase_value",
    )
    want = {tuple(r) for r in want_df.collect()}
    assert got == want
    # the outer semantics are actually exercised: some followers unmatched
    assert any(r[4] is None for r in got)
    assert any(r[4] is not None for r in got)


def test_bloom_admission_stream_cross_batch_rejection(spark, tmp_path):
    """Round 11: the streaming bloom admission gate folds each batch's
    admitted keys into the registry bitmap, so a key duplicated ACROSS
    micro-batches is admitted exactly once — the first carrying batch
    wins; later copies hit the (now folded) bitmap and are rejected by
    the confirm join against the (now inserted) history. The index is
    maintained by fold only: still generation 1, fresh, and covering
    every admitted key afterwards."""
    import os

    from pyspark.sql import functions as F

    from empujar_spark.catalog import Warehouse
    from empujar_spark.indexes import IndexRegistry
    from empujar_spark.operators import sketch as K
    from empujar_spark.streaming import stream_ops as SO

    wh = Warehouse(spark, str(tmp_path / "wh"), primary_key="doc_id")
    reg = IndexRegistry(wh)
    # initial history: keys h0..h9
    hist = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("h"), F.col("id")).alias("fingerprint"),
    )
    wh.insert_data("admission_history", hist, merge_key="doc_id")
    m, k = K.bloom_params(1000, fpp=0.01)
    reg.register(
        "adm", "bloom",
        {"bitmap": K.bloom_to_df(
            spark,
            K.build_bloom_with_params(
                wh.read("admission_history"), "fingerprint", m, k
            ), m, k,
        )},
        source_table="admission_history",
    )
    # two landing files -> two micro-batches. Batch files carry:
    #   f1: fresh keys n0,n1 + history dup h3
    #   f2: n1 AGAIN (cross-batch dup) + fresh n2
    d = tmp_path / "landing"
    os.makedirs(d)
    spark.createDataFrame(
        [(100, "n0"), (101, "n1"), (102, "h3")],
        "doc_id long, fingerprint string",
    ).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(
        [(200, "n1"), (201, "n2")],
        "doc_id long, fingerprint string",
    ).coalesce(1).write.parquet(str(d / "f2"))
    stream = (
        spark.readStream.schema("doc_id long, fingerprint string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    out = SO.bloom_admission_stream(
        stream, reg, "adm", "admission_history"
    )
    assert len(out._bloom_batches) >= 2
    got = sorted(r.fingerprint for r in out.collect())
    assert got == ["n0", "n1", "n2"]  # n1 once, h3 rejected
    # maintained by FOLD: gen 1, fresh, and the bitmap admits all keys
    assert reg.describe("adm")["generation"] == 1
    assert not reg.is_stale("adm")
    art = K.bloom_from_df(reg.read("adm")["bitmap"])
    missed = (
        K.with_bloom_flag(
            wh.read("admission_history"), "fingerprint", *art
        ).filter(~F.col("__maybe_seen")).count()
    )
    assert missed == 0


def test_bloom_admission_stream_spill_mode(spark, tmp_path):
    """Round 12 (VERDICT r11 #1): a backfill-shaped drain — mostly
    fresh keys, far more of them than ``max_resident_keys`` — must not
    accumulate the admitted set on the driver. Past the threshold the
    loop spills the resident sliver to a parquet append and keeps only
    the bitmap in memory; the confirm join reads the spill back, the
    epilogue writes spill ∪ tail to history as ONE distributed insert,
    and the returned DataFrame scans the spill. Output is still
    EXACTLY the batch anti-join oracle (stream keys minus initial
    history), including a cross-batch dup whose first copy was already
    spilled when the second copy arrived, and the fold-maintained
    index ends fresh at generation 1 covering every admitted key."""
    import os

    from pyspark.sql import functions as F

    from empujar_spark.catalog import Warehouse
    from empujar_spark.indexes import IndexRegistry
    from empujar_spark.operators import sketch as K
    from empujar_spark.streaming import stream_ops as SO

    wh = Warehouse(spark, str(tmp_path / "wh"), primary_key="doc_id")
    reg = IndexRegistry(wh)
    hist = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("h"), F.col("id")).alias("fingerprint"),
    )
    wh.insert_data("admission_history", hist, merge_key="doc_id")
    m, k = K.bloom_params(1000, fpp=0.01)
    reg.register(
        "adm", "bloom",
        {"bitmap": K.bloom_to_df(
            spark,
            K.build_bloom_with_params(
                wh.read("admission_history"), "fingerprint", m, k
            ), m, k,
        )},
        source_table="admission_history",
    )
    # 4 landing files × 30 mostly-fresh keys ≫ max_resident_keys=20.
    # File 0 carries history dup h3; file 3 re-carries file 0's n0
    # (a cross-SPILL-boundary dup: n0 was spilled long before file 3).
    d = tmp_path / "landing"
    os.makedirs(d)
    fresh = [f"n{i}" for i in range(118)]
    files = [fresh[0:30] + ["h3"], fresh[30:60],
             fresh[60:90], fresh[90:118] + ["n0", "h7"]]
    doc = 100
    for i, keys in enumerate(files):
        rows = [(doc + j, kk) for j, kk in enumerate(keys)]
        doc += 1000
        spark.createDataFrame(
            rows, "doc_id long, fingerprint string"
        ).coalesce(1).write.parquet(str(d / f"f{i}"))
    stream = (
        spark.readStream.schema("doc_id long, fingerprint string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    out = SO.bloom_admission_stream(
        stream, reg, "adm", "admission_history", max_resident_keys=20
    )
    assert len(out._bloom_batches) >= 4
    assert out._bloom_spills >= 2, "the spill regime never engaged"
    assert out._bloom_max_resident <= 20, (
        f"carried-over resident keys {out._bloom_max_resident} exceed "
        "the max_resident_keys bound the spill exists to enforce"
    )
    got = sorted(r.fingerprint for r in out.collect())
    assert got == sorted(fresh)  # each fresh key once; h3/h7 rejected
    # history ended as initial ∪ admitted, exactly once each
    hist_after = sorted(
        r.fingerprint for r in wh.read("admission_history").collect()
    )
    assert hist_after == sorted([f"h{i}" for i in range(10)] + fresh)
    # maintained by FOLD through ensure_fresh_fold: gen 1, fresh,
    # bitmap covers every key now in history
    assert reg.describe("adm")["generation"] == 1
    assert not reg.is_stale("adm")
    art = K.bloom_from_df(reg.read("adm")["bitmap"])
    missed = (
        K.with_bloom_flag(
            wh.read("admission_history"), "fingerprint", *art
        ).filter(~F.col("__maybe_seen")).count()
    )
    assert missed == 0


def test_kmeans_drift_stream_boundary_invariant_and_matches_batch(spark):
    """The streamed per-cluster audit must be identical however the
    arrivals split into micro-batches (1 file vs 4 — exact integer
    partials), and must equal the same aggregation computed in one
    batch pass over the whole probe set."""
    from empujar_spark.operators import similarity as S
    from empujar_spark.streaming.stream_ops import (
        kmeans_drift_stream,
        read_embeddings_stream,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    C, _ = S.kmeans_lloyd(emb, k=4, iters=1)

    def drained(n_files):
        probe = read_embeddings_stream(spark, sf, n_files=n_files).filter(
            F.col("vec_id") % 5 == 0
        )
        return {
            r.cluster: (r.n, r.mean_dist2)
            for r in kmeans_drift_stream(probe, C).collect()
        }

    one, four = drained(1), drained(4)
    assert one == four and len(four) > 0
    batch_probe = emb.filter(F.col("vec_id") % 5 == 0)
    batch = {
        r.cluster: (r.n, r.mean_dist2)
        for r in S.kmeans_distortion(batch_probe, C)
        .select(
            "cluster",
            F.round(F.col("dist2") * F.lit(1000000.0), 0)
            .cast("bigint")
            .alias("d6"),
        )
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("d6").alias("s"))
        .select(
            F.col("cluster").cast("bigint").alias("cluster"),
            "n",
            F.round(F.col("s") / F.lit(1000000.0) / F.col("n"), 6).alias(
                "mean_dist2"
            ),
        )
        .collect()
    }
    assert four == batch


def test_kmeans_drift_stream_null_vector_counts_under_null_cluster(
    spark, tmp_path
):
    """A NULL-embedding arrival must not kill the monitor: it folds into
    a NULL-cluster row (n counted, mean NULL) exactly like the batch
    twin's groupBy — review r12 finding."""
    import os

    from empujar_spark.streaming.stream_ops import (
        EMB_SCHEMA,
        kmeans_drift_stream,
    )

    land = str(tmp_path / "land")
    os.makedirs(land)
    spark.createDataFrame(
        [(1, [1.0, 0.0], 1), (2, None, 1), (3, [0.0, 1.0], 2)],
        EMB_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(land)
    probe = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    out = {
        r.cluster: (r.n, r.mean_dist2)
        for r in kmeans_drift_stream(
            probe, [[1.0, 0.0], [0.0, 1.0]]
        ).collect()
    }
    assert out[None] == (1, None)
    assert out[0] == (1, 0.0) and out[1] == (1, 0.0)


def test_neardup_ingest_stream_spill_regime_bounds_driver_pairs(spark):
    """VERDICT r12 item 5: a duplicate-heavy drain must not accumulate
    the flagged-pair audit on the driver unboundedly — past
    max_resident_pairs the resident sliver spills to parquet and only
    the tail stays in memory. Output must stay bit-identical to the
    unbounded regime (and hence to the batch twin), spills must really
    happen, and the carried-across-batches peak must respect the bound."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import dedup as D
    from empujar_spark.streaming import stream_ops as SO

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    hist_sh = D.history_shingle_table(hist)
    stream = SO.read_documents_stream(spark, sf).filter(
        F.col("doc_id") % 5 == 0
    )
    # threshold low enough that every batch flags pairs; bound low
    # enough that the drain must spill at least once mid-stream
    out = SO.neardup_ingest_stream(
        stream, hist_sh, threshold=0.3, max_resident_pairs=1
    )
    assert len(out._neardup_batches) >= 2, "expected real multi-batch drain"
    assert out._neardup_spills >= 2, "spill regime never engaged"
    assert out._neardup_max_resident <= 1, (
        "pairs carried across a batch boundary exceeded the bound"
    )
    twin = D.containment_incremental_pairs(new, hist, threshold=0.3)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, twin.collect())
    )
    assert out.count() > 0
    # ADVICE r13: the spill dir is exposed so a caller that has
    # materialized the audit can reclaim the disk, and it is registered
    # for atexit cleanup as the backstop
    assert out._neardup_spill_dir is not None
    import os

    assert os.path.isdir(out._neardup_spill_dir)


def test_neardup_ingest_stream_caller_supplied_spill_dir(spark, tmp_path):
    """On a cluster the spill path must live on shared storage — the
    spill_dir parameter routes the degraded-regime writes there and the
    audit output stays identical (ADVICE r13 local-mode note)."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import dedup as D
    from empujar_spark.streaming import stream_ops as SO

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    hist_sh = D.history_shingle_table(hist)
    stream = SO.read_documents_stream(spark, sf).filter(
        F.col("doc_id") % 5 == 0
    )
    spill = str(tmp_path / "neardup-spill")
    out = SO.neardup_ingest_stream(
        stream, hist_sh, threshold=0.3, max_resident_pairs=1,
        spill_dir=spill,
    )
    assert out._neardup_spills >= 1
    # ADVICE r14: the gate spills into a run-private subdir of the
    # caller's base dir — append-mode writes + a whole-dir epilogue
    # scan would otherwise union leftovers from a previous run
    assert out._neardup_spill_dir.startswith(spill + "/run-")
    twin = D.containment_incremental_pairs(new, hist, threshold=0.3)
    expected = sorted(map(tuple, twin.collect()))
    assert sorted(map(tuple, out.collect())) == expected
    # a SECOND run sharing the same base dir must not inherit the first
    # run's spilled parquet into its audit (the leftover-union hazard)
    out2 = SO.neardup_ingest_stream(
        SO.read_documents_stream(spark, sf).filter(
            F.col("doc_id") % 5 == 0
        ),
        hist_sh, threshold=0.3, max_resident_pairs=1,
        spill_dir=spill,
    )
    assert out2._neardup_spill_dir != out._neardup_spill_dir
    assert sorted(map(tuple, out2.collect())) == expected


def test_psi_drift_stream_equals_batch_twin(spark):
    """The streaming PSI monitor drains the 4-file events split in real
    multiple micro-batches and its audit equals the batch operator bit
    for bit — frozen-reference binning is per-row, bin counts are exact
    integer partials, and both route through the shared smoothing tail."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import profile as P
    from empujar_spark.streaming import stream_ops as SO

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ref = ev.filter(F.col("user_id") % 2 == 0)
    cur_batch = ev.filter(F.col("user_id") % 2 == 1)
    stream = SO.read_events_stream_split(spark, sf).filter(
        F.col("user_id") % 2 == 1
    )
    got = SO.psi_drift_stream(stream, ref, "value", n_bins=10)
    twin = P.population_stability(ref, cur_batch, "value", n_bins=10)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, twin.collect())
    )


def test_psi_drift_stream_empty_reference_raises(spark):
    from empujar_spark.streaming import stream_ops as SO

    ref = spark.createDataFrame([], "value double")
    with __import__("pytest").raises(ValueError):
        SO.psi_drift_stream(None, ref, "value")


def test_chi2_drift_stream_equals_batch_twin(spark):
    """The streaming categorical monitor drains real multiple micro-
    batches and its audit equals the batch operator bit for bit —
    integer category counts are additive in any batch split, and both
    route through the shared expected-count tail."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import profile as P
    from empujar_spark.streaming import stream_ops as SO

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur_batch = ev.filter(F.col("event_id") % 2 == 1)
    stream = SO.read_events_stream_split(spark, sf).filter(
        F.col("event_id") % 2 == 1
    )
    got = SO.chi2_drift_stream(stream, ref, "event_type")
    twin = P.chi_square_drift(ref, cur_batch, "event_type")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, twin.collect())
    )
    assert got.count() > 0


def test_contamination_gate_stream_multibatch_equals_batch_twin(spark):
    """The streaming decontamination gate must drain in real multiple
    micro-batches and its accumulated audit equal the batch operator on
    the whole stream input bit for bit — each doc's verdict depends only
    on itself and the frozen eval gram set (boundary invariance)."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import curation as C
    from empujar_spark.streaming import stream_ops as SO

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pred = (F.col("doc_id") % 97 != 0) & (F.col("doc_id") % 5 == 0)
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    stream = SO.read_documents_stream(spark, sf).filter(pred)
    out = SO.contamination_gate_stream(stream, eval_docs, n=8)
    assert len(out._contam_batches) >= 2, "expected real multi-batch drain"
    twin = C.ngram_contamination(docs.filter(pred), eval_docs, n=8)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, twin.collect())
    )
    assert out.count() > 0


def test_contamination_gate_stream_spill_regime_bounds_driver_rows(spark,
                                                                   tmp_path):
    """Past max_resident_rows the audit spills to parquet and only the
    tail stays resident; output stays bit-identical to the unbounded
    regime, spills really happen, and the carried-across-batches peak
    respects the bound (the neardup_ingest_stream regime)."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import curation as C
    from empujar_spark.streaming import stream_ops as SO

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pred = (F.col("doc_id") % 97 != 0) & (F.col("doc_id") % 5 == 0)
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    stream = SO.read_documents_stream(spark, sf).filter(pred)
    spill = str(tmp_path / "contam-spill")
    out = SO.contamination_gate_stream(
        stream, eval_docs, n=8, max_resident_rows=3, spill_dir=spill,
    )
    assert out._contam_spills >= 2, "spill regime never engaged"
    assert out._contam_max_resident <= 3
    # run-private subdir under the caller's base dir (ADVICE r14) —
    # see the neardup twin test for the leftover-union rationale
    assert out._contam_spill_dir.startswith(spill + "/run-")
    twin = C.ngram_contamination(docs.filter(pred), eval_docs, n=8)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, twin.collect())
    )


def test_moment_drift_stream_multibatch_and_scale6_agreement(spark):
    """The streaming moment monitor must drain in real multiple
    micro-batches, equal its quantized batch formula bit for bit
    (integer partials are merge-order-exact), and agree with the float
    batch operator embedding_moment_drift to the 1e-6 grid on
    well-scaled data (same signal, different additive contract)."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import profile as P
    from empujar_spark.streaming import stream_ops as SO

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur_b = emb.filter(F.col("vec_id") % 2 == 1)
    stream = SO.read_embeddings_stream(spark, sf).filter(
        F.col("vec_id") % 2 == 1
    )
    out = SO.moment_drift_stream(stream, ref)
    rows = {r.dim: r for r in out.collect()}
    assert rows
    # float-batch agreement on the 1e-6 grid (values are unit-scale)
    batch = {r.dim: r for r in P.embedding_moment_drift(ref, cur_b).collect()}
    assert set(rows) == set(batch)
    for d, r in rows.items():
        b = batch[d]
        assert abs(r.mu_cur - b.mu_cur) <= 2e-6, d
        assert abs(r.var_cur - b.var_cur) <= 2e-6, d
        assert abs(r.fid_term - b.fid_term) <= 5e-6, d


def test_semantic_gate_stream_equals_batch_twin_and_spills(spark, tmp_path):
    """The streaming semantic-decontamination gate (r15): drains in real
    multiple micro-batches, its audit equals embedding_decontam on the
    whole stream input bit for bit (per-vector verdict + argmax vs the
    frozen suite is batch-boundary-invariant), and past
    max_resident_rows the audit spills to a run-private subdir of the
    caller's dir with bit-identical output."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import similarity as S
    from empujar_spark.streaming import stream_ops as SO

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    bench = emb.filter(F.col("vec_id") < 50)
    twin = S.embedding_decontam(
        emb.filter(F.col("vec_id") >= 50), bench, threshold=0.3
    )
    expected = sorted(map(tuple, twin.collect()))
    assert expected, "fixture has no semantic hits at 0.3 — tune threshold"

    out = SO.semantic_gate_stream(
        SO.read_embeddings_stream(spark, sf).filter(F.col("vec_id") >= 50),
        bench,
        threshold=0.3,
    )
    assert len(out._semantic_batches) > 1, "drained in a single batch"
    assert sorted(map(tuple, out.collect())) == expected

    spill = str(tmp_path / "sem-spill")
    out2 = SO.semantic_gate_stream(
        SO.read_embeddings_stream(spark, sf).filter(F.col("vec_id") >= 50),
        bench,
        threshold=0.3,
        max_resident_rows=1,
        spill_dir=spill,
    )
    assert out2._semantic_spills >= 1
    assert out2._semantic_max_resident <= 1
    assert out2._semantic_spill_dir.startswith(spill + "/run-")
    assert sorted(map(tuple, out2.collect())) == expected


def test_cardinality_stream_tracks_exact_within_tolerance(spark):
    """The streaming cardinality monitor (r15): drains in real multiple
    micro-batches, accumulates one mergeable HLL partial per feature
    per batch, and its unioned estimates land within the lgK=12
    tolerance (~5% = 3x rsd, floor 2) of the EXACT batch twin on every
    feature — the sketch-union path is not bit-pinnable (a unioned
    sketch differs from a directly-built one), so tolerance against
    exact is the contract."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import profile as P
    from empujar_spark.streaming import stream_ops as SO

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ref = ev.filter(F.col("user_id") % 2 == 0)
    cols = ["user_id", "event_type", "value"]
    exact = {
        r.feature: r
        for r in P.cardinality_drift(
            ref, ev.filter(F.col("user_id") % 2 == 1), cols
        ).collect()
    }
    out = SO.cardinality_stream(
        SO.read_events_stream_split(spark, sf).filter(
            F.col("user_id") % 2 == 1
        ),
        ref,
        cols,
    )
    assert len(out._cardinality_batches) > 1, "drained in a single batch"
    got = {r.feature: r for r in out.collect()}
    assert set(got) == set(exact)
    for feat, e in exact.items():
        g = got[feat]
        for col in ["n_ref_distinct", "n_cur_distinct"]:
            assert abs(g[col] - e[col]) <= max(2, 0.05 * e[col]), (
                feat, col, g[col], e[col],
            )
        assert g.ratio == round(g.n_cur_distinct / g.n_ref_distinct, 6)


def test_drain_foreach_batch_binds_and_restores_partitions(spark, tmp_path):
    """r16: _drain_foreach_batch pins batch-sized shuffle partitions for
    the whole drain (the callback's jobs see the bound value) and
    restores the session conf afterwards, also on callback failure."""
    import pyspark.sql.functions as F

    from empujar_spark.streaming.stream_ops import _drain_foreach_batch

    src = str(tmp_path / "src")
    spark.range(8).selectExpr("id", "id * 2 AS v").write.parquet(src)
    stream = spark.readStream.schema("id long, v long").parquet(src)
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    seen = {}

    def cb(batch_df, batch_id):
        seen["parts"] = spark.conf.get(key)
        # a shuffle inside the callback actually uses the bound value
        seen["n"] = batch_df.groupBy("id").count().rdd.getNumPartitions()

    _drain_foreach_batch(stream, cb, timeout_s=120.0, batch_partitions=3)
    assert seen["parts"] == "3"
    assert seen["n"] <= 3
    assert spark.conf.get(key) == before

    def boom(batch_df, batch_id):
        raise RuntimeError("callback failure")

    stream2 = spark.readStream.schema("id long, v long").parquet(src)
    try:
        _drain_foreach_batch(stream2, boom, timeout_s=120.0)
    except Exception:
        pass
    assert spark.conf.get(key) == before
