"""Streaming tests: windowed agg batch/stream parity, stateful top-X."""

import pytest
from pyspark.sql import functions as F

from hbase_gis_spark.sources.tables import load_table, points_from_events
from hbase_gis_spark.streaming.events import (
    read_event_stream,
    run_stream_to_memory,
    streaming_top_x_earliest,
    user_sessions,
    windowed_event_counts,
)
from tests.conftest import SF0001


def test_windowed_counts_stream_matches_batch(spark):
    batch = load_table(spark, SF0001, "events")
    expect = {
        (r.ws, r.event_type): (r.n, r.value_sum)
        for r in windowed_event_counts(batch).collect()
    }

    stream = read_event_stream(spark, SF0001)
    assert stream.isStreaming
    run_stream_to_memory(
        windowed_event_counts(stream), "win_counts", output_mode="update"
    )
    got = {
        (r.ws, r.event_type): (r.n, r.value_sum)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == expect and len(expect) > 0


def test_user_sessions_stream_matches_batch(spark):
    batch = load_table(spark, SF0001, "events")
    expect = {
        (r.ss, r.se, r.user_id): r.n_events
        for r in user_sessions(batch).collect()
    }
    stream = read_event_stream(spark, SF0001)
    run_stream_to_memory(
        user_sessions(stream), "sessions", output_mode="complete"
    )
    got = {
        (r.ss, r.se, r.user_id): r.n_events
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert got == expect and len(expect) > 0


def test_streaming_geofence_matches_batch_within(spark):
    """within() is a stateless filter — identical results over
    readStream (the geofence shape: points stream in, matches stream
    out)."""
    from hbase_gis_spark.operators.within import within

    wkt = (
        "POLYGON ((-74.00 40.70, -73.95 40.85, -73.90 40.75, "
        "-73.95 40.65, -74.00 40.70))"
    )
    batch_pts = points_from_events(load_table(spark, SF0001, "events"))
    expect = {r.id for r in within(batch_pts, wkt).collect()}

    stream_pts = points_from_events(read_event_stream(spark, SF0001))
    assert stream_pts.isStreaming
    run_stream_to_memory(
        within(stream_pts, wkt).select("id"), "geofence", output_mode="append"
    )
    got = {r.id for r in spark.sql("SELECT * FROM geofence").collect()}
    assert got == expect and len(expect) > 0


def test_streaming_topx_matches_batch_topx(spark):
    from hbase_gis_spark.operators.topx import top_x

    batch = load_table(spark, SF0001, "events")
    x = 3
    expect = {
        (r.user_id, r.event_id)
        for r in top_x(batch, "user_id", "ts", x, tiebreak_col="event_id").collect()
    }

    stream = read_event_stream(spark, SF0001)
    run_stream_to_memory(
        streaming_top_x_earliest(stream, x), "stream_topx", output_mode="update"
    )
    # final state per user = last emitted batch per user
    got = {
        (r.user_id, r.event_id)
        for r in spark.sql("SELECT * FROM stream_topx").collect()
    }
    assert got == expect


def test_stream_stream_attribution_matches_batch(spark):
    """Watermarked stream-stream interval self-join (purchase <- views
    lookback window) emits exactly the batch join's rows. Inner
    stream-stream joins emit matches eagerly (the watermark only
    bounds join state), so a finite stream yields the full result."""
    from hbase_gis_spark.streaming.events import purchase_view_attribution

    batch = load_table(spark, SF0001, "events")
    expect = {
        (r.user_id, r.purchase_id, r.view_id)
        for r in purchase_view_attribution(batch, "24 hours").collect()
    }
    assert len(expect) > 0

    stream = read_event_stream(spark, SF0001)
    run_stream_to_memory(
        purchase_view_attribution(stream, "24 hours"),
        "attribution",
        output_mode="append",
    )
    got = {
        (r.user_id, r.purchase_id, r.view_id)
        for r in spark.sql("SELECT * FROM attribution").collect()
    }
    assert got == expect


def test_streaming_dedup_matches_batch(spark):
    """dropDuplicatesWithinWatermark on the stream returns the same key
    set as batch dropDuplicates (first occurrence per user)."""
    from hbase_gis_spark.streaming.events import dedup_events

    batch = load_table(spark, SF0001, "events")
    expect = {r.user_id for r in dedup_events(batch, ["user_id"]).collect()}

    stream = read_event_stream(spark, SF0001)
    run_stream_to_memory(
        dedup_events(stream, ["user_id"]).select("user_id"),
        "dedup_stream",
        output_mode="append",
    )
    got = {r.user_id for r in spark.sql("SELECT * FROM dedup_stream").collect()}
    assert got == expect and len(expect) > 0


def test_streaming_multibatch_state_handover(spark, tmp_path_factory):
    """Split the events table into 4 files streamed one per micro-batch
    (maxFilesPerTrigger=1): per-group state must carry across batches.
    Watermarks are set far out so no event is treated as late (the files
    are split randomly, not by time)."""
    from hbase_gis_spark.operators.topx import top_x

    base = str(tmp_path_factory.mktemp("evsplit") / "events")
    ev = load_table(spark, SF0001, "events")
    ev.repartition(4).write.mode("overwrite").parquet(base)
    schema = ev.schema

    def mkstream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(base)
        )

    # session windows merge across batches (complete mode keeps state)
    expect_sessions = {
        (r.ss, r.se, r.user_id): r.n_events
        for r in user_sessions(ev).collect()
    }
    q = (
        user_sessions(mkstream(), watermark="30 days")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("mb_sessions")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.ss, r.se, r.user_id): r.n_events
        for r in spark.sql("SELECT * FROM mb_sessions").collect()
    }
    assert got == expect_sessions

    # stateful grouped top-X: per-user bounded state across batches;
    # track the latest emission per user via foreachBatch
    x = 3
    expect_topx = {
        (r.user_id, r.event_id)
        for r in top_x(ev, "user_id", "ts", x, tiebreak_col="event_id").collect()
    }
    latest: dict[int, set] = {}

    def sink(bdf, _bid):
        rows = bdf.collect()
        touched = {}
        for r in rows:
            touched.setdefault(r.user_id, set()).add((r.user_id, r.event_id))
        latest.update(touched)

    q2 = (
        streaming_top_x_earliest(mkstream(), x)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    got_topx = set().union(*latest.values()) if latest else set()
    assert got_topx == expect_topx


def test_streaming_corpus_filters_match_batch(spark, tmp_path_factory):
    """The corpus operators compose with Structured Streaming: stateless
    pii_scrub applies unchanged on a document stream, and mixture
    sampling becomes a stream-static broadcast join against the
    batch-computed rates dim — same kept set as the batch operator."""
    from hbase_gis_spark.operators.corpus import (
        content_hash,
        mixture_rates,
        mixture_sample,
        pii_scrub,
    )
    from hbase_gis_spark.sources.corpus_io import read_document_stream

    docs = load_table(spark, SF0001, "documents")
    base = str(tmp_path_factory.mktemp("docstream") / "docs")
    docs.repartition(3).write.mode("overwrite").parquet(base)

    expect = {r.doc_id for r in mixture_sample(docs, "lang", 0.5).collect()}
    rates = mixture_rates(docs, "lang", 0.5)  # static dim (batch)
    cut = F.floor(F.col("sample_rate") * 1_000_000).cast("bigint")

    stream = read_document_stream(spark, base, max_files_per_trigger=1)
    sampled = (
        pii_scrub(stream).select("doc_id")  # stateless op on the stream
        .join(stream.select("doc_id", "lang"), "doc_id")
        .join(F.broadcast(rates.select("lang", cut.alias("c"))), "lang")
        .filter(content_hash("mix", "doc_id", 1_000_000) < F.col("c"))
        .select("doc_id")
    )
    run_stream_to_memory(sampled, "corpus_stream", output_mode="append")
    got = {r.doc_id for r in spark.sql("SELECT * FROM corpus_stream").collect()}
    assert got == expect and len(expect) > 0


def test_streaming_cdc_upsert_matches_batch_merge(spark, tmp_path_factory):
    """CDC-style streaming upsert: deltas arrive as a file stream, each
    micro-batch folds into a versioned snapshot via merge_upsert
    (foreachBatch read-merge-write). Because merge is last-write-wins
    on an explicit version column, the final snapshot is independent
    of batch arrival order and equals the one-shot batch merge."""
    from pyspark.sql import functions as F
    from hbase_gis_spark.operators.merge import merge_upsert

    root = tmp_path_factory.mktemp("cdc")
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    base = (
        docs.withColumn("version", F.lit(0).cast("bigint"))
        .withColumn("deleted", F.lit(False))
    )
    base.write.mode("overwrite").parquet(str(root / "snap_v0"))

    updates = (
        docs.filter("doc_id % 3 = 0")
        .select(
            "doc_id",
            F.concat(F.lit("v"), (F.col("doc_id") % 5) + 1, F.lit(":"),
                     F.col("doc_id")).alias("text"),
        )
        .withColumn("version", (F.col("doc_id") % 5 + 1).cast("bigint"))
        .withColumn("deleted", F.col("doc_id") % 9 == 0)
    )
    upd_dir = str(root / "updates")
    updates.repartition(3).write.mode("overwrite").parquet(upd_dir)

    expect = sorted(
        map(
            tuple,
            merge_upsert(base, updates, "doc_id", "version", "deleted")
            .select("doc_id", "text", "version")
            .collect(),
        )
    )

    state = {"v": 0}

    def apply_batch(batch_df, _bid):
        cur = spark.read.parquet(str(root / f"snap_v{state['v']}"))
        merged = merge_upsert(cur, batch_df, "doc_id", "version", "deleted")
        state["v"] += 1
        merged.write.mode("overwrite").parquet(str(root / f"snap_v{state['v']}"))

    stream = (
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(upd_dir)
    )
    q = stream.writeStream.foreachBatch(apply_batch).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)

    got = sorted(
        map(
            tuple,
            spark.read.parquet(str(root / f"snap_v{state['v']}"))
            .select("doc_id", "text", "version")
            .collect(),
        )
    )
    assert state["v"] >= 2  # the deltas really arrived over >1 batch
    assert got == expect


def test_streaming_incremental_dedup_matches_batch(spark, tmp_path_factory):
    """Continuous-ingest dedup: new documents arrive as a file stream
    and every micro-batch checks itself against the static catalog via
    dedup_incremental (foreachBatch). Verdicts are per-doc independent
    given the catalog, so the union over micro-batches equals the
    one-shot batch run regardless of how the batch splits."""
    from hbase_gis_spark.operators.dedup import dedup_incremental

    docs = load_table(spark, SF0001, "documents")
    cat = docs.filter("doc_id % 3 = 0")
    inc = docs.filter("doc_id % 3 <> 0")
    expect = {
        r.doc_id: (r.dup_of, r.reason)
        for r in dedup_incremental(inc, cat, threshold=0.5).collect()
    }
    assert len(expect) > 0

    root = tmp_path_factory.mktemp("inc_dedup")
    inc_dir = str(root / "incoming")
    inc.repartition(3).write.mode("overwrite").parquet(inc_dir)

    got = {}

    def fold(batch_df, _bid):
        for r in dedup_incremental(batch_df, cat, threshold=0.5).collect():
            got[r.doc_id] = (r.dup_of, r.reason)

    stream = (
        spark.readStream.schema(inc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inc_dir)
    )
    q = stream.writeStream.foreachBatch(fold).start()
    q.processAllAvailable()
    q.stop()
    assert got == expect


def test_streaming_daily_anomalies_converges_to_batch(
    spark, tmp_path_factory
):
    """Multi-batch streaming anomaly detection converges to the batch
    daily_anomalies answer: stream the events table in 4 micro-batches,
    keep the LATEST emission per (event_type, day), and compare with
    the batch query at SF0001 (same integer-sum z formula)."""
    from hbase_gis_spark.streaming.events import streaming_daily_anomalies

    base = str(tmp_path_factory.mktemp("evsplit_anom") / "events")
    ev = load_table(spark, SF0001, "events")
    ev.repartition(4).write.mode("overwrite").parquet(base)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    WIN, ZT = 7, 1.0  # small sf needs a tighter window to be non-vacuous
    run_stream_to_memory(
        streaming_daily_anomalies(stream, win=WIN, z_threshold=ZT),
        "anom_stream",
        output_mode="update",
    )
    # batch index increases with emission order within the memory sink;
    # collect() preserves it, so "last write wins" per key
    latest = {}
    for r in spark.sql("SELECT * FROM anom_stream").collect():
        latest[(r.event_type, r.day)] = (r.y, r.z, r.is_anomaly)
    latest = {
        k: (y, z) for k, (y, z, flag) in latest.items() if flag
    }
    # python replica of the batch formula (trailing WIN observed days)
    per = {}
    for r in ev.collect():
        day = (
            r.ts.replace(tzinfo=__import__("datetime").timezone.utc)
            .timestamp()
        )
        day = int(day * 1_000_000) // 86_400_000_000
        per.setdefault(r.event_type, {})
        per[r.event_type][day] = per[r.event_type].get(day, 0) + 1
    batch = {}
    for etype, acc in per.items():
        days = sorted(acc)
        ys = [acc[d] for d in days]
        for i in range(WIN, len(days)):
            w = ys[i - WIN : i]
            n = float(WIN)
            mean = float(sum(w)) / n
            var = float(sum(v * v for v in w)) / n - mean * mean
            diff = float(ys[i]) - mean
            sd = var ** 0.5 if var > 0 else 0.0
            if sd > 0:
                z = diff / sd
            elif diff == 0:
                continue
            else:
                z = float("inf") if diff > 0 else float("-inf")
            if z >= ZT or z <= -ZT:
                batch[(etype, days[i])] = (ys[i], z)
    assert set(latest) == set(batch)
    assert len(batch) > 0
    import math

    for k, (y, z) in batch.items():
        sy, sz = latest[k]
        assert sy == y
        if math.isfinite(z):
            assert abs(sz - z) < 1e-9
        else:
            assert sz == z


def test_streaming_media_phash_matches_batch(spark, tmp_path_factory):
    """Multimodal signature extraction composes with Structured
    Streaming unchanged: attach_fake_media + media_phash are stateless
    per-row stages (mapInPandas runs per micro-batch), so the streamed
    signature set equals the batch one."""
    from hbase_gis_spark.operators.multimodal import (
        attach_fake_media,
        media_phash,
    )
    from hbase_gis_spark.sources.corpus_io import read_document_stream

    raw = load_table(spark, SF0001, "documents")
    base = str(tmp_path_factory.mktemp("mediastream") / "docs")
    raw.repartition(3).write.mode("overwrite").parquet(base)

    docs = raw.withColumnRenamed("doc_id", "id")
    expect = {
        r.id: (r.phash_lo, r.phash_hi)
        for r in media_phash(attach_fake_media(docs)).collect()
    }
    stream = read_document_stream(
        spark, base, max_files_per_trigger=1
    ).withColumnRenamed("doc_id", "id")
    sigs = media_phash(attach_fake_media(stream))
    run_stream_to_memory(sigs, "phash_stream", output_mode="append")
    got = {
        r.id: (r.phash_lo, r.phash_hi)
        for r in spark.sql("SELECT * FROM phash_stream").collect()
    }
    assert got == expect and len(expect) == 500


def test_streaming_decontaminate_matches_batch(spark, tmp_path_factory):
    """The streaming guard (stateless stream-static semi/anti join)
    flags exactly the docs the batch decontamination audit scores
    n_hits >= 1, and drop mode emits exactly the complement."""
    from hbase_gis_spark.operators.dedup import word_shingles
    from hbase_gis_spark.sources.corpus_io import read_document_stream
    from hbase_gis_spark.streaming.events import streaming_decontaminate
    from hbase_gis_spark.operators.textstats import ngram_contamination

    docs = load_table(spark, SF0001, "documents")
    mod = 17
    train = docs.filter(F.col("doc_id") % mod != 0)
    test_set = docs.filter(F.col("doc_id") % mod == 0)
    eval_grams = (
        test_set.select(F.explode(word_shingles("text", 3)).alias("g"))
        .distinct()
    )
    batch = ngram_contamination(train, test_set, n=3)
    expect_flagged = {r.doc_id for r in batch.filter("n_hits >= 1").collect()}
    expect_clean = {r.doc_id for r in batch.filter("n_hits = 0").collect()}

    base = str(tmp_path_factory.mktemp("deconstream") / "docs")
    train.repartition(3).write.mode("overwrite").parquet(base)
    stream = read_document_stream(spark, base, max_files_per_trigger=1)

    run_stream_to_memory(
        streaming_decontaminate(stream, eval_grams).select("doc_id"),
        "decon_flagged", output_mode="append",
    )
    got_flagged = {r.doc_id for r in spark.sql("SELECT * FROM decon_flagged").collect()}
    assert got_flagged == expect_flagged and len(expect_flagged) > 0

    run_stream_to_memory(
        streaming_decontaminate(stream, eval_grams, mode="drop").select("doc_id"),
        "decon_clean", output_mode="append",
    )
    got_clean = {r.doc_id for r in spark.sql("SELECT * FROM decon_clean").collect()}
    assert got_clean == expect_clean


def test_streaming_quality_resample_matches_batch(spark, tmp_path_factory):
    """quality_resample is a pure function of row content (hash draw,
    no RNG state), so it applies unchanged on a document stream and
    keeps exactly the batch operator's survivor set."""
    from hbase_gis_spark.operators.corpus import quality_resample
    from hbase_gis_spark.sources.corpus_io import read_document_stream

    docs = load_table(spark, SF0001, "documents")
    expect = {r.doc_id for r in quality_resample(docs).collect()}
    base = str(tmp_path_factory.mktemp("qrstream") / "docs")
    docs.repartition(3).write.mode("overwrite").parquet(base)
    stream = read_document_stream(spark, base, max_files_per_trigger=1)
    run_stream_to_memory(
        quality_resample(stream).select("doc_id"),
        "qr_stream", output_mode="append",
    )
    got = {r.doc_id for r in spark.sql("SELECT * FROM qr_stream").collect()}
    assert got == expect and len(expect) > 0


def test_streaming_psi_counts_match_batch_histogram(spark):
    """The stream-static PSI monitor converges to the batch value_psi
    histogram exactly: bin counts from the event stream (binned
    against the batch-computed reference cuts) equal the batch n_cur
    column for the same cohort split."""
    from hbase_gis_spark.operators.drift import psi_cuts, value_psi
    from hbase_gis_spark.streaming.events import streaming_psi_counts

    batch = load_table(spark, SF0001, "events")
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    ref = batch.filter(day % 2 == 0)
    cur = batch.filter(day % 2 == 1)
    expect = {
        (r.event_type, r.bin): r.n_cur
        for r in value_psi(ref, cur, "event_type", "value").collect()
        if r.n_cur > 0
    }
    cuts = psi_cuts(ref, "event_type", "value")

    stream = read_event_stream(spark, SF0001).filter(day % 2 == 1)
    run_stream_to_memory(
        streaming_psi_counts(stream, cuts), "psi_stream"
    )
    # update mode re-emits a (key, bin) on change: keep the final count
    got = {
        (r.event_type, r.bin): r.n_cur
        for r in spark.sql(
            "SELECT event_type, bin, max(n_cur) AS n_cur "
            "FROM psi_stream GROUP BY 1, 2"
        ).collect()
    }
    assert got == expect and len(expect) > 0


def test_streaming_orphan_counts_match_batch_audit(spark):
    """The stream-static orphan monitor converges to the batch
    referential audit: with a damaged user dim (every 3rd user
    removed), per-key streaming orphan counts equal the batch
    per-key counts, and their total equals referential_orphans'
    n_orphans."""
    from hbase_gis_spark.operators.quality import referential_orphans
    from hbase_gis_spark.streaming.events import streaming_orphan_counts

    batch = load_table(spark, SF0001, "events")
    dim = (
        batch.select("user_id").distinct().filter(F.col("user_id") % 3 != 0)
    )
    total = referential_orphans(
        [("ev_users", batch, "user_id", dim, "user_id")]
    ).head()
    expect = {
        r.user_id: r.n
        for r in batch.join(dim, "user_id", "left_anti")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(expect.values()) == total.n_orphans > 0

    stream = read_event_stream(spark, SF0001)
    run_stream_to_memory(
        streaming_orphan_counts(stream, dim), "orphan_stream"
    )
    got = {
        r.fk_value: r.n_orphans
        for r in spark.sql(
            "SELECT fk_value, max(n_orphans) AS n_orphans "
            "FROM orphan_stream GROUP BY 1"
        ).collect()
    }
    assert got == expect


def test_streaming_histogram_matches_batch_with_persisted_range_dim(
    spark, tmp_path_factory
):
    """VERDICT r4 next-round #6: the equi-width histogram's range dim
    has the same re-derivation hazard as the curve-layout bounds — a
    later cohort binned against ITS OWN min/max is incomparable with
    the reference histogram. Pin the contract end-to-end: the range
    dim is computed on the reference cohort, PERSISTED to parquet,
    read back, and both the batch current-cohort histogram and the
    streaming counts bin against it — converging to identical counts,
    including the clamped edge bins for values outside the reference
    range."""
    from hbase_gis_spark.operators.drift import (
        histogram_range,
        value_histogram,
    )
    from hbase_gis_spark.streaming.events import streaming_histogram_counts

    batch = load_table(spark, SF0001, "events")
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    ref = batch.filter(day % 2 == 0)
    cur = batch.filter(day % 2 == 1)

    dim_path = str(tmp_path_factory.mktemp("hist_dim") / "range")
    histogram_range(ref, "event_type", "value").write.parquet(dim_path)
    rng = spark.read.parquet(dim_path)

    expect = {
        (r.event_type, r.bin): r.n_values
        for r in value_histogram(
            cur, "event_type", "value", n_bins=10, range_dim=rng
        ).collect()
        if r.n_values > 0
    }

    stream = read_event_stream(spark, SF0001).filter(day % 2 == 1)
    run_stream_to_memory(
        streaming_histogram_counts(
            stream, rng, "event_type", "value", n_bins=10
        ),
        "hist_stream",
    )
    got = {
        (r.event_type, r.bin): r.n_values
        for r in spark.sql(
            "SELECT event_type, bin, max(n_values) AS n_values "
            "FROM hist_stream GROUP BY 1, 2"
        ).collect()
    }
    assert got == expect and len(expect) > 0


def test_streaming_first_seen_matches_batch_reach(
    spark, tmp_path_factory
):
    """The streaming first-seen MIN aggregation converges to the batch
    cumulative_users day collapse regardless of arrival order: stream
    the events table in 4 RANDOMLY partitioned files, keep the latest
    emission per user, bucket to days, and compare with the batch
    reach curve exactly."""
    from hbase_gis_spark.operators.timeseries import cumulative_users
    from hbase_gis_spark.sources.tables import ts_us
    from hbase_gis_spark.streaming.events import (
        run_stream_to_memory,
        streaming_first_seen,
    )

    ev = load_table(spark, SF0001, "events")
    expect = {
        r.day: (r.new_users, r.cum_users)
        for r in cumulative_users(ev, ts_us()).collect()
    }
    assert len(expect) > 0

    base = str(tmp_path_factory.mktemp("evsplit_reach") / "events")
    ev.repartition(4).write.mode("overwrite").parquet(base)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    run_stream_to_memory(
        streaming_first_seen(stream),
        "first_seen_stream",
        output_mode="update",
    )
    latest = {}
    for r in spark.sql("SELECT * FROM first_seen_stream").collect():
        latest[r.user_id] = r.first_us  # emission order: last wins
    per_day = {}
    for us in latest.values():
        d = us // 86_400_000_000
        per_day[d] = per_day.get(d, 0) + 1
    got, cum = {}, 0
    for d in sorted(per_day):
        cum += per_day[d]
        got[d] = (per_day[d], cum)
    assert got == expect


def test_streaming_dedup_stored_matches_batch_verdicts(spark, tmp_path):
    """Arriving documents deduped against the materialized postings
    catalog produce IDENTICAL verdicts to the batch stored path,
    regardless of how the stream is split into micro-batches — the
    stream-static twin of dedup_incremental_stored (VERDICT r5 #7).
    Runs with and without the max_df hot-shingle cap."""
    from hbase_gis_spark.operators.dedup import (
        dedup_incremental_stored,
        write_catalog_postings,
    )
    from hbase_gis_spark.streaming.events import (
        run_stream_to_memory,
        streaming_dedup_incremental_stored,
    )

    docs = load_table(spark, SF0001, "documents")
    cat = docs.filter("doc_id % 3 < 2")
    inc = docs.filter("doc_id % 3 = 2")
    path = str(tmp_path / "catalog")
    write_catalog_postings(cat, path)

    base = str(tmp_path / "incoming")
    inc.repartition(3).write.mode("overwrite").parquet(base)
    stream = (
        spark.readStream.schema(inc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )

    for max_df in (None, 5):
        want = {
            r.doc_id: (r.dup_of, r.reason)
            for r in dedup_incremental_stored(
                inc, path, 0.5, max_df=max_df
            ).collect()
        }
        name = f"dedup_stream_{max_df or 0}"
        run_stream_to_memory(
            streaming_dedup_incremental_stored(
                stream, path, 0.5, max_df=max_df
            ),
            name,
            output_mode="update",
        )
        got = {
            r.doc_id: (r.dup_of, r.reason)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        assert got == want and len(got) > 0
        assert any(v[1] is not None for v in got.values())


def test_streaming_event_debounce_matches_batch(spark):
    """Round-7 twin: the stateful streaming debounce keeps exactly the
    batch operator's kept set on in-order delivery."""
    from hbase_gis_spark.operators.timeseries import event_debounce
    from hbase_gis_spark.streaming.events import streaming_event_debounce

    gap = 300_000_000
    batch = load_table(spark, SF0001, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
    )
    expect = {
        r.event_id
        for r in event_debounce(batch, gap).collect()
        if r.kept
    }

    stream = read_event_stream(spark, SF0001)
    assert stream.isStreaming
    run_stream_to_memory(
        streaming_event_debounce(stream, gap), "debounced", "update"
    )
    got = {
        r.event_id for r in spark.sql("SELECT * FROM debounced").collect()
    }
    assert got == expect and len(got) > 0


def test_windowed_unique_users_stream_matches_batch(spark):
    """Round-7 twin: exact hourly distinct users via
    dedup-then-count, equal to batch countDistinct."""
    from hbase_gis_spark.streaming.events import windowed_unique_users

    batch = load_table(spark, SF0001, "events")
    expect_direct = {
        (r.ws,): r.n
        for r in batch.withColumn(
            "event_ts", F.col("ts").cast("timestamp")
        )
        .groupBy(F.window("event_ts", "1 hour"))
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
        .collect()
    }
    got_batch = {
        (r.ws,): r.n_users
        for r in windowed_unique_users(batch).collect()
    }
    assert got_batch == expect_direct

    stream = read_event_stream(spark, SF0001)
    run_stream_to_memory(
        windowed_unique_users(stream), "uniq_users", "update"
    )
    got_stream = {
        (r.ws,): r.n_users
        for r in spark.sql("SELECT * FROM uniq_users").collect()
    }
    assert got_stream == expect_direct and len(got_stream) > 0


def test_windowed_unique_users_null_users_match_count_distinct(spark):
    """ADVICE r7 #4: dropDuplicates keeps one (NULL, window) row that
    count(1) would tally, while countDistinct excludes NULLs — the
    NULL-user filter must hold parity on a fixture that actually HAS
    NULL user_ids (the sf fixture has none, which is how the
    off-by-one hid)."""
    from datetime import datetime

    from hbase_gis_spark.streaming.events import windowed_unique_users

    rows = [
        (1, datetime(2026, 1, 1, 10, 5)),
        (1, datetime(2026, 1, 1, 10, 15)),
        (2, datetime(2026, 1, 1, 10, 25)),
        (None, datetime(2026, 1, 1, 10, 35)),
        (None, datetime(2026, 1, 1, 11, 5)),  # NULL-only window
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {
        (r.ws,): r.n_users for r in windowed_unique_users(df).collect()
    }
    expect = {
        (r.ws,): r.n
        for r in df.groupBy(F.window(F.col("ts"), "1 hour"))
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
        .filter(F.col("n") > 0)
        .collect()
    }
    assert got == expect
    assert list(got.values()) == [2]


def test_streaming_rollup_maintenance_matches_batch(
    spark, tmp_path_factory
):
    """Streaming materialized-view maintenance: events arrive as a
    file stream and each micro-batch folds into a stored (day,
    event_type) rollup via incremental_rollup (foreachBatch
    read-merge-write). Additivity makes the final stored rollup
    independent of batch boundaries and equal to the one-shot full
    recompute — the streaming half of the incremental_rollup arc."""
    root = tmp_path_factory.mktemp("rollup")
    ev = load_table(spark, SF0001, "events").select(
        F.expr(
            "unix_micros(cast(ts as timestamp)) div 86400000000"
        ).alias("day"),
        "event_type",
        F.round(F.col("value").cast("double") * 1000, 0)
        .cast("bigint")
        .alias("value_milli"),
    )
    keys = ["day", "event_type"]

    def full(df):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("value_milli").cast("bigint").alias("value_milli"),
        )

    expect = sorted(map(tuple, full(ev).collect()))

    # empty stored seed with the rollup schema
    full(ev.limit(0)).write.mode("overwrite").parquet(
        str(root / "rollup_v0")
    )
    ev_dir = str(root / "incoming")
    ev.repartition(4).write.mode("overwrite").parquet(ev_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    from hbase_gis_spark.streaming.events import maintain_rollup_stream

    q, state = maintain_rollup_stream(
        spark, stream, keys, str(root),
        count_col="n_rows", sum_cols=["value_milli"],
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    got = sorted(
        map(
            tuple,
            spark.read.parquet(
                str(root / f"rollup_v{state['version']}")
            ).collect(),
        )
    )
    assert state["version"] >= 2  # the rows really arrived over >1 batch
    assert got == expect


def test_streaming_rollup_crash_resume_converges(
    spark, tmp_path_factory
):
    """Stop/restart recovery for maintain_rollup_stream: phase 1
    folds an initial file set under a real checkpoint; a crash is
    then simulated in the worst window (store write committed, the
    checkpoint's last epoch commit deleted, so the restart REPLAYS
    that epoch); phase 2 restarts from the checkpoint, discovers the
    advanced store version by scanning (never re-reads the empty v0
    seed), skips the replayed epoch via its _FOLDED_B marker instead
    of double-folding, folds newly arrived files, and converges to
    the one-shot recompute over everything seen."""
    import os

    from hbase_gis_spark.streaming.events import (
        latest_rollup_version,
        maintain_rollup_stream,
    )

    root = tmp_path_factory.mktemp("rollup_resume")
    ev = load_table(spark, SF0001, "events").select(
        F.expr(
            "unix_micros(cast(ts as timestamp)) div 86400000000"
        ).alias("day"),
        "event_type",
    )
    keys = ["day", "event_type"]

    def full(df):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows")
        )

    full(ev.limit(0)).write.mode("overwrite").parquet(
        str(root / "rollup_v0")
    )
    ev_dir, ckpt = str(root / "incoming"), str(root / "ckpt")
    first = ev.filter(F.col("day") % 2 == 0)
    second = ev.filter(F.col("day") % 2 == 1)
    first.repartition(2).write.mode("overwrite").parquet(ev_dir)

    def run():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_dir)
        )
        q, state = maintain_rollup_stream(
            spark, stream, keys, str(root), count_col="n_rows",
            trigger_available_now=True, checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)
        return state

    s1 = run()
    assert s1["version"] >= 2 and s1["batch_id"] is not None
    got1 = sorted(map(tuple, spark.read.parquet(
        str(root / f"rollup_v{s1['version']}")
    ).collect()))
    assert got1 == sorted(map(tuple, full(first).collect()))

    # crash in the at-least-once window: the store committed epoch B
    # but the checkpoint did not -- Spark will replay B on restart
    commits = sorted(
        int(f) for f in os.listdir(os.path.join(ckpt, "commits"))
        if f.isdigit()
    )
    os.remove(os.path.join(ckpt, "commits", str(commits[-1])))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):  # Hadoop ChecksumFileSystem sidecar
        os.remove(crc)

    # new files arrive while "down"
    second.repartition(2).write.mode("append").parquet(ev_dir)

    # the restart's scan must find the advanced head, not v0, and
    # attribute it to this checkpoint's lineage
    import hashlib

    lin = hashlib.md5(ckpt.encode()).hexdigest()[:12]
    assert latest_rollup_version(spark, str(root)) == (
        s1["version"], s1["batch_id"], lin
    )
    s2 = run()
    got2 = sorted(map(tuple, spark.read.parquet(
        str(root / f"rollup_v{s2['version']}")
    ).collect()))
    assert got2 == sorted(map(tuple, full(ev).collect()))
    # replayed epoch was skipped: the version advanced only by the
    # number of NEW files (2), not new + replayed
    assert s2["version"] == s1["version"] + 2


def test_streaming_rollup_marker_crash_and_lineage_guard(
    spark, tmp_path_factory
):
    """The two recovery windows the review surfaced: (1) a version
    whose parquet commit landed but whose fold marker didn't (crash
    between the two writes) is INVISIBLE to the scan, so the
    replayed epoch re-folds from the marked head and overwrites it
    with identical content — no double-fold; (2) a store head folded
    by a DIFFERENT checkpoint lineage refuses to start (batch ids
    are not comparable across lineages) unless start_version rebases
    explicitly."""
    import glob
    import hashlib
    import os

    from hbase_gis_spark.streaming.events import (
        latest_rollup_version,
        maintain_rollup_stream,
    )

    root = tmp_path_factory.mktemp("rollup_marker")
    ev = load_table(spark, SF0001, "events").select(
        F.expr(
            "unix_micros(cast(ts as timestamp)) div 86400000000"
        ).alias("day"),
        "event_type",
    )
    keys = ["day", "event_type"]

    def full(df):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows")
        )

    full(ev.limit(0)).write.mode("overwrite").parquet(
        str(root / "rollup_v0")
    )
    ev_dir, ckpt = str(root / "incoming"), str(root / "ckpt")
    ev.repartition(3).write.mode("overwrite").parquet(ev_dir)

    def run(checkpoint=None, **kw):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_dir)
        )
        q, state = maintain_rollup_stream(
            spark, stream, keys, str(root), count_col="n_rows",
            trigger_available_now=True,
            checkpoint_dir=checkpoint or ckpt, **kw,
        )
        q.awaitTermination(120)
        return state

    s1 = run()
    head = s1["version"]
    assert head >= 3

    # window (1): crash between head's parquet commit and its marker
    # write — the checkpoint commit is missing too (it comes later)
    for f in glob.glob(str(root / f"rollup_v{head}" / "_FOLDED_B*")):
        os.remove(f)
    commits = sorted(
        int(f) for f in os.listdir(os.path.join(ckpt, "commits"))
        if f.isdigit()
    )
    os.remove(os.path.join(ckpt, "commits", str(commits[-1])))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    # the unmarked head is invisible; the scan falls back to head-1
    ver, bid, lin = latest_rollup_version(spark, str(root))
    assert ver == head - 1
    assert lin == hashlib.md5(ckpt.encode()).hexdigest()[:12]

    s2 = run()
    # the replayed epoch re-folded from head-1 and OVERWROTE the
    # unmarked head with identical content — version ends at head,
    # not head+1, and the store equals the one-shot recompute
    assert s2["version"] == head
    got = sorted(map(tuple, spark.read.parquet(
        str(root / f"rollup_v{head}")
    ).collect()))
    assert got == sorted(map(tuple, full(ev).collect()))

    # window (2): a different checkpoint lineage must refuse
    import pytest

    with pytest.raises(ValueError, match="different checkpoint lineage"):
        run(checkpoint=str(root / "ckpt_other"))
    # ...unless start_version rebases explicitly (setup succeeds; the
    # fresh lineage then re-reads the source from scratch by design)
    s3 = run(checkpoint=str(root / "ckpt_other"), start_version=0)
    got3 = sorted(map(tuple, spark.read.parquet(
        str(root / f"rollup_v{s3['version']}")
    ).collect()))
    assert got3 == sorted(map(tuple, full(ev).collect()))


def test_streaming_rollup_torn_first_fold_on_fresh_seed(
    spark, tmp_path_factory
):
    """ADVICE r9 #1: on a FRESH seed store (no marked version exists
    anywhere), a crash between the first fold's parquet commit (which
    writes _SUCCESS) and its _FOLDED marker leaves TWO unmarked
    versions (v0 seed, v1 torn). The _SUCCESS fallback must elect the
    LOWEST (v0) so the replayed epoch overwrites the torn v1 with
    identical content — electing the highest would treat torn v1 as a
    seed with batch_id=None and double-fold the replayed batch onto
    it."""
    import glob
    import os

    from hbase_gis_spark.streaming.events import (
        latest_rollup_version,
        maintain_rollup_stream,
    )

    root = tmp_path_factory.mktemp("rollup_torn_seed")
    ev = load_table(spark, SF0001, "events").select(
        F.expr(
            "unix_micros(cast(ts as timestamp)) div 86400000000"
        ).alias("day"),
        "event_type",
    )
    keys = ["day", "event_type"]

    def full(df):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows")
        )

    full(ev.limit(0)).write.mode("overwrite").parquet(
        str(root / "rollup_v0")
    )
    ev_dir, ckpt = str(root / "incoming"), str(root / "ckpt")
    # ONE source file => the whole stream is exactly ONE micro-batch,
    # so the crash below is precisely "first fold torn on fresh seed"
    ev.coalesce(1).write.mode("overwrite").parquet(ev_dir)

    def run():
        stream = spark.readStream.schema(ev.schema).parquet(ev_dir)
        q, state = maintain_rollup_stream(
            spark, stream, keys, str(root), count_col="n_rows",
            trigger_available_now=True, checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)
        return state

    s1 = run()
    assert s1["version"] == 1  # seed v0 + the single fold v1

    # crash between v1's parquet commit (_SUCCESS written) and its
    # marker: remove the marker AND the epoch's checkpoint commit, so
    # the restart replays batch 0 onto a store of exactly
    # {v0 seed (_SUCCESS), v1 torn (_SUCCESS)} — the ADVICE scenario
    for f in glob.glob(str(root / "rollup_v1" / "_FOLDED_B*")):
        os.remove(f)
    for f in os.listdir(os.path.join(ckpt, "commits")):
        os.remove(os.path.join(ckpt, "commits", f))

    # the scan must elect the SEED, not the torn fold — and, with 2
    # unmarked _SUCCESS versions on disk, this is exactly the
    # ambiguous case the r10 ADVICE made loud: expect the warning
    # here and on the resume below
    with pytest.warns(RuntimeWarning, match="unmarked _SUCCESS"):
        assert latest_rollup_version(spark, str(root)) == (0, None, None)

    with pytest.warns(RuntimeWarning, match="unmarked _SUCCESS"):
        s2 = run()
    # the replayed epoch re-folded FROM v0 and OVERWROTE torn v1 —
    # version ends at 1 (not 2), content equals the one-shot
    # recompute with every count exactly once
    assert s2["version"] == 1
    got = sorted(map(tuple, spark.read.parquet(
        str(root / "rollup_v1")
    ).collect()))
    assert got == sorted(map(tuple, full(ev).collect()))
