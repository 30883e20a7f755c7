"""Sources/sinks, multimodal plumbing, and Structured Streaming tests.

The streaming tests assert stream == batch on the replayed sf0.001
events file — the strongest check available without a live source.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_ml_pipeline_spark.operators import multimodal as mm_ops
from big_data_ml_pipeline_spark.sources.catalog import load_table
from big_data_ml_pipeline_spark.sources.readers import _infer_format, load_data
from big_data_ml_pipeline_spark.sources.writers import write_data
from big_data_ml_pipeline_spark.streaming import events as stream_ops

from conftest import SF0001


# ---------------------------------------------------------------------------
# Sources / sinks
# ---------------------------------------------------------------------------

def test_infer_format():
    assert _infer_format("/a/b/data.parquet") == "parquet"
    assert _infer_format("s3a://bucket/x.CSV") == "csv"
    assert _infer_format("/a/b/table") == "parquet"  # default: lake format


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    path = str(tmp_path / "t.parquet")
    write_data(df, path)
    back = load_data(spark, path)
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_csv_roundtrip_with_header(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    path = str(tmp_path / "t.csv")
    write_data(df, path, fmt="csv", header="true")
    back = load_data(spark, path)
    assert back.first()["k"] == 1  # inferSchema like the reference


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame([(i, i % 3) for i in range(30)], ["v", "p"])
    path = str(tmp_path / "part.parquet")
    write_data(df, path, partition_by=["p"])
    back = load_data(spark, path).filter(F.col("p") == 1)
    assert back.count() == 10
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in plan


def test_catalog_normalizes_event_timestamps(spark):
    ev = load_table(spark, SF0001, "events")
    assert ev.schema["ts"].dataType.simpleString() == "timestamp"
    assert ev.count() > 0


def test_catalog_rejects_unknown_table(spark):
    with pytest.raises(KeyError):
        load_table(spark, SF0001, "nope")


def test_delta_unavailable_raises_clear_error(spark, tmp_path):
    # delta-spark is an optional dependency; absence must fail loudly,
    # not fall through to a wrong-format read
    with pytest.raises((RuntimeError, Exception)) as exc:
        load_data(spark, str(tmp_path / "t"), fmt="delta").count()
    assert "delta" in str(exc.value).lower()


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------

def test_decode_stub_deterministic_and_strict():
    a = mm_ops.decode_stub(b"hello world", dim=4)
    b = mm_ops.decode_stub(b"hello world", dim=4)
    assert a == b and len(a) == 4
    assert math.isclose(sum(a), 1.0, rel_tol=1e-6)  # histogram normalized
    assert mm_ops.decode_stub(b"", dim=4) == [0.0] * 4
    with pytest.raises(NotImplementedError):
        mm_ops.decode_stub(b"x", strict=True)


def test_attach_and_extract_features(spark):
    docs = spark.createDataFrame(
        [(0, "aaaa"), (1, "bbbb"), (2, "cccc")], ["doc_id", "text"]
    )
    media = mm_ops.attach_binary_payload(docs, "text", "doc_id")
    assert sorted(r["modality"] for r in media.collect()) == ["audio", "image", "video"]
    feats = mm_ops.extract_features(media, dim=4)
    got = {r["media_id"]: r for r in feats.collect()}
    assert got[0]["n_bytes"] == 4
    # 'aaaa' = 4 bytes of 0x61; 0x61 % 4 == 1 → all mass in bucket 1
    assert got[0]["feature"] == [0.0, 1.0, 0.0, 0.0]
    assert feats.schema == mm_ops.FEATURE_SCHEMA


def test_resize_images_stride_samples_to_target_shape(spark):
    media = spark.createDataFrame(
        [(1, "image", bytearray(b"abcdefgh")), (2, "audio", bytearray(b"xy")),
         (3, "image", bytearray(b""))],
        ["media_id", "modality", "payload"],
    )
    out = {r["media_id"]: r for r in mm_ops.resize_images(media, 2, 2).collect()}
    assert set(out) == {1, 3}                      # non-image rows never reach Python
    assert len(out[1]["payload"]) == 4             # target_w * target_h bytes
    assert out[1]["payload"] == b"aceg"            # stride-2 nearest-neighbour
    assert out[1]["width"] == 2 and out[1]["height"] == 2
    assert out[3]["payload"] == bytes(4)           # empty payload → zero bytes


def test_resize_stub_strict_raises():
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        mm_ops.resize_stub(b"abc", 2, 2, strict=True)


def test_sample_frames(spark):
    media = spark.createDataFrame(
        [(1, "video", 3000), (2, "image", None)], ["media_id", "modality", "duration_ms"]
    )
    frames = mm_ops.sample_frames(media, every_ms=1000)
    got = [r["frame_ts_ms"] for r in frames.collect()]
    assert got == [0, 1000, 2000, 3000]  # image row filtered out


def test_write_range_clustered_files_are_disjoint(spark, tmp_path):
    """Range clustering must yield parquet files whose min/max ranges
    on the cluster column are disjoint — the property every engine's
    footer-based pruning relies on."""
    import glob

    import pyarrow.parquet as pq

    from big_data_ml_pipeline_spark.sources.writers import write_range_clustered

    li = load_table(spark, SF0001, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_shipdate"
    )
    out = str(tmp_path / "clustered")
    write_range_clustered(li, out, "l_orderkey", num_files=8)

    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.read_metadata(f)
        idx = md.schema.names.index("l_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2  # actually clustered into several files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (boundary equality allowed)
    # Round-trips with full fidelity.
    back = spark.read.parquet(out)
    assert back.count() == li.count()


# ---------------------------------------------------------------------------
# Structured Streaming
# ---------------------------------------------------------------------------

def test_events_stream_ntz_contract_on_driver_parquet(spark):
    """VERDICT r4 #7: the streaming path must read the ACTUAL driver
    parquet (whatever its current timestamp vintage) and produce the
    exact same µs instants — and therefore the same window boundaries —
    as the batch path. Value-level check on every event."""
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    probed = stream_ops.events_file_schema(spark, SF0001)
    # The probe must resolve to one of the two known vintages.
    assert isinstance(probed["ts"].dataType, (LongType, TimestampNTZType))

    stream = stream_ops.read_events_stream(spark, SF0001)
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    got = stream_ops.run_to_memory(
        stream.select("event_id", F.unix_micros("ts").alias("us"))
    )
    want = load_table(spark, SF0001, "events").select(
        "event_id", F.unix_micros("ts").alias("us")
    )
    g = sorted((r["event_id"], r["us"]) for r in got.collect())
    w = sorted((r["event_id"], r["us"]) for r in want.collect())
    assert len(g) > 0 and g == w


def test_events_stream_reads_nanos_vintage(spark, tmp_path):
    """The OTHER generator vintage: a TIMESTAMP(NANOS) events file
    surfaces ts as BIGINT under nanosAsLong; the schema probe must pick
    LongType and normalization must still yield exact µs instants."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import LongType, TimestampType

    base = 1_700_000_000_000_000_000  # epoch ns
    ts_ns = [base + i * 1_500_000_000 for i in range(5)]
    table = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "ts": pa.array(ts_ns, pa.timestamp("ns")),
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(["click"] * 5),
            "value": pa.array([1.0] * 5, pa.float64()),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    probed = stream_ops.events_file_schema(spark, str(tmp_path))
    assert isinstance(probed["ts"].dataType, LongType)
    stream = stream_ops.read_events_stream(spark, str(tmp_path))
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    got = sorted(
        r["us"]
        for r in stream_ops.run_to_memory(
            stream.select(F.unix_micros("ts").alias("us"))
        ).collect()
    )
    assert got == [t // 1000 for t in ts_ns]


def test_streaming_corpus_ingestion_quality_and_cross_batch_dedup(spark, tmp_path):
    """Incremental corpus ingestion: quality gate per micro-batch,
    within-batch exact dedup, and cross-batch dedup whose state is the
    landed corpus itself (anti-join on the fingerprint column)."""
    import os
    import time

    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    good1 = "the cat and a dog ran to of the barn fast today"
    good2 = "the fox and a hen walked to of the pond slowly now"
    good3 = "the owl and a bat flew to of the tower quietly tonight"
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shard1 = spark.createDataFrame(
        [(1, good1, "en"), (2, good2, "en"), (3, good2.upper(), "en")],
        ["doc_id", "text", "lang"],
    )  # 3 duplicates 2 after case-fold normalization -> within-batch dedup
    shard2 = spark.createDataFrame(
        [
            (10, good1, "en"),  # cross-batch duplicate of doc 1 -> dropped
            (11, "tiny", "en"),  # fails min_tokens -> gated
            (12, good3, "en"),  # fresh -> lands
        ],
        ["doc_id", "text", "lang"],
    )
    # Land the shards as two separate files with ordered mtimes so the
    # file source replays them as two micro-batches in order.
    for i, shard in enumerate([shard1, shard2]):
        p = str(in_dir / f"shard{i}.parquet")
        shard.toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = corpus_ops.read_documents_stream(spark, str(in_dir))
    assert stream.isStreaming
    corpus_ops.ingest_documents_stream(
        stream, out_dir, ckpt, min_tokens=5
    )
    landed = spark.read.parquet(out_dir)
    assert set(landed.columns) == {"doc_id", "text", "lang", "fp"}
    got = sorted(r["doc_id"] for r in landed.collect())
    assert got == [1, 2, 12]

    # Driver-dir mode: the glob narrows to documents.parquet so sibling
    # tables don't pollute the stream; replay count == batch count.
    sf_stream = corpus_ops.read_documents_stream(spark, SF0001)
    n = stream_ops.run_to_memory(sf_stream.select("doc_id")).count()
    assert n == load_table(spark, SF0001, "documents").count()


def test_streaming_corpus_ingestion_near_dup_index(spark, tmp_path):
    """Near-dup ingestion: each batch is screened against the
    incrementally-maintained MinHash index, within-batch near-dups
    collapse to one representative, and the index itself lands as a
    parquet table next to the corpus."""
    import os
    import time

    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "to the old barn where it hides from the rain all day long")
    other = ("a completely different story about query engines and columnar "
            "formats written with care for the reader and full of detail")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shard1 = spark.createDataFrame(
        [(1, base, "en"), (2, base + " tonight", "en"), (3, other, "en")],
        ["doc_id", "text", "lang"],
    )  # 1 and 2 are near-dups WITHIN the first batch -> 2 dropped
    fresh = ("meanwhile the harbor lights flicker as ships unload crates "
             "of spice and sailors trade maps beneath the crescent moon")
    shard2 = spark.createDataFrame(
        [(10, base + " again", "en"),  # near-dup of landed doc 1 -> dropped
         (11, fresh, "en")],  # genuinely new -> lands
        ["doc_id", "text", "lang"],
    )
    for i, shard in enumerate([shard1, shard2]):
        p = str(in_dir / f"shard{i}.parquet")
        shard.toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    out_dir, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    stream = corpus_ops.read_documents_stream(spark, str(in_dir))
    corpus_ops.ingest_documents_stream(
        stream, out_dir, ckpt, min_tokens=5, near_dup_threshold=0.5
    )
    landed = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    )
    assert landed == [1, 3, 11]
    # The index table tracks exactly the landed docs.
    idx_ids = {
        r["id"] for r in spark.read.parquet(out_dir + "_minhash_index").collect()
    }
    assert idx_ids == {1, 3, 11}


def test_streaming_ingest_crash_between_corpus_and_index_writes(
    spark, tmp_path, monkeypatch
):
    """Failure injection for the corpus-before-index write order
    (VERDICT r6 item 4): kill the batch AFTER the corpus (and vocab)
    append but BEFORE the index append, replay it, and assert zero
    lost docs, zero duplicate docs, and vocab partials not
    double-appended. The at-least-once replay self-heals because the
    landed corpus — not the index — is the dedup state."""
    import os
    import time

    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from big_data_ml_pipeline_spark.operators import dedup as dedup_mod
    from big_data_ml_pipeline_spark.operators.text import token_counts
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "to the old barn where it hides from the rain all day long")
    other = ("a completely different story about query engines and columnar "
             "formats written with care for the reader and full of detail")
    fresh = ("meanwhile the harbor lights flicker as ships unload crates "
             "of spice and sailors trade maps beneath the crescent moon")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shard1 = spark.createDataFrame(
        [(1, base, "en"), (2, other, "en")], ["doc_id", "text", "lang"]
    )
    shard2 = spark.createDataFrame(
        [(10, base, "en"),   # exact dup of landed doc 1 -> must drop
         (11, fresh, "en")],  # novel -> must land exactly once
        ["doc_id", "text", "lang"],
    )
    for i, shard in enumerate([shard1, shard2]):
        p = str(in_dir / f"shard{i}.parquet")
        shard.toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    real_index = dedup_mod.minhash_index
    calls = {"n": 0}

    def exploding_index(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash between corpus and index writes")
        return real_index(*a, **k)

    monkeypatch.setattr(dedup_mod, "minhash_index", exploding_index)

    out_dir, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    with _pytest.raises(StreamingQueryException, match="injected crash"):
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out_dir, ckpt, apply_quality=False,
            near_dup_threshold=0.5, maintain_vocab=True,
        )
    # The crash window is real: corpus + vocab landed, index did not.
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    ) == [1, 2]
    assert not os.path.exists(out_dir + "_minhash_index")

    # Restart with the SAME checkpoint: batch 0 was never committed, so
    # it replays; the corpus anti-join drops its already-landed rows.
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out_dir, ckpt, apply_quality=False,
        near_dup_threshold=0.5, maintain_vocab=True,
    )
    landed = [r["doc_id"] for r in spark.read.parquet(out_dir).collect()]
    # Zero lost, zero duplicated — despite the replay.
    assert sorted(landed) == [1, 2, 11]
    assert len(landed) == len(set(landed))
    # Vocab partials were appended once by the crashed attempt and NOT
    # re-appended on replay: the rolled summary equals a fresh count of
    # the landed corpus exactly.
    vocab = {
        r["token"]: r["cnt"]
        for r in spark.read.parquet(out_dir + "_vocab")
        .groupBy("token").agg(F.sum("cnt").alias("cnt")).collect()
    }
    expect = {
        r["token"]: r["cnt"]
        for r in token_counts(spark.read.parquet(out_dir), "text").collect()
    }
    assert vocab == expect
    # The index heals on replay: batch 0's rows are missing until the
    # next compaction (documented), but batch 1's landed doc is indexed
    # and no id appears with duplicate band rows.
    idx = spark.read.parquet(out_dir + "_minhash_index")
    per_band = (
        idx.groupBy("id", "band").count().filter(F.col("count") > 1).count()
    )
    assert per_band == 0
    assert {r["id"] for r in idx.select("id").distinct().collect()} == {11}


def test_streaming_ingest_quality_gate_disabled(spark, tmp_path):
    """apply_quality=False skips the gate entirely (ADVICE r5: the
    config path maps ingest_quality_rules=None here, mirroring the
    batch pipeline's quality_rules=None = no gate); exact dedup still
    runs."""
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shard = spark.createDataFrame(
        [(1, "tiny", "en"), (2, "tiny", "en"), (3, "also short", "en")],
        ["doc_id", "text", "lang"],
    )
    shard.toPandas().to_parquet(str(in_dir / "shard0.parquet"), index=False)

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = corpus_ops.read_documents_stream(spark, str(in_dir))
    corpus_ops.ingest_documents_stream(
        stream, out_dir, ckpt, apply_quality=False
    )
    got = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 3]  # nothing gated; doc 2 exact-duped against 1


def test_streaming_ingest_compact_every_keeps_results(spark, tmp_path):
    """compact_every=1 rewrites the minhash index after every batch:
    landed corpus and screening outcomes are identical to the
    uncompacted run, while the index stays deduped and bounded
    (VERDICT r5 item 3 / ADVICE low)."""
    import glob
    import os
    import time

    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "to the old barn where it hides from the rain all day long")
    fresh = ("meanwhile the harbor lights flicker as ships unload crates "
             "of spice and sailors trade maps beneath the crescent moon")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shard1 = spark.createDataFrame(
        [(1, base, "en")], ["doc_id", "text", "lang"]
    )
    shard2 = spark.createDataFrame(
        [(10, base + " again", "en"),  # near-dup of landed doc 1 -> dropped
         (11, fresh, "en")],
        ["doc_id", "text", "lang"],
    )
    for i, shard in enumerate([shard1, shard2]):
        p = str(in_dir / f"shard{i}.parquet")
        shard.toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    out_dir, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    stream = corpus_ops.read_documents_stream(spark, str(in_dir))
    corpus_ops.ingest_documents_stream(
        stream, out_dir, ckpt, min_tokens=5, near_dup_threshold=0.5,
        compact_every=1,
    )
    landed = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert landed == [1, 11]  # same outcome as the uncompacted twin test
    idx_dir = out_dir + "_minhash_index"
    idx = spark.read.parquet(idx_dir)
    assert {r["id"] for r in idx.select("id").distinct().collect()} == {1, 11}
    assert idx.count() == idx.dropDuplicates(["id", "band", "bucket"]).count()
    assert not glob.glob(idx_dir + "__*")  # temp dirs cleaned up


def test_stream_tumbling_equals_batch(spark):
    """Replaying the events file through the watermarked streaming agg
    must reproduce the batch groupBy exactly (counts exact, sums fp-close)."""
    stream = stream_ops.read_events_stream(spark, SF0001)
    assert stream.isStreaming
    # complete mode: append would hold back windows newer than the final
    # watermark (max_ts - 2h), which is correct streaming semantics but
    # not comparable 1:1 against the batch result.
    got = stream_ops.run_to_memory(stream_ops.tumbling_counts(stream), output_mode="complete")
    want = (
        load_table(spark, SF0001, "events")
        .groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_bucket"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )
    g = {(r["hour_bucket"], r["event_type"]): (r["n"], r["total_value"])
         for r in got.collect()}
    w = {(r["hour_bucket"], r["event_type"]): (r["n"], r["total_value"])
         for r in want.collect()}
    assert g.keys() == w.keys() and len(g) > 0
    for k in w:
        assert g[k][0] == w[k][0]
        assert math.isclose(g[k][1], w[k][1], rel_tol=1e-9)


def test_stream_dedup_within_watermark(spark):
    stream = stream_ops.read_events_stream(spark, SF0001)
    deduped = stream_ops.stream_dedup(stream, ["user_id", "event_type"])
    got = stream_ops.run_to_memory(deduped)
    want = (
        load_table(spark, SF0001, "events")
        .select("user_id", "event_type").distinct().count()
    )
    assert got.count() == want


def test_stateful_running_totals_match_batch(spark):
    """applyInPandasWithState accumulator over the replayed stream must
    equal the batch per-user aggregate."""
    from big_data_ml_pipeline_spark.streaming.stateful import running_user_totals

    stream = stream_ops.read_events_stream(spark, SF0001)
    got = stream_ops.run_to_memory(running_user_totals(stream), output_mode="update")
    # update mode re-emits a row per trigger; keep the last per user
    final = (
        got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    want = (
        load_table(spark, SF0001, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    g = {r["user_id"]: r["n_events"] for r in final.collect()}
    w = {r["user_id"]: r["n_events"] for r in want.collect()}
    assert g == w


def test_stream_session_counts_runs(spark):
    stream = stream_ops.read_events_stream(spark, SF0001)
    got = stream_ops.run_to_memory(stream_ops.session_counts(stream))
    assert got.count() > 0
    assert got.columns == ["user_id", "n_events"]


def test_watermark_drops_late_events(spark, tmp_path):
    """Out-of-order replay that actually stresses the watermark
    (VERDICT r1 item #6: the sf0.001 replay is in-order, so the drop
    path never executed). Four files processed as separate micro-batches
    (maxFilesPerTrigger=1, ordered by mtime).

    Spark's watermark guarantee is one-directional: a too-late row is
    only provably dropped once its window's state has been EVICTED in
    an earlier batch — while state still exists, a late row may merge
    into it (verified empirically; numRowsDroppedByWatermark stays 0).
    The fixture therefore walks the watermark past W0=[00:00,00:05) and
    lets eviction happen a batch BEFORE the late row arrives:

      f1: a(00:00), b(00:01)            → W0 state n=2, watermark 1970
      f2: c(00:20)                      → batch wm still < W0 end
      f3: e(00:21)                      → batch wm 00:10 > W0 end:
                                          W0 evicted + emitted (n=2)
      f4: LATE(00:01, value 100), d(00:30)
          → wm 00:11; W0 state is gone, so the late row hits the
            pre-aggregation watermark filter (numRowsDroppedByWatermark
            = 1). If it weren't dropped it would re-open W0 and emit a
            duplicate (1, 100.0) row at the final watermark.

    The append-mode result must equal the batch twin over the on-time
    rows with the same cutoff (window end ≤ final watermark 00:20):
    exactly W0 — c/e/d windows are held back as still-open.
    """
    import os
    import time
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_file(name, rows, mtime):
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
        path = str(tmp_path / name)
        pq.write_table(t, path)
        os.utime(path, (mtime, mtime))

    base = 1_700_000_100  # multiple of 300s so windows align on base
    m = lambda mins: (base + 60 * mins) * 1_000_000  # µs timestamps
    now = time.time()
    write_file("f1.parquet", [(1, m(0), 1.0), (2, m(1), 2.0)], now - 100)
    write_file("f2.parquet", [(3, m(20), 4.0)], now - 80)
    write_file("f3.parquet", [(6, m(21), 16.0)], now - 60)
    write_file("f4.parquet", [(4, m(1), 100.0), (5, m(30), 8.0)], now - 40)

    schema = "event_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.unix_timestamp("w.start").alias("bucket"), "n", "total_value")
    )
    name = f"mem_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    got = {
        r["bucket"]: (r["n"], r["total_value"])
        for r in spark.table(name).collect()
    }

    # The engine itself must report exactly one watermark-dropped row.
    dropped = sum(
        (p.get("stateOperators") or [{}])[0].get("numRowsDroppedByWatermark", 0)
        for p in query.recentProgress
    )
    assert dropped == 1

    # Late row (event_id 4, value 100.0) dropped; c/e window [00:20,00:25)
    # and d's [00:30,00:35) held back by the final watermark (00:20).
    assert got == {base: (2, 3.0)}

    # Batch twin with the same cutoff over the on-time rows.
    on_time = spark.createDataFrame(
        [(1, m(0), 1.0), (2, m(1), 2.0), (3, m(20), 4.0), (6, m(21), 16.0), (5, m(30), 8.0)],
        "event_id long, ts_us long, value double",
    ).select("event_id", F.timestamp_micros("ts_us").alias("ts"), "value")
    cutoff = base + 20 * 60
    want = {
        r["bucket"]: (r["n"], r["total_value"])
        for r in (
            on_time.groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
            .select(F.unix_timestamp("w.start").alias("bucket"), "n", "total_value")
            .filter(F.unix_timestamp(F.col("w.end")) <= cutoff)
        ).collect()
    }
    assert got == want


def test_stream_parquet_sink_round_trip(spark, tmp_path):
    """Stream → partitioned parquet sink → read back. The raw replay
    (stateless append) must land every event exactly once; re-running
    with the same checkpoint must be a no-op (exactly-once sink
    metadata), and the partition column must be prunable on read."""
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    stream = stream_ops.read_events_stream(spark, SF0001).withColumn(
        "event_date", F.to_date("ts")
    )
    stream_ops.run_to_parquet(stream, out, cp, partition_by=["event_type"])

    back = spark.read.parquet(out)
    want = load_table(spark, SF0001, "events")
    assert back.count() == want.count()
    assert sorted(r["event_id"] for r in back.select("event_id").collect()) == sorted(
        r["event_id"] for r in want.select("event_id").collect()
    )

    # exactly-once: same checkpoint, no new input → no duplicates
    stream2 = stream_ops.read_events_stream(spark, SF0001).withColumn(
        "event_date", F.to_date("ts")
    )
    stream_ops.run_to_parquet(stream2, out, cp, partition_by=["event_type"])
    assert spark.read.parquet(out).count() == want.count()

    # partition pruning reaches the scan
    one_type = back.select("event_type").first()["event_type"]
    plan = (
        spark.read.parquet(out)
        .filter(F.col("event_type") == one_type)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_foreach_batch_overwrite_idempotent(spark, tmp_path):
    """Replaying the stream with a FRESH checkpoint (simulating
    checkpoint loss / retry) must converge to the same output, not
    append duplicates — dynamic partition overwrite per micro-batch."""
    out = str(tmp_path / "out")
    want = load_table(spark, SF0001, "events").count()

    for attempt in range(2):
        stream = stream_ops.read_events_stream(spark, SF0001)
        stream_ops.run_foreach_batch_overwrite(
            stream, out, str(tmp_path / f"cp{attempt}"), "event_type"
        )
        assert spark.read.parquet(out).count() == want, f"attempt {attempt}"


def test_json_corrupt_record_modes(spark, tmp_path):
    """Dirty-input contract for the JSON source: PERMISSIVE captures the
    broken line in a corrupt-record column; DROPMALFORMED drops it —
    the knobs a 100 TB ingest of scraped data lives on."""
    p = tmp_path / "dirty.json"
    p.write_text('{"k": 1, "v": "a"}\n{"k": broken!!\n{"k": 3, "v": "c"}\n')

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([
        StructField("k", LongType()),
        StructField("v", StringType()),
        StructField("_bad", StringType()),
    ])
    permissive = load_data(
        spark, str(p), fmt="json", schema=schema,
        mode="PERMISSIVE", columnNameOfCorruptRecord="_bad",
    )
    rows = permissive.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_bad"] is not None]
    assert len(bad) == 1 and "broken" in bad[0]["_bad"]

    dropped = load_data(
        spark, str(p), fmt="json",
        schema=StructType(schema.fields[:2]), mode="DROPMALFORMED",
    )
    assert sorted(r["k"] for r in dropped.collect()) == [1, 3]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across parquet files: mergeSchema unifies old
    (k) and new (k, extra) file schemas, nulling the missing column —
    how a long-lived 100 TB table gains columns without rewrites."""
    base = tmp_path / "evolving.parquet"
    spark.createDataFrame([(1,)], "k long").write.parquet(str(base / "gen=1"))
    spark.createDataFrame([(2, "new")], "k long, extra string").write.parquet(
        str(base / "gen=2")
    )
    merged = load_data(spark, str(base), fmt="parquet", mergeSchema="true")
    got = {r["k"]: r["extra"] for r in merged.select("k", "extra").collect()}
    assert got == {1: None, 2: "new"}


def test_stream_static_enrich_equals_batch(spark):
    """Stream-static broadcast join must reproduce the batch join."""
    dim = spark.createDataFrame(
        [(i, f"segment_{i % 3}") for i in range(200)], "user_id long, segment string"
    )
    stream = stream_ops.read_events_stream(spark, SF0001)
    got = stream_ops.run_to_memory(
        stream_ops.enrich_with_dim(stream, dim, "user_id").select(
            "event_id", "segment"
        )
    )
    want = (
        load_table(spark, SF0001, "events")
        .join(dim, "user_id", "left")
        .select("event_id", "segment")
    )
    g = sorted((r["event_id"], r["segment"]) for r in got.collect())
    w = sorted((r["event_id"], r["segment"]) for r in want.collect())
    assert g == w and len(g) > 0


def test_stream_stream_join_equals_batch_interval_join(spark):
    """Watermarked stream-stream interval join == the batch join with
    the identical time-bound condition (in-order replay → nothing is
    dropped, so results must match exactly)."""
    ev = stream_ops.read_events_stream(spark, SF0001)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    joined = stream_ops.stream_stream_join(
        purchases, clicks.withColumnRenamed("c_user", "user_id"),
        key="user_id", left_ts="p_ts", right_ts="c_ts", max_delay_seconds=1800,
    ).select("p_id", "c_id")
    got = sorted(
        (r["p_id"], r["c_id"]) for r in stream_ops.run_to_memory(joined).collect()
    )

    bev = load_table(spark, SF0001, "events")
    bp = bev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    bc = bev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    want = sorted(
        (r["p_id"], r["c_id"])
        for r in bp.join(
            bc,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts"))
            & (F.col("c_ts") <= F.col("p_ts") + F.expr("INTERVAL 1800 SECONDS")),
        ).select("p_id", "c_id").collect()
    )
    assert got == want and len(got) > 0


def test_stream_checkpoint_incremental_resume(spark, tmp_path):
    """Restarting against the same checkpoint processes ONLY files that
    arrived since the last run — offsets carry across process
    lifetimes, so a nightly availableNow run is an incremental ingest,
    not a re-read of the lake."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src, out, cp = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "cp")
    src.mkdir()

    def add_file(name, ids):
        pq.write_table(pa.table({"event_id": pa.array(ids, pa.int64())}), str(src / name))

    def run():
        stream = spark.readStream.schema("event_id long").parquet(str(src))
        stream_ops.run_to_parquet(stream, out, cp)

    add_file("f1.parquet", [1, 2, 3])
    run()
    assert sorted(r["event_id"] for r in spark.read.parquet(out).collect()) == [1, 2, 3]

    add_file("f2.parquet", [4, 5])
    run()
    assert sorted(r["event_id"] for r in spark.read.parquet(out).collect()) == [1, 2, 3, 4, 5]


def test_write_jsonl_shards_roundtrip_and_layout(spark, tmp_path):
    """The JSONL corpus export lands shard=K dirs of newline-delimited
    JSON whose membership and in-shard order are content-deterministic
    (same contract as the parquet training-shard sink)."""
    import glob
    import json as _json

    from big_data_ml_pipeline_spark.sources.writers import write_jsonl_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "jsonl")
    write_jsonl_shards(docs, out, key_cols=["doc_id"], n_shards=4)
    # Layout: shard=K dirs, every data file newline-delimited JSON.
    shard_dirs = sorted(glob.glob(out + "/shard=*"))
    assert [d.rsplit("=", 1)[1] for d in shard_dirs] == ["0", "1", "2", "3"]
    a_file = glob.glob(shard_dirs[0] + "/*.json")[0]
    with open(a_file) as fh:
        first = _json.loads(fh.readline())
    assert {"doc_id", "text", "pos"} <= set(first)
    # Round-trip: the json reader recovers every row.
    back = spark.read.json(out)
    assert back.count() == docs.count()
    assert set(r["doc_id"] for r in back.select("doc_id").collect()) == set(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    # Determinism: a re-export over repartitioned input produces the
    # identical (shard, pos, doc_id) assignment.
    out2 = str(tmp_path / "jsonl2")
    write_jsonl_shards(docs.repartition(7), out2, key_cols=["doc_id"], n_shards=4)
    a = {(r["shard"], r["pos"], r["doc_id"]) for r in spark.read.json(out).collect()}
    b = {(r["shard"], r["pos"], r["doc_id"]) for r in spark.read.json(out2).collect()}
    assert a == b


def test_streaming_embedding_ingestion_semantic_dedup(spark, tmp_path):
    """Streaming SemDeDup: exact duplicates drop via the vector
    fingerprint, within-batch cosine twins collapse to the min-id
    representative, cross-batch twins drop against the landed
    cell-tagged corpus, and a replayed shard (same vectors, new file)
    lands nothing."""
    import os
    import time

    from big_data_ml_pipeline_spark.streaming import embeddings as se

    def unit(*xs):
        import math as m
        n = m.sqrt(sum(x * x for x in xs))
        return [float(x / n) for x in xs]

    e1 = unit(1.0, 0.0, 0.0, 0.0)
    e2 = unit(0.0, 1.0, 0.0, 0.0)
    e1_near = unit(1.0, 0.05, 0.0, 0.0)   # cos ~0.999 with e1
    e3 = unit(0.0, 0.0, 1.0, 0.0)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shard1 = spark.createDataFrame(
        [(1, e1, 0), (2, e2, 0), (3, e1, 0)],  # 3 = exact dup of 1
        ["vec_id", "embedding", "label"],
    )
    shard2 = spark.createDataFrame(
        [
            (10, e1, 0),       # exact cross-batch dup -> dropped
            (11, e1_near, 0),  # semantic cross-batch dup -> dropped
            (12, e3, 0),       # novel -> lands
        ],
        ["vec_id", "embedding", "label"],
    )
    shard3 = spark.createDataFrame(  # full replay of shard1's vectors
        [(20, e1, 0), (21, e2, 0)],
        ["vec_id", "embedding", "label"],
    )
    for i, shard in enumerate([shard1, shard2, shard3]):
        p = str(in_dir / f"shard{i}.parquet")
        shard.toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = se.read_embeddings_stream(spark, str(in_dir))
    assert stream.isStreaming
    se.ingest_embeddings_stream(
        stream, out_dir, ckpt, centroids=cents, threshold=0.95
    )
    landed = spark.read.parquet(out_dir)
    assert set(landed.columns) == {"vec_id", "v", "cell", "fp"}
    got = sorted(r["vec_id"] for r in landed.collect())
    assert got == [1, 2, 12]
    # Cells are the argmax assignment of the deterministic centroids.
    cells = {r["vec_id"]: r["cell"] for r in landed.collect()}
    assert cells == {1: 0, 2: 1, 12: 2}


def test_recover_interrupted_swap_state_machine(tmp_path):
    """Every reachable crash state of the compaction swap maps to a
    recovery that restores 'path holds a complete state table'
    (ADVICE r6 — two os.rename calls are not atomic)."""
    import os

    from big_data_ml_pipeline_spark.sources.state import (
        OLD_SUFFIX,
        TMP_SUFFIX,
        atomic_swap_dirs,
        recover_interrupted_swap,
    )

    def mk(name, tag):
        d = tmp_path / name
        d.mkdir()
        (d / "marker").write_text(tag)
        return str(d)

    def tag(path):
        with open(os.path.join(path, "marker")) as fh:
            return fh.read()

    # Happy path: swap promotes tmp, retires old, cleans up.
    p = mk("a", "old-data")
    mk("a" + TMP_SUFFIX, "new-data")
    atomic_swap_dirs(p)
    assert tag(p) == "new-data"
    assert not os.path.exists(p + TMP_SUFFIX) and not os.path.exists(p + OLD_SUFFIX)

    # Crash between the renames: path missing, old+tmp present → finish.
    mk("b" + OLD_SUFFIX, "old-data")
    mk("b" + TMP_SUFFIX, "new-data")
    assert recover_interrupted_swap(str(tmp_path / "b")) == "finished interrupted swap"
    assert tag(str(tmp_path / "b")) == "new-data"

    # Crash mid-rewrite: path + stale tmp → drop tmp, keep path.
    p = mk("c", "live")
    mk("c" + TMP_SUFFIX, "half-written")
    assert "dropped stale rewrite" in recover_interrupted_swap(p)
    assert tag(p) == "live" and not os.path.exists(p + TMP_SUFFIX)

    # Crash after swap, before cleanup: path + old → drop old.
    p = mk("d", "new-data")
    mk("d" + OLD_SUFFIX, "old-data")
    assert "dropped retired copy" in recover_interrupted_swap(p)
    assert tag(p) == "new-data" and not os.path.exists(p + OLD_SUFFIX)

    # Only the retired copy survives → roll back.
    mk("e" + OLD_SUFFIX, "old-data")
    assert recover_interrupted_swap(str(tmp_path / "e")) == "rolled back interrupted swap"
    assert tag(str(tmp_path / "e")) == "old-data"

    # Consistent state (or nothing at all) → no-op.
    assert recover_interrupted_swap(mk("f", "live")) is None
    assert recover_interrupted_swap(str(tmp_path / "ghost")) is None


def test_embedding_ingest_repairs_crashed_compaction(spark, tmp_path):
    """A crash between the compaction swap's two renames leaves the
    landed table missing; since that table IS the dedup state, a
    restarted stream used to see landed=None and re-ingest duplicates.
    ingest_embeddings_stream now repairs the swap before its first
    batch (ADVICE r6)."""
    import os
    import shutil
    import time

    from big_data_ml_pipeline_spark.sources.state import OLD_SUFFIX, TMP_SUFFIX
    from big_data_ml_pipeline_spark.streaming import embeddings as se

    def unit(*xs):
        import math as m
        n = m.sqrt(sum(x * x for x in xs))
        return [float(x / n) for x in xs]

    e1, e2, e3 = unit(1, 0, 0, 0), unit(0, 1, 0, 0), unit(0, 0, 1, 0)
    cents = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0]]
    in1 = tmp_path / "in1"
    in1.mkdir()
    spark.createDataFrame(
        [(1, e1, 0), (2, e2, 0)], ["vec_id", "embedding", "label"]
    ).toPandas().to_parquet(str(in1 / "s0.parquet"), index=False)
    out = str(tmp_path / "out")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, str(in1)), out,
        str(tmp_path / "ck1"), centroids=cents, threshold=0.95,
    )
    assert sorted(r["vec_id"] for r in spark.read.parquet(out).collect()) == [1, 2]

    # Simulate the crash window: the compacted rewrite is complete in
    # __compacting, the live dir was renamed aside — and the process
    # died before the second rename.
    shutil.copytree(out, out + TMP_SUFFIX)
    os.rename(out, out + OLD_SUFFIX)
    assert not os.path.exists(out)

    in2 = tmp_path / "in2"
    in2.mkdir()
    p = str(in2 / "s1.parquet")
    spark.createDataFrame(
        [(10, e1, 0), (11, e3, 0)],  # 10 duplicates landed vec 1
        ["vec_id", "embedding", "label"],
    ).toPandas().to_parquet(p, index=False)
    os.utime(p, (time.time() + 5, time.time() + 5))
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, str(in2)), out,
        str(tmp_path / "ck2"), centroids=cents, threshold=0.95,
    )
    landed = sorted(r["vec_id"] for r in spark.read.parquet(out).collect())
    # Recovery restored {1, 2}; the exact duplicate 10 was screened out.
    assert landed == [1, 2, 11]
    assert not os.path.exists(out + TMP_SUFFIX)
    assert not os.path.exists(out + OLD_SUFFIX)


def test_streaming_embedding_compaction_preserves_state(spark, tmp_path):
    """compact_every rewrites the landed corpus range-clustered on
    cell; the surviving set and the post-compaction screen behavior
    are unchanged."""
    import os
    import time

    from big_data_ml_pipeline_spark.streaming import embeddings as se

    dim = 4
    vecs = [(i, [1.0 if j == i % dim else 0.1 * i for j in range(dim)], 0)
            for i in range(8)]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(4):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(vecs[i * 2:(i + 1) * 2],
                              ["vec_id", "embedding", "label"]
                              ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))
    cents = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0]]
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, str(in_dir)), out_a,
        str(tmp_path / "cka"), centroids=cents, threshold=0.98,
    )
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, str(in_dir)), out_b,
        str(tmp_path / "ckb"), centroids=cents, threshold=0.98,
        compact_every=2,
    )
    a = sorted((r["vec_id"], r["cell"]) for r in spark.read.parquet(out_a).collect())
    b = sorted((r["vec_id"], r["cell"]) for r in spark.read.parquet(out_b).collect())
    assert a == b
    assert len(os.listdir(out_b)) <= len(os.listdir(out_a))


def test_write_zorder_concentrates_both_columns(spark, tmp_path):
    """Z-order layout: with two independent high-cardinality columns,
    every file's footer min/max range is materially narrower than the
    global range on BOTH columns — single-column range clustering
    leaves the second column spanning ~everything per file."""
    import glob

    import pyarrow.parquet as pq

    from big_data_ml_pipeline_spark.sources.writers import (
        write_range_clustered,
        write_zorder,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )

    def mean_span(path, col, lo, hi):
        spans = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.read_metadata(f)

            def stat(i, which):
                names = [md.row_group(i).column(j).path_in_schema
                         for j in range(md.row_group(i).num_columns)]
                s = md.row_group(i).column(names.index(col)).statistics
                return s.min if which == "min" else s.max

            cmin = min(stat(i, "min") for i in range(md.num_row_groups))
            cmax = max(stat(i, "max") for i in range(md.num_row_groups))
            spans.append((cmax - cmin) / (hi - lo))
        return sum(spans) / len(spans)

    lo_o, hi_o, lo_p, hi_p = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).collect()[0]

    z_dir = str(tmp_path / "z")
    write_zorder(li, z_dir, ["l_orderkey", "l_partkey"],
                 bits_per_col=4, num_files=16)
    r_dir = str(tmp_path / "r")
    write_range_clustered(li, r_dir, "l_orderkey", num_files=16)

    # Both columns concentrate under Z-order...
    assert mean_span(z_dir, "l_orderkey", lo_o, hi_o) < 0.5
    assert mean_span(z_dir, "l_partkey", lo_p, hi_p) < 0.5
    # ...while range clustering concentrates only its own column.
    assert mean_span(r_dir, "l_orderkey", lo_o, hi_o) < 0.2
    assert mean_span(r_dir, "l_partkey", lo_p, hi_p) > 0.8
    # No rows lost, helper column dropped.
    back = spark.read.parquet(z_dir)
    assert back.count() == li.count() and set(back.columns) == {"l_orderkey", "l_partkey"}


def test_write_zorder_bit_budget(spark, tmp_path):
    """ADVICE r6: bits_per_col × n_cols must fit in a long's 63 value
    bits. 8 columns at the default 8 bits auto-reduces (to 7) instead
    of pushing bucket bits into the sign bit; an impossible column
    count raises."""
    import pytest as _pytest

    from big_data_ml_pipeline_spark.sources.writers import write_zorder

    cols = [f"c{i}" for i in range(8)]
    df = spark.range(2000).select(
        *[(F.col("id") * (i + 3) % 997).cast("double").alias(c)
          for i, c in enumerate(cols)]
    )
    out = str(tmp_path / "z8")
    write_zorder(df, out, cols, num_files=8)  # default bits_per_col=8
    back = spark.read.parquet(out)
    assert back.count() == 2000 and set(back.columns) == set(cols)
    with _pytest.raises(ValueError):
        write_zorder(df, str(tmp_path / "z64"), [f"x{i}" for i in range(64)])


def test_text_and_jsonl_reader_dispatch(spark, tmp_path):
    """Raw-corpus entry formats: .txt reads line-per-row (column
    `value`), .jsonl dispatches to the json reader."""
    from big_data_ml_pipeline_spark.sources.readers import load_data

    t = tmp_path / "corpus.txt"
    t.write_text("first line\nsecond line\n")
    df = load_data(spark, str(t))
    assert df.columns == ["value"] and df.count() == 2
    j = tmp_path / "docs.jsonl"
    j.write_text('{"doc_id": 1, "text": "a"}\n{"doc_id": 2, "text": "b"}\n')
    back = load_data(spark, str(j))
    assert back.count() == 2 and {"doc_id", "text"} <= set(back.columns)


def test_streaming_corpus_drift_tracking(spark, tmp_path):
    """track_drift=True lands one row per micro-batch in {out}_drift:
    batch 0 (empty corpus) records jsd 1.0; a batch replaying the same
    distribution records jsd ~0; a distribution-shifted batch records
    a materially higher jsd."""
    import os
    import time

    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    base = "the cat and a dog ran to of the barn fast today"
    shifted = "zonk quix blerg flom zonk quix blerg flom zonk quix blerg"
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shards = [
        [(1, base + " one", "en")],
        [(10, base + " two", "en")],       # same distribution -> low jsd
        [(20, shifted + " three", "en")],  # shifted vocabulary -> high jsd
    ]
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(rows, ["doc_id", "text", "lang"]
                              ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, ckpt, apply_quality=False, track_drift=True,
    )
    drift = {r["batch_id"]: r for r in
             spark.read.parquet(out + "_drift").collect()}
    assert sorted(drift) == [0, 1, 2]
    assert drift[0]["n_landed_docs"] == 0 and drift[0]["jsd_bits"] == 1.0
    assert drift[1]["jsd_bits"] < 0.2            # same distribution
    assert drift[2]["jsd_bits"] > 0.6            # shifted vocabulary
    assert drift[2]["n_landed_docs"] == 2
    # Corpus itself is unaffected by the observability writes.
    assert spark.read.parquet(out).count() == 3


def test_streaming_ingest_orphan_index_rows_are_benign(spark, tmp_path):
    """Orphan-index robustness (the ADVICE r5 ordering invariant's
    failure mode): index rows whose document never landed (crash after
    the index append) must neither crash ingestion nor block NOVEL
    content. Near-identical content IS still screened by the orphan
    rows — the index cannot distinguish orphan from landed, and
    over-screening a true near-dup is the benign direction; losing a
    novel document would not be."""
    import os
    import time

    from big_data_ml_pipeline_spark.operators.dedup import minhash_index
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    text = ("the quick brown fox jumps over the lazy dog and runs far away "
            "to the old barn where it hides from the rain all day long")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    p = str(in_dir / "s0.parquet")
    spark.createDataFrame([(5, text, "en")], ["doc_id", "text", "lang"]
                          ).toPandas().to_parquet(p, index=False)
    os.utime(p, (time.time(), time.time()))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # Simulate the orphan: index rows exist for doc 99 (same content),
    # but doc 99 never landed in the corpus.
    orphan = spark.createDataFrame([(99, text, "en")], ["doc_id", "text", "lang"])
    minhash_index(orphan, "text", "doc_id").write.mode("overwrite").parquet(
        out + "_minhash_index"
    )
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, ckpt, apply_quality=False, near_dup_threshold=0.9,
    )
    landed = [r["doc_id"] for r in spark.read.parquet(out).collect()]
    # The orphaned index rows DO match the arriving near-identical doc
    # (that is what the index is for) — but the corpus is the source of
    # truth for exact dedup, and the doc is new there. The near-dup
    # screen drops it only because est_jaccard(identical) >= 0.9.
    # The contract we pin: the pipeline never crashes on orphan rows,
    # and the outcome is deterministic. With identical content the doc
    # is screened (the index cannot distinguish orphan from landed).
    assert landed == []
    # A genuinely novel document still lands against the orphaned index.
    p2 = str(in_dir / "s1.parquet")
    spark.createDataFrame(
        [(6, "completely different words about query engines and columnar "
             "formats written with care and detail for readers", "en")],
        ["doc_id", "text", "lang"],
    ).toPandas().to_parquet(p2, index=False)
    os.utime(p2, (time.time() + 1, time.time() + 1))
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, str(tmp_path / "ckpt2"), apply_quality=False,
        near_dup_threshold=0.9,
    )
    landed = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert landed == [6]


def test_streaming_embedding_drift_tracking(spark, tmp_path):
    """Embedding-path drift: per-batch cell-histogram JSD vs the
    landed corpus — same-cell batches score ~0, a batch landing in a
    disjoint cell scores 1."""
    import os
    import time

    from big_data_ml_pipeline_spark.streaming import embeddings as se

    e0 = [1.0, 0.0, 0.0, 0.0]
    e0b = [0.8, 0.6, 0.0, 0.0]   # same cell as e0, cos 0.8 (below screen)
    e2 = [0.0, 0.0, 1.0, 0.0]    # different cell
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shards = [
        [(1, e0, 0)],
        [(2, e0b, 0)],   # same cell distribution -> jsd 0
        [(3, e2, 0)],    # disjoint cell -> jsd 1
    ]
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(rows, ["vec_id", "embedding", "label"]
                              ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))
    cents = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0]]
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, str(in_dir)), out, ckpt,
        centroids=cents, threshold=0.99, track_drift=True,
    )
    drift = {r["batch_id"]: r for r in
             spark.read.parquet(out + "_drift").collect()}
    assert sorted(drift) == [0, 1, 2]
    assert drift[0]["n_landed_vecs"] == 0 and drift[0]["jsd_bits"] == 1.0
    assert abs(drift[1]["jsd_bits"]) < 1e-9      # same single cell
    assert abs(drift[2]["jsd_bits"] - 1.0) < 1e-9  # disjoint cell
    assert sorted(r["vec_id"] for r in spark.read.parquet(out).collect()) == [1, 2, 3]


def test_streaming_vocab_maintenance_and_compaction(spark, tmp_path):
    """maintain_vocab: the appended (token, cnt) partials re-aggregate
    to EXACTLY the landed corpus's token counts; compaction folds to
    one row per token without changing the sums; drift-from-vocab
    equals drift-from-corpus."""
    import os
    import time

    from collections import Counter

    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    texts = [
        "alpha beta gamma alpha",
        "beta delta epsilon beta beta",
        "zeta eta theta zeta",
        "iota kappa lambda iota",
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, t in enumerate(texts):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame([(i, t, "en")], ["doc_id", "text", "lang"]
                              ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, ckpt, apply_quality=False,
        maintain_vocab=True, track_drift=True, compact_every=2,
    )
    want = Counter(" ".join(texts).split())
    vocab = spark.read.parquet(out + "_vocab")
    got = {r["token"]: r["cnt"] for r in
           vocab.groupBy("token").agg(F.sum("cnt").alias("cnt")).collect()}
    assert got == dict(want)
    # compact_every=2 fired at batches 2 and 4: the final table holds
    # ... at most one UNFOLDED partial set on top of a folded base;
    # fold-on-read is the contract, row count stays bounded.
    assert vocab.count() <= len(want) * 2
    drift = spark.read.parquet(out + "_drift")
    assert drift.count() == len(texts)
    # Batches 2+ have disjoint vocab from the landed corpus -> jsd 1.
    rows = {r["batch_id"]: r["jsd_bits"] for r in drift.collect()}
    assert rows[2] == 1.0 and rows[3] == 1.0


def test_streaming_incremental_lm_gate(spark, tmp_path):
    """lm_floor + maintain_vocab: batch 0 passes ungated (no model
    yet); from batch 1 on, OOV-heavy gibberish scores below the floor
    under the corpus-so-far model and is dropped, while in-distribution
    text lands."""
    import os
    import time

    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    common = "alpha beta gamma delta epsilon zeta eta theta"
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shards = [
        [(1, common + " one", "en")],
        [
            (10, common + " two", "en"),          # in-distribution -> lands
            (11, "qq ww ee rr tt yy uu ii", "en"),  # all OOV -> gated
        ],
    ]
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(rows, ["doc_id", "text", "lang"]
                              ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # Model after batch 0: 9 tokens, 9 types -> seen p=(1+1)/19 ~ -0.98,
    # OOV p=1/19 ~ -1.28. Floor -1.1 separates them.
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, ckpt, apply_quality=False,
        maintain_vocab=True, lm_floor=-1.1,
    )
    landed = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert landed == [1, 10]


def test_streaming_ingest_span_dedup(spark, tmp_path):
    """Substring-level dedup on ingest: a batch-2 document containing a
    run already landed in batch 1 (at a different alignment) lands with
    that run EXCISED; a full replay shard lands nothing; and because
    doc ids follow arrival order, the final corpus text equals the
    batch-mode excise_duplicate_spans over the same documents."""
    import os
    import time

    from big_data_ml_pipeline_spark.operators import text as text_ops
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    shared = " ".join(f"dup{i}" for i in range(14))
    d1 = shared + " " + " ".join(f"a{i}" for i in range(10))
    d2 = " ".join(f"b{i}" for i in range(7)) + " " + shared + " tail0 tail1"
    d3 = " ".join(f"c{i}" for i in range(12))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shards = [
        [(1, d1, "en")],
        [(2, d2, "en"), (3, d3, "en")],
        [(10, d1, "en")],  # replay of landed content -> exact-dup drop
    ]
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang"]
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    out_dir = str(tmp_path / "corpus")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out_dir, str(tmp_path / "ckpt"), apply_quality=False,
        span_dedup={"k": 5, "min_len": 10},
    )
    landed = {r["doc_id"]: r["text"]
              for r in spark.read.parquet(out_dir).collect()}
    assert set(landed) == {1, 2, 3}
    assert landed[1] == d1                      # keeper by arrival
    assert landed[2] == " ".join(f"b{i}" for i in range(7)) + " tail0 tail1"
    assert landed[3] == d3
    # Gram index exists and holds the landed (post-excision) grams.
    idx = spark.read.parquet(out_dir + "_gram_index")
    assert idx.columns == ["gram"] and idx.count() > 0

    # Arrival order == id order here, so streaming == batch excision.
    batch = {
        r["doc_id"]: r["clean_text"]
        for r in text_ops.excise_duplicate_spans(
            spark.createDataFrame(
                [(1, d1), (2, d2), (3, d3)], ["doc_id", "text"]
            ),
            k=5, min_len=10,
        ).collect()
    }
    assert landed == batch


def test_streaming_span_dedup_compaction_preserves_behavior(spark, tmp_path):
    """ingest with compact_every: the gram index is folded to distinct
    range-clustered hashes, and a later batch still excises against it
    identically (same landed corpus as the uncompacted run)."""
    import os
    import time

    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    shared = " ".join(f"x{i}" for i in range(12))
    shards = [
        [(1, shared + " extra words here now", "en")],
        [(2, "prefix words " + shared + " suffix", "en")],
        [(3, "fresh content " + shared + " trailing bits", "en")],
    ]

    def run(sub, compact_every):
        in_dir = tmp_path / f"in_{sub}"
        in_dir.mkdir()
        for i, rows in enumerate(shards):
            p = str(in_dir / f"s{i}.parquet")
            spark.createDataFrame(
                rows, ["doc_id", "text", "lang"]
            ).toPandas().to_parquet(p, index=False)
            os.utime(p, (time.time() + i, time.time() + i))
        out = str(tmp_path / f"out_{sub}")
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out, str(tmp_path / f"ck_{sub}"), apply_quality=False,
            span_dedup={"k": 4, "min_len": 8}, compact_every=compact_every,
        )
        return {r["doc_id"]: r["text"]
                for r in spark.read.parquet(out).collect()}, out

    plain, _ = run("plain", None)
    compacted, out_c = run("compacted", 1)
    assert plain == compacted
    assert plain[2].startswith("prefix words") and "x3" not in plain[2]
    # Compaction left one distinct-hash set behind.
    idx = spark.read.parquet(out_c + "_gram_index")
    assert idx.count() == idx.select("gram").distinct().count()


def test_streaming_ingest_lang_profiles_auto(spark, tmp_path):
    """The streaming quality gate honors per-language profiles with
    auto language derivation: German text with zero English stopwords
    lands, marker-tagged English without stopwords is gated out, and
    the helper column never lands."""
    from big_data_ml_pipeline_spark.operators import text as text_ops
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    de = ("der schnelle braune fuchs springt über den faulen hund "
          "während die sonne hinter den bergen langsam untergeht "
          "und der alte müller seine mühle am rauschenden bach öffnet") * 2
    en_bad = "the " + ("quick brown fox jumps over lazy dog near riverbank "
                       "while evening sunlight fades behind distant mountain "
                       "peaks casting long shadows across quiet meadow grass "
                       "tonight differs each word onward never repeating") * 2
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    spark.createDataFrame(
        [(1, de, "x"), (2, en_bad, "x")], ["doc_id", "text", "lang"]
    ).toPandas().to_parquet(str(in_dir / "s0.parquet"), index=False)
    out = str(tmp_path / "out")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, str(tmp_path / "ck"),
        lang_profiles=text_ops.GOPHER_LANG_PROFILES,
    )
    landed = spark.read.parquet(out)
    assert [r["doc_id"] for r in landed.collect()] == [1]
    assert "__lang_auto" not in landed.columns


def test_streaming_span_dedup_crash_before_gram_index(spark, tmp_path, monkeypatch):
    """Kill the batch AFTER the corpus append but BEFORE the gram-index
    append (same at-least-once ordering as the MinHash index): replay
    lands nothing twice, the batch's spans were already excised before
    landing, and the index heals forward — later batches still excise
    against content whose grams ARE indexed."""
    import os
    import time

    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from big_data_ml_pipeline_spark.operators import text as text_mod
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    shared = " ".join(f"s{i}" for i in range(12))
    shards = [
        [(1, shared + " first batch filler words", "en")],
        [(2, "other opening " + shared + " closing words", "en")],
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang"]
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    real = text_mod.gram_index
    calls = {"n": 0}

    def exploding(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash before gram-index append")
        return real(*a, **k)

    monkeypatch.setattr(text_mod, "gram_index", exploding)
    out, ck = str(tmp_path / "corpus"), str(tmp_path / "ck")
    with _pytest.raises(StreamingQueryException, match="injected crash"):
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out, ck, apply_quality=False,
            span_dedup={"k": 4, "min_len": 8}, compact_every=1,
        )
    # Crash window is real: doc 1 landed, gram index missing. The
    # replayed batch's survivors are EMPTY (fp anti-join), so
    # append-only maintenance could never rebuild doc 1's grams —
    # the rebuild-from-corpus compaction is what heals this.
    assert [r["doc_id"] for r in spark.read.parquet(out).collect()] == [1]
    assert not os.path.exists(out + "_gram_index")

    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, ck, apply_quality=False,
        span_dedup={"k": 4, "min_len": 8}, compact_every=1,
    )
    landed = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    # Zero lost, zero duplicated, and the post-replay compaction
    # rebuilt the index from the landed corpus, so batch 2 still
    # excised its copied run despite the crash.
    assert sorted(landed) == [1, 2]
    assert landed[1] == shards[0][0][1]
    assert landed[2] == "other opening closing words"
    idx = spark.read.parquet(out + "_gram_index")
    assert idx.count() > 0


def test_streaming_span_dedup_bucketed_gram_index(spark, tmp_path):
    """The bucketed gram-index path (``span_dedup["n_buckets"]``,
    VERDICT r7 item 1): (a) identical landed corpus to the unbucketed
    path on the same replayed shards, across a mid-run compaction;
    (b) the per-batch screen's gram join needs NO exchange above the
    index scan — the bucketed read satisfies the join's distribution
    and only the batch-sized probe side shuffles; (c) compaction
    preserves the bucket layout (the swapped-in files still join
    shuffle-free) and the bucket-count marker refuses reinterpretation
    at a different count."""
    import os
    import time

    import pytest as _pytest

    from big_data_ml_pipeline_spark.operators import text as text_ops
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    shared = " ".join(f"y{i}" for i in range(12))
    shards = [
        [(1, shared + " alpha beta gamma delta", "en")],
        [(2, "prefix words " + shared + " suffix", "en")],
        [(3, "fresh content " + shared + " trailing bits", "en")],
    ]

    def run(sub, **kw):
        in_dir = tmp_path / f"in_{sub}"
        in_dir.mkdir()
        for i, rows in enumerate(shards):
            p = str(in_dir / f"s{i}.parquet")
            spark.createDataFrame(
                rows, ["doc_id", "text", "lang"]
            ).toPandas().to_parquet(p, index=False)
            os.utime(p, (time.time() + i, time.time() + i))
        out = str(tmp_path / f"out_{sub}")
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out, str(tmp_path / f"ck_{sub}"), apply_quality=False,
            span_dedup={"k": 4, "min_len": 8, **kw},
        )
        return {r["doc_id"]: r["text"]
                for r in spark.read.parquet(out).collect()}, out

    plain, _ = run("plain")
    bucketed, out_b = run("bucketed", n_buckets=8)
    assert plain == bucketed

    gram_dir = out_b + "_gram_index"
    tbl = corpus_ops._gram_table_name(gram_dir)
    idx = spark.table(tbl)
    assert idx.columns == ["gram"] and idx.count() > 0
    assert os.path.exists(os.path.join(gram_dir, "_BUCKET_SPEC"))

    def join_plan():
        probe = text_ops.gram_hash_stream(
            spark.createDataFrame([(99, shared)], ["doc_id", "text"]), k=4
        )
        j = probe.join(spark.table(tbl).select("gram"), "gram", "left_semi")
        return j._jdf.queryExecution().executedPlan().toString()

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = join_plan()
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1  # probe side only
        # (c) compaction rewrites the bucket files; the property holds
        # on the swapped-in layout too.
        corpus_ops.compact_gram_index(
            spark, gram_dir, corpus_dir=out_b, k=4, n_buckets=8
        )
        plan2 = join_plan()
        assert "Bucketed: true" in plan2
        assert plan2.count("Exchange") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # compaction folded to one file per bucket + marker, nothing else
    files = [f for f in os.listdir(gram_dir) if f.endswith(".parquet")]
    assert 0 < len(files) <= 8
    # the marker guards against reopening at a different bucket count
    with _pytest.raises(ValueError):
        corpus_ops._check_bucket_marker(gram_dir, 4)


def test_streaming_span_dedup_bucketed_with_compaction_cadence(spark, tmp_path):
    """Bucketed index + compact_every on the ingest cadence: landed
    corpus identical to the plain path (compaction mid-stream changes
    no excision decision), and the post-run index is still readable
    both via the catalog table and as plain parquet."""
    import os
    import time

    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    shared = " ".join(f"z{i}" for i in range(12))
    shards = [
        [(1, shared + " one two three four", "en")],
        [(2, "lead in " + shared + " tail out", "en")],
        [(3, "other body " + shared + " closing words", "en")],
    ]

    def run(sub, **kw):
        in_dir = tmp_path / f"in_{sub}"
        in_dir.mkdir()
        for i, rows in enumerate(shards):
            p = str(in_dir / f"s{i}.parquet")
            spark.createDataFrame(
                rows, ["doc_id", "text", "lang"]
            ).toPandas().to_parquet(p, index=False)
            os.utime(p, (time.time() + i, time.time() + i))
        out = str(tmp_path / f"out_{sub}")
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out, str(tmp_path / f"ck_{sub}"), apply_quality=False,
            compact_every=2, span_dedup={"k": 4, "min_len": 8, **kw},
        )
        return {r["doc_id"]: r["text"]
                for r in spark.read.parquet(out).collect()}, out

    plain, _ = run("plain")
    bucketed, out_b = run("bucketed", n_buckets=4)
    assert plain == bucketed
    gram_dir = out_b + "_gram_index"
    via_table = spark.table(corpus_ops._gram_table_name(gram_dir)).count()
    via_files = spark.read.parquet(gram_dir).count()
    assert via_table == via_files > 0


def test_streaming_near_dup_bucketed_minhash_index(spark, tmp_path):
    """``near_dup_n_buckets``: same landed corpus as the plain MinHash
    path, the per-batch candidate join reads the index bucketed on
    (band, bucket) with one exchange fewer than the plain-parquet
    read, and the bucketed compaction preserves both the layout and
    the screen's behavior."""
    import os
    import time

    from big_data_ml_pipeline_spark.operators import dedup as dedup_ops
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "to the old barn where it hides from the rain all day long")
    other = ("a completely different story about query engines and columnar "
             "formats written with care for the reader and full of detail")
    fresh = ("meanwhile the harbor lights flicker as ships unload crates "
             "of spice and sailors trade maps beneath the crescent moon")
    shards = [
        [(1, base, "en"), (2, base + " tonight", "en"), (3, other, "en")],
        [(10, base + " again", "en"), (11, fresh, "en")],
        [(20, fresh + " encore", "en"), (21, other + " redux", "en")],
    ]

    def run(sub, **kw):
        in_dir = tmp_path / f"in_{sub}"
        in_dir.mkdir()
        for i, rows in enumerate(shards):
            p = str(in_dir / f"s{i}.parquet")
            spark.createDataFrame(
                rows, ["doc_id", "text", "lang"]
            ).toPandas().to_parquet(p, index=False)
            os.utime(p, (time.time() + i, time.time() + i))
        out = str(tmp_path / f"out_{sub}")
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out, str(tmp_path / f"ck_{sub}"), min_tokens=5,
            near_dup_threshold=0.5, compact_every=2, **kw,
        )
        return sorted(
            r["doc_id"] for r in spark.read.parquet(out).collect()
        ), out

    plain, out_p = run("plain")
    bucketed, out_b = run("bucketed", near_dup_n_buckets=8)
    assert plain == bucketed

    index_dir = out_b + "_minhash_index"
    tbl = corpus_ops._minhash_table_name(index_dir)
    assert os.path.exists(os.path.join(index_dir, "_BUCKET_SPEC"))
    # index via the table == index via plain parquet (layout readable)
    via_tbl = {r["id"] for r in spark.table(tbl).collect()}
    via_files = {
        r["id"] for r in spark.read.parquet(index_dir).collect()
    }
    assert via_tbl == via_files == set(plain)

    probe = spark.createDataFrame(
        [(99, base + " once more", "en")], ["doc_id", "text", "lang"]
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def nx(index):
            q = dedup_ops.query_minhash_index(
                index, probe, "text", "doc_id", threshold=0.5
            )
            plan = q._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange"), plan
        n_b, plan_b = nx(spark.table(tbl))
        n_p, _ = nx(spark.read.parquet(out_p + "_minhash_index"))
        assert "Bucketed: true" in plan_b
        assert n_b == n_p - 1  # the index-side exchange is gone
        # post-compaction layout (compact_every=2 fired mid-run, plus
        # a trailing append) still joins bucketed after a full rewrite
        corpus_ops.compact_minhash_index_bucketed(spark, index_dir, 8)
        n_b2, plan_b2 = nx(spark.table(tbl))
        assert "Bucketed: true" in plan_b2 and n_b2 == n_b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the screen still works against the compacted bucketed index
    hits = dedup_ops.query_minhash_index(
        spark.table(tbl), probe, "text", "doc_id", threshold=0.5
    ).collect()
    assert {r["index_id"] for r in hits} == {1}


def test_streaming_embedding_bucketed_landed_state(spark, tmp_path):
    """The bucketed embedding landed state (``cell_n_buckets``, VERDICT
    r8 item 3 — the third and last hot state table): (a) identical
    landed corpus to the unbucketed path on the same replayed shards,
    across a mid-run compaction; (b) the cross-batch cosine screen's
    cell join needs NO exchange above the landed-table scan — the
    bucketed read satisfies the join's distribution and only the
    batch-sized probe side shuffles; (c) compaction preserves the
    bucket layout and the ``_BUCKET_SPEC`` marker refuses
    reinterpretation at a different count."""
    import os
    import time

    import pytest as _pytest

    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops
    from big_data_ml_pipeline_spark.streaming import embeddings as se

    def unit(*xs):
        import math as m

        n = m.sqrt(sum(x * x for x in xs))
        return [float(x / n) for x in xs]

    e1 = unit(1.0, 0.0, 0.0, 0.0)
    e2 = unit(0.0, 1.0, 0.0, 0.0)
    e1_near = unit(1.0, 0.05, 0.0, 0.0)
    e3 = unit(0.0, 0.0, 1.0, 0.0)
    e4 = unit(0.0, 0.0, 0.0, 1.0)
    shards = [
        [(1, e1, 0), (2, e2, 0), (3, e1, 0)],
        [(10, e1, 0), (11, e1_near, 0), (12, e3, 0)],
        [(20, e4, 0), (21, e2, 0)],
    ]
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]

    def run(sub, **kw):
        in_dir = tmp_path / f"in_{sub}"
        in_dir.mkdir()
        for i, rows in enumerate(shards):
            p = str(in_dir / f"s{i}.parquet")
            spark.createDataFrame(
                rows, ["vec_id", "embedding", "label"]
            ).toPandas().to_parquet(p, index=False)
            os.utime(p, (time.time() + i, time.time() + i))
        out = str(tmp_path / f"out_{sub}")
        se.ingest_embeddings_stream(
            se.read_embeddings_stream(spark, str(in_dir)),
            out, str(tmp_path / f"ck_{sub}"), centroids=cents,
            threshold=0.95, compact_every=2, **kw,
        )
        return {
            r["vec_id"]: (r["cell"], tuple(round(x, 9) for x in r["v"]))
            for r in spark.read.parquet(out).collect()
        }, out

    plain, _ = run("plain")
    bucketed, out_b = run("bucketed", cell_n_buckets=4)
    assert plain == bucketed
    assert sorted(plain) == [1, 2, 12, 20]

    tbl = corpus_ops._state_table_name(out_b, "emb_corpus")
    assert os.path.exists(os.path.join(out_b, "_BUCKET_SPEC"))
    # landed state via the table == via plain parquet (layout readable)
    via_tbl = {r["vec_id"] for r in spark.table(tbl).collect()}
    assert via_tbl == set(plain)

    def join_plan():
        # The per-batch screen shape: a batch-sized probe cell-joined
        # against the corpus-sized landed side.
        # cell derives from data (not a foldable literal), exactly as
        # a real batch's ivf_index assignment does — a literal cell
        # would constant-fold the equi-join away.
        probe = spark.createDataFrame(
            [(99, e1_near, 0)], ["vec_id", "embedding", "label"]
        ).selectExpr(
            "vec_id", "transform(embedding, x -> cast(x as double)) as v",
            "cast(pmod(vec_id, 4) as int) as cell",
        )
        j = probe.join(
            spark.table(tbl).select("cell", F.col("v").alias("__lv")),
            on="cell",
        )
        return j._jdf.queryExecution().executedPlan().toString()

    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = join_plan()
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1  # probe side only
        # compaction already fired mid-run (compact_every=2) and a
        # trailing batch appended after it; a full explicit rewrite
        # must preserve the shuffle-free layout too.
        corpus_ops._rewrite_bucketed_state(
            spark, out_b, tbl, spark.table(tbl), 4, ["cell"]
        )
        plan2 = join_plan()
        assert "Bucketed: true" in plan2
        assert plan2.count("Exchange") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    files = [f for f in os.listdir(out_b) if f.endswith(".parquet")]
    assert 0 < len(files) <= 4
    with _pytest.raises(ValueError, match="embedding corpus"):
        corpus_ops._check_bucket_marker(out_b, 8, "embedding corpus")


def test_streaming_track_components_matches_batch_cc(spark, tmp_path):
    """Streaming duplicate-GROUP tracking (``track_components``,
    VERDICT r8 item 5): after replaying shards whose near-dup chain
    crosses batches A~B (batches 1→2) and B~C (batches 2→3) with A!~C,
    the maintained ``{out}_components`` table equals one-shot batch CC
    over the full corpus's MinHash pairs — including C, which chains
    into the group ONLY through B, a doc the ingest dropped (the
    dropped doc's signatures stay in the index precisely for this).
    The landed corpus is the same min-id representative set batch-mode
    dedup keeps."""
    import os
    import time

    from big_data_ml_pipeline_spark.operators import dedup as dedup_ops
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    X = [f"x{i}" for i in range(30)]
    Y = [f"y{i}" for i in range(30)]
    A = " ".join(X)                  # id 1, batch 1 (rep)
    A2 = A + " extra tail"           # id 2, batch 1 (within-batch dup)
    B = " ".join(X + Y)              # id 10, batch 2 (~A, dropped)
    C = " ".join(X[15:] + Y)         # id 20, batch 3 (~B only)
    D = " ".join(f"d{i}" for i in range(20))  # id 30, unrelated
    shards = [
        [(1, A, "en"), (2, A2, "en")],
        # 31 = WITHIN-batch exact dup of 30; 4 = CROSS-batch exact dup
        # of 1 — exact dups must join their groups (est-1.0 pairs in
        # batch mode) without ever landing or being indexed.
        [(10, B, "en"), (30, D, "en"), (31, D, "en"), (4, A, "en")],
        [(20, C, "en")],
    ]
    thr = 0.4

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang"]
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))
    out = str(tmp_path / "out")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, str(tmp_path / "ck"), apply_quality=False,
        near_dup_threshold=thr, track_components=True,
    )

    # Landed corpus == batch-mode representative set.
    landed = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert landed == [1, 30]

    # Component table == one-shot batch CC over the replayed corpus.
    full = spark.createDataFrame(
        [r for rows in shards for r in rows], ["doc_id", "text", "lang"]
    )
    batch_pairs = dedup_ops.minhash_dedup_pairs(full, "text", "doc_id").filter(
        "est_jaccard >= 0.4"
    )
    expect = {
        r["id"]: r["comp"]
        for r in dedup_ops.connected_components_alternating(
            batch_pairs.select("id_a", "id_b")
        ).collect()
    }
    got = {
        r["id"]: r["comp"]
        for r in spark.read.parquet(out + "_components").collect()
    }
    assert got == expect
    # the chain really crossed batches through the dropped doc (20 via
    # 10), and exact dups joined their groups both within-batch
    # (31→30) and cross-batch (4→1)
    assert got == {1: 1, 2: 1, 4: 1, 10: 1, 20: 1, 30: 30, 31: 30}

    # track_components without a near-dup screen is a contract error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="track_components"):
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            str(tmp_path / "out2"), str(tmp_path / "ck2"),
            apply_quality=False, track_components=True,
        )


def test_streaming_components_crash_replay_self_heals(
    spark, tmp_path, monkeypatch
):
    """Failure injection for the components-BEFORE-corpus write order:
    kill the batch right AFTER the component state swapped in but
    BEFORE the corpus append, replay it, and assert the final corpus
    has zero lost/duplicate docs and the component table still equals
    one-shot batch CC — the replayed batch re-merges its edges
    idempotently (min labels are idempotent under re-union) and then
    lands its docs."""
    import os
    import time

    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from big_data_ml_pipeline_spark.operators import dedup as dedup_ops
    from big_data_ml_pipeline_spark.sources import state as state_mod
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    X = [f"x{i}" for i in range(30)]
    Y = [f"y{i}" for i in range(30)]
    A = " ".join(X)
    B = " ".join(X + Y)
    C = " ".join(X[15:] + Y)
    shards = [
        [(1, A, "en")],
        [(10, B, "en")],   # ~A; batch 2's comp swap is the crash site
        [(20, C, "en")],   # ~B only
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang"]
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    real_swap = state_mod.atomic_swap_dirs
    calls = {"n": 0}

    def swap_then_crash(path):
        real_swap(path)  # the swap COMPLETES; the crash is after it
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash after components swap")

    monkeypatch.setattr(state_mod, "atomic_swap_dirs", swap_then_crash)

    out = str(tmp_path / "out")
    with _pytest.raises(StreamingQueryException, match="injected crash"):
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out, str(tmp_path / "ck"), apply_quality=False,
            near_dup_threshold=0.4, track_components=True,
        )
    # The crash window is real: batch 2's comps merged, doc 10 not
    # screened into the corpus (it would have been dropped anyway as a
    # near-dup of 1 — the window is observable via comps alone here).
    assert {r["id"]: r["comp"] for r in
            spark.read.parquet(out + "_components").collect()} == {1: 1, 10: 1}
    # Restart from the same checkpoint: batch 2 replays, then batch 3.
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, str(tmp_path / "ck"), apply_quality=False,
        near_dup_threshold=0.4, track_components=True,
    )
    landed = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert landed == [1]  # rep only; no loss, no dup
    full = spark.createDataFrame(
        [r for rows in shards for r in rows], ["doc_id", "text", "lang"]
    )
    expect = {
        r["id"]: r["comp"]
        for r in dedup_ops.connected_components_alternating(
            dedup_ops.minhash_dedup_pairs(full, "text", "doc_id")
            .filter("est_jaccard >= 0.4")
            .select("id_a", "id_b")
        ).collect()
    }
    got = {
        r["id"]: r["comp"]
        for r in spark.read.parquet(out + "_components").collect()
    }
    assert got == expect == {1: 1, 10: 1, 20: 1}


def test_streaming_components_bucketed_append_only(spark, tmp_path):
    """The append-only versioned components state
    (``components_n_buckets``): (a) resolved labels identical to the
    per-batch-rewrite path on the same replayed chain, across a
    mid-run compaction fold; (b) the latest-wins resolve needs NO
    exchange above the id-bucketed scan; (c) the ``_BUCKET_SPEC``
    marker refuses reopening at a different count."""
    import os
    import time

    import pytest as _pytest

    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    X = [f"x{i}" for i in range(30)]
    Y = [f"y{i}" for i in range(30)]
    A = " ".join(X)
    A2 = A + " extra tail"
    B = " ".join(X + Y)
    C = " ".join(X[15:] + Y)
    D = " ".join(f"d{i}" for i in range(20))
    shards = [
        [(1, A, "en"), (2, A2, "en")],
        [(10, B, "en"), (30, D, "en")],
        [(20, C, "en")],
    ]

    def run(sub, **kw):
        in_dir = tmp_path / f"in_{sub}"
        in_dir.mkdir()
        for i, rows in enumerate(shards):
            p = str(in_dir / f"s{i}.parquet")
            spark.createDataFrame(
                rows, ["doc_id", "text", "lang"]
            ).toPandas().to_parquet(p, index=False)
            os.utime(p, (time.time() + i, time.time() + i))
        out = str(tmp_path / f"out_{sub}")
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out, str(tmp_path / f"ck_{sub}"), apply_quality=False,
            near_dup_threshold=0.4, track_components=True,
            compact_every=2, **kw,
        )
        return out

    out_p = run("plain")
    plain = {
        r["id"]: r["comp"]
        for r in spark.read.parquet(out_p + "_components").collect()
    }
    out_b = run("bucketed", components_n_buckets=4)
    comp_dir = out_b + "_components"
    tbl = corpus_ops._state_table_name(comp_dir, "components")
    resolved = corpus_ops.resolve_components(spark.table(tbl))
    bucketed = {r["id"]: r["comp"] for r in resolved.collect()}
    assert bucketed == plain == {1: 1, 2: 1, 10: 1, 20: 1}
    assert os.path.exists(os.path.join(comp_dir, "_BUCKET_SPEC"))
    # (b) latest-wins resolve: zero exchanges above the bucketed scan
    plan = resolved._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert plan.count("Exchange") == 0
    # versioned layout: ver column rides the table; compaction (fired
    # mid-run at batch 2) plus the batch-3 append bound the file count
    files = [f for f in os.listdir(comp_dir) if f.endswith(".parquet")]
    assert 0 < len(files) <= 8  # ≤ 4 buckets × (folded + 1 append)
    with _pytest.raises(ValueError, match="components state"):
        corpus_ops._check_bucket_marker(comp_dir, 2, "components state")


def test_streaming_components_heal_lost_index_rows(
    spark, tmp_path, monkeypatch
):
    """The crash window between the corpus append and the index append
    must not lose a landed survivor's signatures when groups are
    tracked: `screened` is pinned BEFORE the landed anti-join, so the
    REPLAYED batch still contains its landed docs and re-appends their
    index rows — the next batch's doc that chains ONLY through the
    previously-unindexed survivor is still screened and grouped."""
    import os
    import time

    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from big_data_ml_pipeline_spark.operators import dedup as dedup_ops
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    X = [f"x{i}" for i in range(30)]
    Y = [f"y{i}" for i in range(30)]
    P = [f"p{i}" for i in range(30)]
    A = " ".join(X)            # id 1, batch 1
    B = " ".join(X + Y)        # id 10, batch 2: ~A, dropped
    D = " ".join(P)            # id 30, batch 2: novel, LANDS
    E = D + " q0 q1 q2"        # id 40, batch 3: ~D only (est 0.97)
    shards = [
        [(1, A, "en")],
        [(10, B, "en"), (30, D, "en")],
        [(40, E, "en")],
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang"]
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    real_index = dedup_ops.minhash_index
    calls = {"n": 0}

    def exploding_index(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:  # batch 2's index append — AFTER its
            raise RuntimeError("injected crash before index append")
        return real_index(*a, **k)  # corpus write landed doc 30

    monkeypatch.setattr(dedup_ops, "minhash_index", exploding_index)

    out = str(tmp_path / "out")
    with _pytest.raises(StreamingQueryException, match="injected crash"):
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out, str(tmp_path / "ck"), apply_quality=False,
            near_dup_threshold=0.4, track_components=True,
        )
    # The window is real: doc 30 landed, its index rows did not.
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    ) == [1, 30]
    assert sorted(
        r["id"] for r in spark.read.parquet(out + "_minhash_index")
        .select("id").distinct().collect()
    ) == [1]
    # Restart: batch 2 replays (re-indexes 10 AND the landed 30),
    # then batch 3 chains 40 through 30.
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, str(tmp_path / "ck"), apply_quality=False,
        near_dup_threshold=0.4, track_components=True,
    )
    landed = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert landed == [1, 30]  # 40 screened out, 30 not duplicated
    full = spark.createDataFrame(
        [r for rows in shards for r in rows], ["doc_id", "text", "lang"]
    )
    expect = {
        r["id"]: r["comp"]
        for r in dedup_ops.connected_components_alternating(
            dedup_ops.minhash_dedup_pairs(full, "text", "doc_id")
            .filter("est_jaccard >= 0.4")
            .select("id_a", "id_b")
        ).collect()
    }
    got = {
        r["id"]: r["comp"]
        for r in spark.read.parquet(out + "_components").collect()
    }
    assert got == expect == {1: 1, 10: 1, 30: 30, 40: 30}


def test_streaming_embedding_track_components(spark, tmp_path):
    """Semantic duplicate-GROUP tracking on the embedding ingest
    (``track_components``): a cosine chain that crosses batches
    through a DROPPED vector — v1 (lands) ~ v2 (dropped) ~ v3, with
    cos(v1,v3) below threshold — still groups {v1,v2,v3} together AND
    still drops v3 (the screened-extras table carries dropped vectors'
    rows), exactly as one-shot batch semantics would. Exact duplicates
    join groups through fingerprint star edges. The final labels equal
    CC over the full input's exact + within-cell cosine pair
    evidence."""
    import math
    import os
    import time

    from big_data_ml_pipeline_spark.operators import dedup as dedup_ops
    from big_data_ml_pipeline_spark.operators import similarity as sim_ops
    from big_data_ml_pipeline_spark.streaming import embeddings as se
    from pyspark.sql import functions as F

    def rot(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0, 0.0]

    v1, v2, v3 = rot(0), rot(20), rot(40)   # cos(v1,v2)=cos(v2,v3)=.94
    e2 = [0.0, 0.0, 1.0, 0.0]               # cos(v1,v3)=.766 < .9
    shards = [
        [(1, v1, 0)],
        [(10, v2, 0), (4, v1, 0), (30, e2, 0)],  # 4 = exact dup of 1
        [(20, v3, 0)],
    ]
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
    thr = 0.9

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(
            rows, ["vec_id", "embedding", "label"]
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))
    out = str(tmp_path / "out")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, str(in_dir)),
        out, str(tmp_path / "ck"), centroids=cents, threshold=thr,
        track_components=True,
    )

    landed = sorted(r["vec_id"] for r in spark.read.parquet(out).collect())
    assert landed == [1, 30]  # v3 dropped ONLY via the screened extras
    # extras hold exactly the dropped semantic vectors
    extras = sorted(
        r["vec_id"]
        for r in spark.read.parquet(out + "_screened").collect()
    )
    assert extras == [10, 20]

    # batch reference: CC over exact-fp stars + within-cell cosine
    # pairs of the FULL input at the same threshold/params.
    full = spark.createDataFrame(
        [r for rows in shards for r in rows],
        ["vec_id", "embedding", "label"],
    )
    assigned = sim_ops.ivf_index(full, cents)
    cos_pairs = sim_ops.cosine_near_dup_pairs(
        assigned, block_cols=["cell"], threshold=thr,
        id_col="vec_id", vec_col="v", max_block_size=4096,
    ).select("id_a", "id_b")
    fp_tag = full.select(
        "vec_id", F.xxhash64(F.col("embedding")).alias("fp")
    )
    keep = fp_tag.groupBy("fp").agg(F.min("vec_id").alias("__k"))
    fp_edges = (
        fp_tag.join(keep, on="fp")
        .filter(F.col("vec_id") != F.col("__k"))
        .select(F.col("__k").alias("id_a"), F.col("vec_id").alias("id_b"))
    )
    expect = {
        r["id"]: r["comp"]
        for r in dedup_ops.connected_components_alternating(
            cos_pairs.unionByName(fp_edges)
        ).collect()
    }
    got = {
        r["id"]: r["comp"]
        for r in spark.read.parquet(out + "_components").collect()
    }
    assert got == expect == {1: 1, 4: 1, 10: 1, 20: 1}


def test_streaming_embedding_bucketed_screened_extras(spark, tmp_path):
    """ADVICE r9 (medium): under ``cell_n_buckets`` the group-tracking
    screened-extras table shares the landed table's bucketed-on-cell
    layout and is folded on the compaction cadence. Pins: (a) bucketed
    mode lands/screens/groups exactly what plain mode does on the
    dropped-twin rotation chain; (b) the extras dir carries its own
    _BUCKET_SPEC and reads back through its catalog table; (c) a full
    at-least-once replay (fresh checkpoint, same input) re-derives
    every dropped row — duplicates that compact_screened_extras folds
    back to one row per id with content unchanged; (d) the extras
    probe join against a batch needs no extras-side exchange."""
    import math
    import os
    import time

    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops
    from big_data_ml_pipeline_spark.streaming import embeddings as se
    from pyspark.sql import functions as F

    def rot(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0, 0.0]

    v1, v2, v3 = rot(0), rot(20), rot(40)
    e2 = [0.0, 0.0, 1.0, 0.0]
    shards = [
        [(1, v1, 0)],
        [(10, v2, 0), (4, v1, 0), (30, e2, 0)],
        [(20, v3, 0)],
    ]
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]

    def make_input(sub):
        in_dir = tmp_path / f"in_{sub}"
        in_dir.mkdir()
        for i, rows in enumerate(shards):
            p = str(in_dir / f"s{i}.parquet")
            spark.createDataFrame(
                rows, ["vec_id", "embedding", "label"]
            ).toPandas().to_parquet(p, index=False)
            os.utime(p, (time.time() + i, time.time() + i))
        return str(in_dir)

    def snap(out):
        return (
            sorted(r["vec_id"] for r in spark.read.parquet(out).collect()),
            sorted(
                r["vec_id"]
                for r in spark.read.parquet(out + "_screened")
                .select("vec_id").distinct().collect()
            ),
            {
                r["id"]: r["comp"]
                for r in spark.read.parquet(out + "_components").collect()
            },
        )

    in_plain = make_input("plain")
    out_plain = str(tmp_path / "out_plain")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_plain),
        out_plain, str(tmp_path / "ck_plain"), centroids=cents,
        threshold=0.9, track_components=True,
    )

    in_b = make_input("bucketed")
    out_b = str(tmp_path / "out_bucketed")
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_b),
        out_b, str(tmp_path / "ck_b1"), centroids=cents,
        threshold=0.9, track_components=True, cell_n_buckets=4,
    )
    assert snap(out_b) == snap(out_plain)
    assert snap(out_b)[0] == [1, 30] and snap(out_b)[1] == [10, 20]

    scr_dir = out_b + "_screened"
    assert os.path.exists(os.path.join(scr_dir, "_BUCKET_SPEC"))
    scr_tbl = corpus_ops._state_table_name(scr_dir, "emb_screened")
    assert sorted(
        r["vec_id"] for r in spark.table(scr_tbl).collect()
    ) == [10, 20]

    # (c) full at-least-once replay (fresh checkpoint, same input):
    # the extras table participates in the exact fp screen, so a
    # replayed dropped vector is screened BY ITS OWN extras row and
    # re-appends nothing — extras growth under replay is zero, not
    # just bounded. Pin that, then inject a duplicate row directly
    # (the retry interleaving the fold guards against) and fold it.
    se.ingest_embeddings_stream(
        se.read_embeddings_stream(spark, in_b),
        out_b, str(tmp_path / "ck_b2"), centroids=cents,
        threshold=0.9, track_components=True, cell_n_buckets=4,
    )
    spark.catalog.refreshTable(scr_tbl)
    assert spark.table(scr_tbl).count() == 2  # replay added nothing
    dup_row = spark.table(scr_tbl).filter(F.col("vec_id") == 10)
    corpus_ops._append_bucketed(dup_row, scr_tbl, 4, ["cell"])
    spark.catalog.refreshTable(scr_tbl)
    assert spark.table(scr_tbl).count() == 3
    se.compact_screened_extras(spark, scr_dir, scr_tbl, 4)
    folded = spark.table(scr_tbl)
    assert folded.count() == 2
    assert sorted(r["vec_id"] for r in folded.collect()) == [10, 20]
    # landed corpus and groups untouched by the replay + fold
    assert snap(out_b) == snap(out_plain)

    # (d) the extras probe join is exchange-free on the extras side,
    # same pin as the landed table (non-foldable probe cell — a
    # literal would constant-fold the equi-join away).
    probe = spark.createDataFrame(
        [(99, v2, 0)], ["vec_id", "embedding", "label"]
    ).selectExpr(
        "vec_id", "transform(embedding, x -> cast(x as double)) as v",
        "cast(pmod(vec_id, 4) as int) as cell",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = probe.join(
            spark.table(scr_tbl).select("cell", F.col("v").alias("__sv")),
            on="cell",
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_components_versioned_auto_compaction_bounds_files(
    spark, tmp_path, monkeypatch
):
    """VERDICT r9 item 6: with NO compact_every cadence configured,
    the versioned component state auto-folds once its data-file count
    exceeds components_auto_compact_files — a long replay keeps the
    state directory bounded instead of growing one file set per batch.
    Labels are identical with the policy effectively disabled (the
    fold is a latest-wins physical rewrite), a crash injected right
    after the growth-triggered fold's swap self-heals on restart, and
    the bucketed layout survives the folds."""
    import os
    import time

    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from big_data_ml_pipeline_spark.sources import state as state_mod
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    # 8 batches, each a private near-dup pair (disjoint vocab across
    # batches: edges never cross batches, so expected labels are flat)
    shards = []
    for g in range(8):
        words = " ".join(f"w{g}x{j}" for j in range(25))
        shards.append(
            [
                (100 * g + 1, words, "en"),
                (100 * g + 2, words + f" extra{g}", "en"),
            ]
        )
    expect = {}
    for g in range(8):
        expect[100 * g + 1] = 100 * g + 1
        expect[100 * g + 2] = 100 * g + 1

    def stage(sub):
        in_dir = tmp_path / f"in_{sub}"
        in_dir.mkdir()
        for i, rows in enumerate(shards):
            p = str(in_dir / f"s{i}.parquet")
            spark.createDataFrame(
                rows, ["doc_id", "text", "lang"]
            ).toPandas().to_parquet(p, index=False)
            os.utime(p, (time.time() + i, time.time() + i))
        return str(in_dir), str(tmp_path / f"out_{sub}")

    def labels(out):
        comp_dir = out + "_components"
        tbl = corpus_ops._state_table_name(comp_dir, "components")
        return {
            r["id"]: r["comp"]
            for r in corpus_ops.resolve_components(
                spark.table(tbl)
            ).collect()
        }

    def n_files(out):
        return len(
            [
                f
                for f in os.listdir(out + "_components")
                if f.endswith(".parquet")
            ]
        )

    # policy effectively off: every batch's delta accumulates
    in_off, out_off = stage("off")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, in_off),
        out_off, str(tmp_path / "ck_off"), apply_quality=False,
        near_dup_threshold=0.4, track_components=True,
        components_n_buckets=2, components_auto_compact_files=10**6,
    )
    assert n_files(out_off) >= 8  # one file set per batch, unbounded

    # policy on (threshold 4 files), with a crash injected right after
    # the FIRST growth-triggered fold completes its directory swap
    in_on, out_on = stage("on")
    real_swap = state_mod.atomic_swap_dirs
    fired = {"n": 0}

    def swap_then_crash(path, *a, **k):
        got = real_swap(path, *a, **k)
        if path.endswith("_components"):
            fired["n"] += 1
            if fired["n"] == 1:
                raise RuntimeError("injected crash after components fold")
        return got

    monkeypatch.setattr(state_mod, "atomic_swap_dirs", swap_then_crash)
    with _pytest.raises(StreamingQueryException, match="injected crash"):
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, in_on),
            out_on, str(tmp_path / "ck_on"), apply_quality=False,
            near_dup_threshold=0.4, track_components=True,
            components_n_buckets=2, components_auto_compact_files=4,
        )
    monkeypatch.setattr(state_mod, "atomic_swap_dirs", real_swap)
    # restart with the same checkpoint: the killed batch replays and
    # re-merges idempotently, remaining batches drain
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, in_on),
        out_on, str(tmp_path / "ck_on"), apply_quality=False,
        near_dup_threshold=0.4, track_components=True,
        components_n_buckets=2, components_auto_compact_files=4,
    )
    assert labels(out_on) == labels(out_off) == expect
    # bounded: threshold + at most one post-fold append of ≤2 files
    assert n_files(out_on) <= 6
    assert os.path.exists(
        os.path.join(out_on + "_components", "_BUCKET_SPEC")
    )


def test_streaming_model_quality_gate(spark, tmp_path):
    """The q160 classifier as a streaming-ingest screen
    (``quality_model``): a model trained offline on a planted-quality
    corpus, persisted, and loaded BY PATH gates arriving batches on
    p_head — gibberish documents are dropped before dedup while
    natural text lands; with the gate off the same stream lands
    everything. The LM-proxy feature reads the corpus-so-far
    vocabulary summary (maintain_vocab), matching the lm_floor gate's
    model form."""
    import os
    import time

    from big_data_ml_pipeline_spark.ml.quality import fit_quality_classifier
    from big_data_ml_pipeline_spark.ml.train import save_model
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    def good(i):
        return (
            "the quick brown fox and the lazy dog walk to the old market "
            f"of the town and they talk about the news of day {i} together"
        )

    def bad(i):
        return " ".join(f"qz{i}x{j}vw" for j in range(30))

    train_rows = [(i, good(i), "en") for i in range(30)]
    train_rows += [(100 + i, bad(i), "en") for i in range(30)]
    train_df = spark.createDataFrame(train_rows, ["doc_id", "text", "lang"])
    model = fit_quality_classifier(train_df)
    mpath = str(tmp_path / "qmodel")
    save_model(model, mpath)

    shards = [
        [(201, good(201), "en"), (202, good(202), "en")],
        [(203, good(203), "en"), (210, bad(210), "en"),
         (211, bad(211), "en")],
    ]

    def stage(sub):
        in_dir = tmp_path / f"in_{sub}"
        in_dir.mkdir()
        for i, rows in enumerate(shards):
            p = str(in_dir / f"s{i}.parquet")
            spark.createDataFrame(
                rows, ["doc_id", "text", "lang"]
            ).toPandas().to_parquet(p, index=False)
            os.utime(p, (time.time() + i, time.time() + i))
        return str(in_dir)

    out_gated = str(tmp_path / "out_gated")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, stage("gated")),
        out_gated, str(tmp_path / "ck_g"), apply_quality=False,
        maintain_vocab=True, quality_model=mpath,
        quality_model_floor=0.5,
    )
    landed = sorted(
        r["doc_id"] for r in spark.read.parquet(out_gated).collect()
    )
    assert landed == [201, 202, 203]

    out_open = str(tmp_path / "out_open")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, stage("open")),
        out_open, str(tmp_path / "ck_o"), apply_quality=False,
    )
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out_open).collect()
    ) == [201, 202, 203, 210, 211]


def test_streaming_components_feed_leakage_safe_split(spark, tmp_path):
    """End-to-end leakage story across both halves (q158 ∘ q161): the
    duplicate-GROUP labels the streaming ingest maintains feed
    setops.component_split directly — resolve_components over the
    versioned bucketed state, split on md5(group), and no near-dup
    pair the ingest ever saw straddles train/test, INCLUDING pairs
    through documents the ingest dropped."""
    import os
    import time

    from big_data_ml_pipeline_spark.operators import setops as set_ops
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    shards = []
    edges = []
    for g in range(10):
        words = " ".join(f"g{g}w{j}" for j in range(25))
        # near-dup pair split ACROSS batches; the second member is
        # dropped by the screen but must still group (and split) with
        # its keeper.
        shards.append([(100 * g + 1, words, "en")])
        shards.append([(100 * g + 2, words + f" tail{g}", "en")])
        edges.append((100 * g + 1, 100 * g + 2))
    solo = [(9000 + i, f"unique document number {i} " * 5, "en")
            for i in range(10)]
    shards.append(solo)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i:02d}.parquet")
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang"]
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))
    out = str(tmp_path / "out")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, str(tmp_path / "ck"), apply_quality=False,
        near_dup_threshold=0.4, track_components=True,
        components_n_buckets=2,
    )
    comp_tbl = corpus_ops._state_table_name(
        out + "_components", "components"
    )
    labels = corpus_ops.resolve_components(spark.table(comp_tbl))

    # the full corpus (landed + dropped) is what a training pipeline
    # splits; dropped docs' rows still exist upstream of the ingest
    full = spark.createDataFrame(
        [r for rows in shards for r in rows], ["doc_id", "text", "lang"]
    )
    train, test = set_ops.component_split(full, labels, id_col="doc_id")
    tr = {r["doc_id"] for r in train.collect()}
    te = {r["doc_id"] for r in test.collect()}
    assert tr | te == {r[0] for rows in shards for r in rows}
    assert not (tr & te)
    assert [(a, b) for a, b in edges if (a in tr) != (b in tr)] == []


def test_streaming_lexicon_bm25_equals_batch(spark, tmp_path):
    """maintain_lexicon (VERDICT r13 item 4): BM25 answered from the
    incremental lexicon state equals bm25_topk's one-shot corpus
    aggregation on the same landed corpus, row for row — df/N/Σdl are
    integer partial sums of exactly the batch quantities, so every
    downstream quantized expression is bit-identical. Also pins:
    dropped duplicates contribute NO statistics, compaction preserves
    the sums, and a fresh-checkpoint replay appends nothing (zero
    survivors per batch)."""
    import os
    import time

    from big_data_ml_pipeline_spark.operators.text import (
        bm25_topk,
        bm25_topk_from_lexicon,
    )
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    shards = [
        [(0, "spark window vector spark"), (1, "window beta vector")],
        [(2, "spark window vector spark"),  # exact dup of 0 -> dropped
         (3, "vector vector gamma window spark")],
        [(4, "delta epsilon spark"), (5, "window window vector")],
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(
            [(d, t, "en") for d, t in rows], ["doc_id", "text", "lang"]
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, ckpt, apply_quality=False,
        maintain_lexicon=True, compact_every=2,
    )
    landed = spark.read.parquet(out)
    assert landed.count() == 5  # doc 2 deduped
    lexicon = spark.read.parquet(out + "_lexicon")
    terms = ("spark", "window", "vector")
    inc = bm25_topk_from_lexicon(
        landed, lexicon, terms, k=10, k1=1.2, b=0.75
    ).collect()
    bat = bm25_topk(landed, terms, k=10, k1=1.2, b=0.75).collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in bat]
    assert len(inc) == 5 and inc[0]["score"] > 0
    # The dropped duplicate contributed nothing: stats equal the
    # landed corpus exactly.
    from pyspark.sql import functions as SF

    lex = lexicon.dropDuplicates(["batch_id", "token"])
    st = lex.filter(SF.col("token").isNull()).agg(
        SF.sum("n_docs").alias("n"), SF.sum("sum_dl").alias("s")
    ).collect()[0]
    assert st["n"] == 5
    assert st["s"] == sum(
        len(t.split()) for d, t in sum(shards, []) if d != 2
    )
    # Fresh-checkpoint replay: every batch's survivors are already
    # landed -> zero new lexicon rows, stats unchanged.
    n_rows = lexicon.count()
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, str(tmp_path / "ckpt2"), apply_quality=False,
        maintain_lexicon=True,
    )
    assert spark.read.parquet(out + "_lexicon").count() == n_rows
    inc2 = bm25_topk_from_lexicon(
        landed, spark.read.parquet(out + "_lexicon"), terms, k=10
    ).collect()
    assert [tuple(r) for r in inc2] == [tuple(r) for r in bat]


def test_streaming_postings_bm25_zero_corpus_reads(spark, tmp_path):
    """maintain_postings (VERDICT r14 item 1): BM25 answered ENTIRELY
    from ingest state — bm25_topk_from_postings over the bucketed
    inverted postings + lexicon equals bm25_topk's one-shot corpus
    aggregation row for row, its physical plan scans NO corpus file
    (only the postings/lexicon state), the token IN-filter is pushed
    to the postings scan, and the bucketed-on-token table prunes to
    the query terms' buckets. Also pins replay idempotency (a
    fresh-checkpoint replay appends nothing) and the
    maintain_postings-without-lexicon ValueError."""
    import os
    import time

    import pytest as _pytest

    from big_data_ml_pipeline_spark.operators.text import (
        bm25_topk,
        bm25_topk_from_postings,
    )
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    shards = [
        [(0, "spark window vector spark"), (1, "window beta vector")],
        [(2, "spark window vector spark"),  # exact dup of 0 -> dropped
         (3, "vector vector gamma window spark")],
        [(4, "delta epsilon spark"), (5, "window window vector")],
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(
            [(d, t, "en") for d, t in rows], ["doc_id", "text", "lang"]
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with _pytest.raises(ValueError, match="maintain_lexicon"):
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out, ckpt, apply_quality=False, maintain_postings=True,
        )
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, ckpt, apply_quality=False,
        maintain_lexicon=True, maintain_postings=True,
        postings_n_buckets=4,
    )
    landed = spark.read.parquet(out)
    assert landed.count() == 5
    terms = ("spark", "window", "vector")
    postings = corpus_ops.read_postings(spark, out)
    result = bm25_topk_from_postings(
        postings, spark.read.parquet(out + "_lexicon"), terms, k=10
    )
    bat = bm25_topk(landed, terms, k=10, k1=1.2, b=0.75).collect()
    assert [tuple(r) for r in result.collect()] == [
        tuple(r) for r in bat
    ]
    # ZERO corpus reads: the plan scans only state tables — a corpus
    # scan would read the text column (the text.py scan is gone).
    plan = result._jdf.queryExecution().executedPlan().toString()
    tbl = corpus_ops._state_table_name(out + "_postings", "postings")
    assert tbl in plan  # the bucketed postings table IS the tf side
    assert "text:string" not in plan
    # Term filter pushed to the postings scan + bucket pruning active
    # (3 of 4 buckets for these terms' hashes).
    assert "In(token, [spark,vector,window])" in plan
    assert "SelectedBucketsCount: 3 out of 4" in plan
    # Postings rows are exactly one per landed (doc, token).
    n_pairs = sum(
        len(set(t.split())) for d, t in sum(shards, []) if d != 2
    )
    assert postings.count() == n_pairs
    # Fresh-checkpoint replay: zero survivors -> zero new postings.
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, str(tmp_path / "ckpt2"), apply_quality=False,
        maintain_lexicon=True, maintain_postings=True,
        postings_n_buckets=4,
    )
    assert corpus_ops.read_postings(spark, out).count() == n_pairs
    # Compaction folds the per-batch appends to one file per bucket,
    # preserves the layout, and changes neither counts nor the query.
    corpus_ops.compact_postings(spark, out + "_postings", n_buckets=4)
    files = [
        n for n in os.listdir(out + "_postings") if n.endswith(".parquet")
    ]
    assert 1 <= len(files) <= 4  # ≤ one per bucket (empty buckets: none)
    post2 = corpus_ops.read_postings(spark, out)
    assert post2.count() == n_pairs
    inc2 = bm25_topk_from_postings(
        post2, spark.read.parquet(out + "_lexicon"), terms, k=10
    ).collect()
    assert [tuple(r) for r in inc2] == [tuple(r) for r in bat]
    # Bucket-count mismatch on reopen refuses loudly.
    with _pytest.raises(ValueError, match="bucket"):
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out, str(tmp_path / "ckpt3"), apply_quality=False,
            maintain_lexicon=True, maintain_postings=True,
            postings_n_buckets=8,
        )


def test_bm25_wand_pruned_equals_unpruned(spark, tmp_path, monkeypatch):
    """bm25_topk_wand (VERDICT r15 item 1 — MaxScore/WAND impact-ordered
    pruning): on a corpus with one deliberately COMMON term, the pruned
    two-pass plan returns EXACTLY the unpruned bm25_topk_from_postings
    top-k (values, n_terms, ties), the common term's posting list is
    broadcast-semi-join filtered instead of doc-shuffled (plan pin),
    the pruning path genuinely activates (delegation is monkeypatch-
    fenced), the lexicon impact partials survive compaction, and every
    not-provably-safe case delegates to the exact unpruned query."""
    import os
    import time

    import pytest as _pytest

    from big_data_ml_pipeline_spark.operators import text as text_mod
    from big_data_ml_pipeline_spark.operators.text import (
        bm25_topk_from_postings,
        bm25_topk_wand,
    )
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    # 20 docs, every one contains the common term "the"; "zebra" and
    # "quux" are rare (df 5 and 4) with varied tf/dl so scores spread.
    docs = []
    for i in range(20):
        body = ["the"] * (1 + i % 3) + [f"filler{i}"] * (2 + i % 5)
        if i % 5 == 0:
            body += ["zebra"] * (1 + i % 2)
        if i % 5 == 2 and i < 18:
            body += ["quux"]
        docs.append((i, " ".join(body)))
    shards = [docs[:7], docs[7:14], docs[14:]]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(
            [(d, t, "en") for d, t in rows], ["doc_id", "text", "lang"]
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, ckpt, apply_quality=False,
        maintain_lexicon=True, maintain_postings=True,
        postings_n_buckets=4,
    )
    postings = corpus_ops.read_postings(spark, out)
    lexicon = spark.read.parquet(out + "_lexicon")
    assert {"max_tf", "min_dl"} <= set(lexicon.columns)
    terms = ("the", "zebra", "quux")
    k = 4
    want = bm25_topk_from_postings(
        postings, lexicon, terms, k=k
    ).collect()
    pruned = bm25_topk_wand(
        postings, lexicon, terms, k=k, common_df_frac=0.3
    )
    assert [tuple(r) for r in pruned.collect()] == [tuple(r) for r in want]
    # Plan pin: the common term's postings are scanned with their own
    # pushed IN-filter and reduced by a broadcast LEFT-SEMI join to the
    # rare-term candidate docs — never doc-shuffled whole.
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # A one-term IN collapses to EqualTo in the pushed filter.
    assert "EqualTo(token,the)" in plan or "In(token, [the])" in plan
    assert "In(token, [quux,zebra])" in plan
    assert "LeftSemi" in plan and "Broadcast" in plan
    # The pruning path genuinely ran: delegation is fenced off.
    def _boom(*a, **kw):
        raise AssertionError("bm25_topk_wand delegated unexpectedly")

    monkeypatch.setattr(text_mod, "bm25_topk_from_postings", _boom)
    again = bm25_topk_wand(
        postings, lexicon, terms, k=k, common_df_frac=0.3
    ).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in want]
    monkeypatch.undo()
    # Not-provably-safe cases DELEGATE to the exact unpruned query:
    # (a) k exceeds the rare pass's doc count; (b) every term rare.
    big_k = bm25_topk_wand(
        postings, lexicon, terms, k=15, common_df_frac=0.3
    ).collect()
    want15 = bm25_topk_from_postings(
        postings, lexicon, terms, k=15
    ).collect()
    assert [tuple(r) for r in big_k] == [tuple(r) for r in want15]
    all_rare = bm25_topk_wand(
        postings, lexicon, ("zebra", "quux"), k=3, common_df_frac=0.9
    ).collect()
    want_rare = bm25_topk_from_postings(
        postings, lexicon, ("zebra", "quux"), k=3
    ).collect()
    assert [tuple(r) for r in all_rare] == [tuple(r) for r in want_rare]
    # Impact partials fold exactly through lexicon compaction.
    corpus_ops.compact_lexicon(spark, out + "_lexicon")
    lex2 = spark.read.parquet(out + "_lexicon")
    after = bm25_topk_wand(
        postings, lex2, terms, k=k, common_df_frac=0.3
    ).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in want]
    # A lexicon without the impact columns refuses loudly.
    with _pytest.raises(ValueError, match="impact"):
        bm25_topk_wand(
            postings, lex2.drop("max_tf", "min_dl"), terms, k=k
        )


def test_bm25_wand_pass2_candidate_bound(spark, tmp_path):
    """The second MaxScore bound (VERDICT r16 item 2 — Turtle & Flood's
    per-candidate document test): essential candidates whose essential
    partial + ΣU(non-essential) < θ₀ are dropped BEFORE the common
    terms' posting lists are touched, results stay bit-identical to
    the unpruned query, and the skip provably FIRES on this fixture
    (candidate count strictly below essential-doc count). Also pins
    the r16 ADVICE guards: NULL impact partials (mixed-schema state)
    and an over-budget essential set both DELEGATE exactly, and a
    caller k1 far above the old constant-slack safe range (~12) stays
    exact under the k1-derived slack."""
    import os
    import time

    from pyspark.sql import functions as F

    from big_data_ml_pipeline_spark.operators.text import (
        bm25_topk_from_postings,
        bm25_topk_wand,
    )
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    # 30 docs, all containing the common term "the"; 10 contain the
    # rare term "zebra" with tf 1..10 and dl stretched the other way —
    # a wide essential-score spread, so low-tf/long-dl candidates sit
    # far below θ₀ while U("the") is tiny (df = N ⇒ idf ≈ 0.016).
    docs = []
    for i in range(30):
        body = ["the"]
        if i < 10:
            body += ["zebra"] * (10 - i)
            body += [f"pad{i}"] * (3 * i)
        else:
            body += [f"filler{i}"] * (2 + i % 4)
        docs.append((i, " ".join(body)))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    p = str(in_dir / "s0.parquet")
    spark.createDataFrame(
        [(d, t, "en") for d, t in docs], ["doc_id", "text", "lang"]
    ).toPandas().to_parquet(p, index=False)
    os.utime(p, (time.time(), time.time()))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, ckpt, apply_quality=False,
        maintain_lexicon=True, maintain_postings=True,
        postings_n_buckets=4,
    )
    postings = corpus_ops.read_postings(spark, out)
    lexicon = spark.read.parquet(out + "_lexicon")
    terms, k = ("the", "zebra"), 2
    want = [
        tuple(r)
        for r in bm25_topk_from_postings(
            postings, lexicon, terms, k=k
        ).collect()
    ]
    stats: dict = {}
    got = bm25_topk_wand(
        postings, lexicon, terms, k=k, common_df_frac=0.34,
        prune_stats=stats,
    ).collect()
    assert [tuple(r) for r in got] == want
    assert stats["delegated"] is False
    assert stats["essential"] == ["zebra"]
    assert stats["non_essential"] == ["the"]
    # The document test fired: fewer candidates reach the common-term
    # semi-join than docs carrying an essential posting.
    assert stats["n_essential_docs"] == 10
    assert 0 < stats["n_candidates"] < stats["n_essential_docs"]
    # k1 above the old +8-slack safe range: still exactly the unpruned
    # result (slack is now derived from k1 — ADVICE r16).
    want_k1 = [
        tuple(r)
        for r in bm25_topk_from_postings(
            postings, lexicon, terms, k=k, k1=20.0
        ).collect()
    ]
    s2: dict = {}
    got_k1 = bm25_topk_wand(
        postings, lexicon, terms, k=k, k1=20.0, common_df_frac=0.34,
        prune_stats=s2,
    ).collect()
    assert [tuple(r) for r in got_k1] == want_k1
    assert s2["delegated"] is False
    # NULL impact partials (a hand-mixed pre-impact state) DELEGATE to
    # the exact unpruned query instead of pruning on an underestimated
    # bound (ADVICE r16 medium).
    lex_null = lexicon.withColumn(
        "max_tf",
        F.when(F.col("token") == "zebra", F.lit(None).cast("long"))
        .otherwise(F.col("max_tf")),
    )
    s3: dict = {}
    got_null = bm25_topk_wand(
        postings, lex_null, terms, k=k, common_df_frac=0.34,
        prune_stats=s3,
    ).collect()
    assert s3["delegated"] is True
    assert [tuple(r) for r in got_null] == want
    # Essential-df budget: an over-budget essential set would make the
    # pass-2 broadcast corpus-scale — delegate instead (ADVICE r16).
    s4: dict = {}
    got_budget = bm25_topk_wand(
        postings, lexicon, terms, k=k, common_df_frac=0.34,
        max_candidate_df=0, prune_stats=s4,
    ).collect()
    assert s4["delegated"] is True
    assert [tuple(r) for r in got_budget] == want


def test_lexicon_impact_schema_append_guard(spark, tmp_path):
    """Appending to a lexicon state that predates the (max_tf, min_dl)
    impact columns REFUSES instead of silently creating a mixed-schema
    dir whose old batches read as NULL partials (ADVICE r16 medium —
    the postings positional-layout guard, mirrored)."""
    import os
    import time

    import pytest as _pytest

    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    p = str(in_dir / "s0.parquet")
    spark.createDataFrame(
        [(0, "alpha beta", "en")], ["doc_id", "text", "lang"]
    ).toPandas().to_parquet(p, index=False)
    os.utime(p, (time.time(), time.time()))
    out = str(tmp_path / "out")
    # A pre-impact-era lexicon: the old six-column schema.
    spark.createDataFrame(
        [(0, "alpha", 1, 1, 0, 0), (0, None, 0, 0, 1, 2)],
        "batch_id long, token string, df long, cnt long, "
        "n_docs long, sum_dl long",
    ).write.parquet(out + "_lexicon")
    with _pytest.raises(ValueError, match="impact partials"):
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out, str(tmp_path / "ckpt"), apply_quality=False,
            maintain_lexicon=True,
        )
    # The refused ingest must not have landed anything.
    assert not os.path.exists(out)


def test_positional_postings_phrase_retrieval(spark, tmp_path):
    """postings_positions + phrase_topk_from_postings (VERDICT r15
    item 2): the streamed positional postings carry each (token, doc)'s
    exact ascending offsets (stream == one-shot tokenize), the phrase
    probe's occurrence counts equal a direct token-window scan —
    including a REPEATED-token phrase — with zero corpus reads in the
    plan, positions survive compaction and replay, the positional ↔
    positionless layout mix refuses loudly, and the positionless BM25
    still answers from a positional state."""
    import os
    import time

    import pytest as _pytest

    from big_data_ml_pipeline_spark.operators.text import (
        bm25_topk,
        bm25_topk_from_postings,
        phrase_topk_from_postings,
    )
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    docs = [
        (0, "big data big data big"),
        (1, "data big data"),
        (2, "the quick brown fox jumps"),
        (3, "big data"),
        (4, "fox big data fox big"),
    ]
    shards = [docs[:2], docs[2:4], docs[4:]]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate(shards):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(
            [(d, t, "en") for d, t in rows], ["doc_id", "text", "lang"]
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, ckpt, apply_quality=False,
        maintain_lexicon=True, maintain_postings=True,
        postings_n_buckets=4, postings_positions=True,
    )
    postings = corpus_ops.read_postings(spark, out)
    # Stream == batch on the positional FACTS: every (token, doc)'s
    # offsets equal the one-shot tokenizer's.
    want_pos = {}
    for d, t in docs:
        for p, tok in enumerate(t.split()):
            want_pos.setdefault((tok, d), []).append(p)
    got_pos = {
        (r["token"], r["doc_id"]): list(r["positions"])
        for r in postings.collect()
    }
    assert got_pos == want_pos
    # tf stays len(positions): the positionless BM25 is unchanged.
    landed = spark.read.parquet(out)
    terms = ("big", "data")
    inc = bm25_topk_from_postings(
        postings, spark.read.parquet(out + "_lexicon"), terms, k=10
    ).collect()
    bat = bm25_topk(landed, terms, k=10).collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in bat]

    def py_phrase(phrase):
        n = len(phrase)
        want = {}
        for d, t in docs:
            toks = t.split()
            c = sum(
                1
                for p in range(len(toks) - n + 1)
                if toks[p:p + n] == list(phrase)
            )
            if c:
                want[d] = c
        return want

    for phrase in (("big", "data"), ("big", "data", "big"),
                   ("quick", "brown", "fox")):
        got = {
            r["doc_id"]: r["n_occurrences"]
            for r in phrase_topk_from_postings(
                postings, phrase, k=10
            ).collect()
        }
        assert got == py_phrase(phrase), phrase
    # Ranking: doc 0 (2 occurrences) first, then ids ascending.
    top = phrase_topk_from_postings(postings, ("big", "data"), k=10)
    assert [
        (r["doc_id"], r["n_occurrences"]) for r in top.collect()
    ] == [(0, 2), (1, 1), (3, 1), (4, 1)]
    # Zero corpus reads; token filter pushed to the pruned bucket scan.
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "text:string" not in plan
    assert "In(token, [big,data])" in plan
    # Compaction preserves positions and the probe byte-for-byte.
    corpus_ops.compact_postings(spark, out + "_postings", n_buckets=4)
    post2 = corpus_ops.read_postings(spark, out)
    assert {
        (r["token"], r["doc_id"]): list(r["positions"])
        for r in post2.collect()
    } == want_pos
    # Replay with a fresh checkpoint: nothing new (exact screen).
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, str(tmp_path / "ckpt2"), apply_quality=False,
        maintain_lexicon=True, maintain_postings=True,
        postings_n_buckets=4, postings_positions=True,
    )
    assert corpus_ops.read_postings(spark, out).count() == len(want_pos)
    # Layout guards: positionless reopen of a positional state (and
    # vice versa) refuse; phrase probe on a positionless state refuses.
    with _pytest.raises(ValueError, match="WITH positions"):
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out, str(tmp_path / "ckpt3"), apply_quality=False,
            maintain_lexicon=True, maintain_postings=True,
            postings_n_buckets=4,
        )
    out2 = str(tmp_path / "out2")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out2, str(tmp_path / "ckpt4"), apply_quality=False,
        maintain_lexicon=True, maintain_postings=True,
        postings_n_buckets=4,
    )
    with _pytest.raises(ValueError, match="WITHOUT positions"):
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, str(in_dir)),
            out2, str(tmp_path / "ckpt5"), apply_quality=False,
            maintain_lexicon=True, maintain_postings=True,
            postings_n_buckets=4, postings_positions=True,
        )
    with _pytest.raises(ValueError, match="POSITIONAL"):
        phrase_topk_from_postings(
            corpus_ops.read_postings(spark, out2), ("big", "data")
        )


def test_phrase_and_proximity_bm25_ranking(spark, tmp_path):
    """phrase/proximity BM25 compositions (VERDICT r16 item 3 —
    text.phrase_bm25_topk_from_postings /
    proximity_bm25_topk_from_postings) == an independent python
    reference of the whole quantized pipeline on a small corpus:
    candidacy matches the unweighted positional kits, every score
    equals term-BM25 + pseudo-term / inverse-span boost computed from
    first principles (half-up rounding, micro-unit quantization), and
    the ordering follows the COMPOSED score — including a doc whose
    raw occurrence count would rank it differently."""
    import math
    import os
    import time

    from big_data_ml_pipeline_spark.operators.text import (
        phrase_bm25_topk_from_postings,
        phrase_topk_from_postings,
        proximity_bm25_topk_from_postings,
        proximity_topk_from_postings,
    )
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    K1, B = 1.2, 0.75
    docs = [
        # doc 0: one phrase hit, short doc (high tf-normalized scores)
        (0, "alpha beta x"),
        # doc 1: two phrase hits but LONG doc — more occurrences yet a
        # weaker per-term BM25; the composed ranking must weigh both
        (1, "alpha beta y alpha beta " + " ".join(f"p{i}" for i in range(30))),
        # doc 2: both terms, never consecutive (proximity-only doc)
        (2, "alpha x x x beta z z"),
        # doc 3: only one of the terms — no candidacy anywhere
        (3, "alpha q q"),
        # doc 4: tight phrase + repeated rare term
        (4, "beta alpha beta w"),
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    p = str(in_dir / "s0.parquet")
    spark.createDataFrame(
        [(d, t, "en") for d, t in docs], ["doc_id", "text", "lang"]
    ).toPandas().to_parquet(p, index=False)
    os.utime(p, (time.time(), time.time()))
    out = str(tmp_path / "out")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, str(tmp_path / "ck"), apply_quality=False,
        maintain_lexicon=True, maintain_postings=True,
        postings_n_buckets=4, postings_positions=True,
    )
    postings = corpus_ops.read_postings(spark, out)
    lexicon = spark.read.parquet(out + "_lexicon")

    # -- python reference of the quantized pipeline -------------------
    def rhu(x):  # Spark F.round is HALF-UP; python round() is banker's
        return int(math.floor(x + 0.5))

    toked = {d: t.split() for d, t in docs}
    n_docs = len(docs)
    sum_dl = sum(len(v) for v in toked.values())
    terms = ["alpha", "beta"]

    def term_sum_q(doc_ids):
        df = {t: sum(1 for v in toked.values() if t in v) for t in terms}
        out_q = {}
        for d in doc_ids:
            v, dl, s = toked[d], len(toked[d]), 0
            for t in terms:
                tf = v.count(t)
                if not tf:
                    continue
                idf_q = rhu(
                    math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                    * 1e6
                )
                s += rhu(
                    (idf_q / 1e6) * (tf * (K1 + 1.0))
                    / (tf + K1 * (1 - B) + K1 * B * dl * n_docs / sum_dl)
                    * 1e6
                )
            out_q[d] = s
        return out_q

    # phrase: occurrences + pseudo-term score
    occ = {
        d: sum(
            1 for i in range(len(v) - 1)
            if v[i] == "alpha" and v[i + 1] == "beta"
        )
        for d, v in toked.items()
    }
    ph_docs = [d for d, c in occ.items() if c > 0]
    df_p = len(ph_docs)
    idf_p_q = rhu(
        math.log(1.0 + (n_docs - df_p + 0.5) / (df_p + 0.5)) * 1e6
    )
    tq = term_sum_q(ph_docs)
    want_phrase = sorted(
        (
            (
                d,
                occ[d],
                (
                    tq[d]
                    + rhu(
                        (idf_p_q / 1e6) * (occ[d] * (K1 + 1.0))
                        / (
                            occ[d] + K1 * (1 - B)
                            + K1 * B * len(toked[d]) * n_docs / sum_dl
                        )
                        * 1e6
                    )
                ) / 1e6,
            )
            for d in ph_docs
        ),
        key=lambda r: (-r[2], r[0]),
    )
    got = phrase_bm25_topk_from_postings(
        postings, lexicon, ("alpha", "beta"), k=10
    ).collect()
    assert [(r["doc_id"], r["n_occurrences"], r["score"]) for r in got] \
        == want_phrase
    # Candidacy matches the unweighted phrase kit.
    assert {r["doc_id"] for r in got} == {
        r["doc_id"]
        for r in phrase_topk_from_postings(
            postings, ("alpha", "beta"), k=10
        ).collect()
    }

    # proximity: min spans + inverse-span boost
    def min_span(v):
        best = None
        la = lb = None
        for i, t in enumerate(v):
            if t == "alpha":
                la = i
            elif t == "beta":
                lb = i
            if la is not None and lb is not None:
                s = abs(la - lb)
                best = s if best is None else min(best, s)
        return best
    spans = {d: min_span(v) for d, v in toked.items()}
    px_docs = [d for d, s in spans.items() if s is not None]
    tq2 = term_sum_q(px_docs)
    want_prox = sorted(
        (
            (d, spans[d], (tq2[d] + 1000000 // (spans[d] + 1)) / 1e6)
            for d in px_docs
        ),
        key=lambda r: (-r[2], r[0]),
    )
    got2 = proximity_bm25_topk_from_postings(
        postings, lexicon, ("alpha", "beta"), k=10
    ).collect()
    assert [(r["doc_id"], r["min_span"], r["score"]) for r in got2] \
        == want_prox
    assert {r["doc_id"] for r in got2} == {
        r["doc_id"]
        for r in proximity_topk_from_postings(
            postings, ("alpha", "beta"), k=10
        ).collect()
    }
    # The composed ranking genuinely reordered: doc 1 has MORE phrase
    # occurrences than doc 0 yet must not outrank it (length penalty).
    order = [r["doc_id"] for r in got]
    assert occ[1] > occ[0] and order.index(0) < order.index(1)


def test_proximity_minimal_span_vs_bruteforce(spark, tmp_path):
    """proximity_topk_from_postings == a brute-force all-windows
    python reference on every doc (minimal span covering one
    occurrence of each distinct term), including repeated query
    tokens, multi-occurrence docs, the max_span filter, asc-span/
    asc-id ordering, and the positionless/1-term refusals."""
    import os
    import time

    import pytest as _pytest

    from big_data_ml_pipeline_spark.operators.text import (
        proximity_topk_from_postings,
    )
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    docs = [
        (0, "alpha x x beta"),
        (1, "beta alpha"),
        (2, "alpha x beta x x alpha beta"),
        (3, "alpha alpha x x x beta"),
        (4, "alpha only here"),
        (5, "x beta x"),
        (6, "gamma alpha beta gamma"),
        # High-occurrence docs (VERDICT r16 item 7): the O(L·n)
        # single-pass fold must stay exact when a query term repeats
        # many times — L here is 40+ matched occurrences.
        (7, " ".join(["alpha", "x", "beta"] * 20 + ["alpha"])),
        (8, " ".join(["beta"] * 30 + ["x", "alpha"] + ["beta"] * 10)),
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, (d, t) in enumerate(docs):
        p = str(in_dir / f"s{i}.parquet")
        spark.createDataFrame(
            [(d, t, "en")], ["doc_id", "text", "lang"]
        ).toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))
    out = str(tmp_path / "out")
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(in_dir)),
        out, str(tmp_path / "ck"), apply_quality=False,
        maintain_lexicon=True, maintain_postings=True,
        postings_n_buckets=4, postings_positions=True,
    )
    postings = corpus_ops.read_postings(spark, out)

    def brute(terms):
        dset = sorted(set(terms))
        want = {}
        for d, t in docs:
            toks = t.split()
            best = None
            for s in range(len(toks)):
                for e2 in range(s, len(toks)):
                    win = set(toks[s:e2 + 1])
                    if all(x in win for x in dset):
                        span = e2 - s
                        best = span if best is None else min(best, span)
                        break
            if best is not None:
                want[d] = best
        return want

    for terms in (("alpha", "beta"), ("alpha", "beta", "gamma"),
                  ("beta", "alpha", "beta")):
        got = {
            r["doc_id"]: r["min_span"]
            for r in proximity_topk_from_postings(
                postings, terms, k=10
            ).collect()
        }
        assert got == brute(terms), terms
    # Ordering + max_span: spans asc, ids asc; filter drops wide wins.
    top = proximity_topk_from_postings(
        postings, ("alpha", "beta"), k=10, max_span=2
    ).collect()
    want = sorted(
        ((s, d) for d, s in brute(("alpha", "beta")).items() if s <= 2)
    )
    assert [(r["min_span"], r["doc_id"]) for r in top] == want
    with _pytest.raises(ValueError, match=">= 2"):
        proximity_topk_from_postings(postings, ("alpha", "alpha"))
    with _pytest.raises(ValueError, match="POSITIONAL"):
        proximity_topk_from_postings(
            postings.drop("positions"), ("alpha", "beta")
        )


def test_merge_ingest_states_equals_fresh_ingest(spark, tmp_path):
    """merge_ingest_states (VERDICT r16 item 5): two independently
    ingested sources merge into one queryable state whose corpus,
    postings, derived lexicon/vocab, and EVERY retrieval probe (BM25,
    WAND, phrase, proximity) are bit-identical to a fresh single
    ingest over the concatenated shard set — including a planted
    cross-source exact duplicate (first-landed wins) — and the merged
    state reopens for continued ingest. Refusals: colliding doc ids,
    existing destination, missing postings side."""
    import os
    import time

    import pytest as _pytest

    from big_data_ml_pipeline_spark.operators.text import (
        bm25_topk_from_postings,
        bm25_topk_wand,
        phrase_topk_from_postings,
        proximity_topk_from_postings,
    )
    from big_data_ml_pipeline_spark.streaming import corpus as corpus_ops

    docs_a = [
        (0, "the quick brown fox jumps the fence"),
        (1, "the lazy dog sleeps by the big fence"),
        (2, "quick quick fox fox den"),
        (3, "a solitary zebra grazes the plain"),
    ]
    docs_b = [
        (10, "the quick brown fox jumps the fence"),  # exact dup of 0
        (11, "brown bears roam the quick river quick"),
        (12, "zebra and fox share the plain den"),
        (13, "the the the filler words here"),
    ]

    def write_src(name, shard_lists, t0):
        d = tmp_path / name
        d.mkdir()
        for i, rows in enumerate(shard_lists):
            p = str(d / f"{name}_s{i}.parquet")
            spark.createDataFrame(
                [(i2, t, "en") for i2, t in rows],
                ["doc_id", "text", "lang"],
            ).toPandas().to_parquet(p, index=False)
            os.utime(p, (t0 + i, t0 + i))
        return str(d)

    t0 = time.time()
    in_a = write_src("a", [docs_a[:2], docs_a[2:]], t0)
    in_b = write_src("b", [docs_b[:2], docs_b[2:]], t0 + 10)
    # Concatenated input: A's shards then B's (same files, same order).
    in_all = tmp_path / "all"
    in_all.mkdir()
    import shutil
    for src in (in_a, in_b):
        for f in sorted(os.listdir(src)):
            shutil.copy2(os.path.join(src, f), str(in_all / f))

    def ingest(in_dir, out):
        corpus_ops.ingest_documents_stream(
            corpus_ops.read_documents_stream(spark, in_dir),
            out, out + "_ck", apply_quality=False,
            maintain_lexicon=True, maintain_postings=True,
            maintain_vocab=True,
            postings_n_buckets=4, postings_positions=True,
        )
        return out

    out_a = ingest(in_a, str(tmp_path / "out_a"))
    out_b = ingest(in_b, str(tmp_path / "out_b"))
    fresh = ingest(str(in_all), str(tmp_path / "fresh"))

    dest = str(tmp_path / "merged")
    res = corpus_ops.merge_ingest_states(
        spark, out_a, out_b, dest, postings_n_buckets=4
    )
    assert res["n_dropped_b"] == 1 and res["n_docs"] == 7

    # Corpus: same landed (id, text) set as the fresh ingest.
    want_corpus = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(fresh).collect()
    }
    got_corpus = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(dest).collect()
    }
    assert got_corpus == want_corpus

    # Every retrieval probe answers identically from either state.
    def probes(out):
        po = corpus_ops.read_postings(spark, out)
        lex = spark.read.parquet(out + "_lexicon")
        return [
            [tuple(r) for r in bm25_topk_from_postings(
                po, lex, ("quick", "zebra", "the"), k=5).collect()],
            [tuple(r) for r in bm25_topk_wand(
                po, lex, ("zebra", "the", "quick"), k=2,
                common_df_frac=0.5).collect()],
            [tuple(r) for r in phrase_topk_from_postings(
                po, ("quick", "brown"), k=5).collect()],
            [tuple(r) for r in proximity_topk_from_postings(
                po, ("fox", "den"), k=5).collect()],
        ]

    assert probes(dest) == probes(fresh)

    # Derived vocab == fresh vocab (query-time fold: sum per token).
    def vocab_fold(out):
        return {
            r["token"]: r["cnt"]
            for r in spark.read.parquet(out + "_vocab")
            .groupBy("token").agg(F.sum("cnt").alias("cnt")).collect()
        }
    assert vocab_fold(dest) == vocab_fold(fresh)

    # The merged state reopens for continued ingest; the new doc is
    # retrievable and the pre-merge answers stand.
    more = tmp_path / "more"
    more.mkdir()
    p = str(more / "m0.parquet")
    spark.createDataFrame(
        [(20, "entirely novel aardvark text", "en")],
        ["doc_id", "text", "lang"],
    ).toPandas().to_parquet(p, index=False)
    os.utime(p, (time.time() + 60, time.time() + 60))
    corpus_ops.ingest_documents_stream(
        corpus_ops.read_documents_stream(spark, str(more)),
        dest, dest + "_ck2", apply_quality=False,
        maintain_lexicon=True, maintain_postings=True,
        maintain_vocab=True,
        postings_n_buckets=4, postings_positions=True,
    )
    po2 = corpus_ops.read_postings(spark, dest)
    assert po2.filter(F.col("token") == "aardvark").count() == 1
    assert spark.read.parquet(dest).count() == 8

    # Refusals.
    with _pytest.raises(ValueError, match="already exists"):
        corpus_ops.merge_ingest_states(spark, out_a, out_b, dest)
    with _pytest.raises(ValueError, match="BOTH sources"):
        corpus_ops.merge_ingest_states(
            spark, out_a, out_a, str(tmp_path / "m2")
        )
    with _pytest.raises(ValueError, match="missing"):
        corpus_ops.merge_ingest_states(
            spark, out_a, str(tmp_path / "nope"), str(tmp_path / "m3")
        )
