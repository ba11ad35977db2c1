"""Live provider-binary source tests: the reference's handshake failure
matrix (handshake_test.go:18-122) + the counter-demo E2E through the full
engine (readme.md:16-51)."""

import json
import os
import sys

import pytest

from dstream_ray.sources.provider import (
    EnvelopeBridge,
    ProviderError,
    ProviderProcess,
    provider_to_feed,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "provider_fixture.py")


def spawn(behavior: str, config=None, **kw) -> ProviderProcess:
    return ProviderProcess(
        [sys.executable, FIXTURE],
        config or {},
        env={"TEST_PROVIDER_BEHAVIOR": behavior},
        **kw,
    )


def test_handshake_ready_and_stream():
    p = spawn("counter", {"limit": 5})
    lines = list(p.lines())
    assert len(lines) == 5
    assert json.loads(lines[0])["data"]["value"] == 0
    p.check_stream_ok()


def test_handshake_error_reports_message_and_stderr():
    with pytest.raises(ProviderError, match="connectionString is required"):
        spawn("error")


def test_handshake_crash_detected_immediately():
    import time

    t0 = time.time()
    with pytest.raises(ProviderError, match="crashed during startup|closed stdout"):
        spawn("crash", ready_timeout_s=30.0)
    assert time.time() - t0 < 5  # exit detection, not the 30s timeout


def test_handshake_hang_times_out():
    with pytest.raises(ProviderError, match="timed out waiting for ready"):
        spawn("hang", ready_timeout_s=0.5)


def test_handshake_crash_with_stderr_context():
    with pytest.raises(ProviderError, match="FATAL: out of memory"):
        spawn("crash_with_stderr")


def test_legacy_provider_first_line_is_data():
    p = spawn("legacy")
    lines = list(p.lines())
    assert len(lines) == 2  # first (non-handshake) line forwarded as data
    assert json.loads(lines[0])["metadata"]["TableName"] == "legacy"
    p.check_stream_ok()


def test_ready_then_crash_raises_midstream():
    p = spawn("ready_then_crash")
    lines = list(p.lines())
    assert len(lines) == 2
    with pytest.raises(ProviderError, match="exited with code 1"):
        p.check_stream_ok()


def test_sigterm_graceful_stop():
    p = spawn("counter", {"limit": 10**9})
    # provider is mid-emission; SIGTERM must stop it within the grace window
    rc = p.stop(grace_s=5.0)
    assert rc is not None


def test_payload_fidelity_through_bridge():
    """Echo-style fidelity: tricky payloads survive byte-stable through the
    envelope bridge (sorted-key canonical serialization both sides)."""
    payloads = [
        {"unicode": "héllo ☃ 日本語", "nested": {"a": [1, 2, {"b": None}]}},
        {"empty": {}, "big": 2**53 - 1, "neg": -1.5},
        {"quotes": 'she said "hi"', "newline": "a\nb", "tab": "a\tb"},
    ]
    lines = [
        json.dumps({"data": d, "metadata": {"TableName": "t", "OperationType": "u"}})
        for d in payloads
    ]
    out = EnvelopeBridge().to_table(lines)
    got = [json.loads(t) for t in out["text"].to_pylist()]
    assert got == payloads


def test_bridge_turn_idx_monotone_across_shards():
    b = EnvelopeBridge()
    mk = lambda v: json.dumps(
        {"data": {"v": v}, "metadata": {"TableName": "t", "OperationType": "i"}}
    )
    t1 = b.to_table([mk(0), mk(1)])
    t2 = b.to_table([mk(2), mk(3)])
    assert t1["turn_idx"].to_pylist() == [0, 1]
    assert t2["turn_idx"].to_pylist() == [2, 3]  # continues, never restarts


def test_provider_feeds_follow_mode_live(ray_session, tmp_path):
    """Live tail: a provider writes shards WHILE the engine's follow() poll
    loop consumes them — the full CDC loop (spawn -> handshake -> relay ->
    shard -> poll -> window -> exactly-once sink) with no pre-staged feed."""
    import threading

    from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob

    feed = str(tmp_path / "feed")
    os.makedirs(feed)

    def produce():
        p = spawn("counter", {"limit": 30, "tables": ["persons"]})
        provider_to_feed(p, feed, rows_per_shard=10)

    t = threading.Thread(target=produce)
    t.start()
    cfg = StreamingConfig(
        feed_dir=feed,
        out_dir=str(tmp_path / "out"),
        num_partitions=2,
        files_per_epoch=1,
        operators={"tumbling": {"width_s": 3600}},
    )
    job = StreamingJob(cfg)
    status = job.follow(poll_interval_s=0.1, idle_limit_s=3.0)
    t.join()
    # late-arriving shards after the first idle window: one more follow pass
    status = job.follow(poll_interval_s=0.1, idle_limit_s=2.0)
    events = job.sink.read_op("events").to_pandas()
    assert len(events) == 30
    assert sorted(events["turn_idx"]) == list(range(30))
    assert status["flushed"]


def test_counter_provider_e2e_through_engine(ray_session, tmp_path):
    """The reference's counter demo end-to-end: live child process ->
    handshake -> stdout envelopes -> feed shards -> full streaming engine
    (relay + session windows + exactly-once sink)."""
    from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob

    feed = str(tmp_path / "feed")
    p = spawn("counter", {"limit": 40, "tables": ["persons", "cars"]})
    shards = provider_to_feed(p, feed, rows_per_shard=16)
    assert len(shards) == 5  # 80 envelopes / 16

    cfg = StreamingConfig(
        feed_dir=feed,
        out_dir=str(tmp_path / "out"),
        num_partitions=2,
        files_per_epoch=2,
        operators={"tumbling": {"width_s": 3600}},
    )
    job = StreamingJob(cfg)
    job.run()
    events = job.sink.read_op("events").to_pandas()
    # exactly-once relay: every (table, turn) exactly once, payloads intact
    assert len(events) == 80
    assert set(events["conv_id"]) == {"persons", "cars"}
    per = events.groupby("conv_id")["turn_idx"].agg(["count", "min", "max"])
    assert (per["count"] == 40).all() and (per["min"] == 0).all() and (per["max"] == 39).all()
    v0 = json.loads(events.sort_values(["conv_id", "turn_idx"]).iloc[0]["text"])
    assert v0 == {"payload": "c-0", "value": 0}


def test_raw_relay_mode_through_engine(ray_session, tmp_path):
    """fmt='ndjson' byte relay: raw shards, engine-side parallel parsing,
    dual-cursor dedup across shards — same delivered rows as parquet mode."""
    from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob

    feed = str(tmp_path / "feed")
    p = spawn("counter", {"limit": 40, "tables": ["persons", "cars"]})
    shards = provider_to_feed(p, feed, rows_per_shard=16, fmt="ndjson")
    # rows_per_shard is a lower bound (chunk-granularity sharding): a fast
    # provider whose whole stream fits one buffered chunk yields one shard
    assert all(s.endswith(".ndjson") for s in shards) and 1 <= len(shards) <= 5
    cfg = StreamingConfig(
        feed_dir=feed, out_dir=str(tmp_path / "out"), num_partitions=2,
        files_per_epoch=2, operators={},
    )
    job = StreamingJob(cfg)
    job.run()
    events = job.sink.read_op("events").to_pandas()
    assert len(events) == 80
    per = events.groupby("conv_id")["turn_idx"].agg(["count", "min", "max"])
    assert (per["count"] == 40).all() and (per["min"] == 0).all() and (per["max"] == 39).all()
