"""Failure-injection matrix (FIXTURES.md §3, mirroring the reference's
handshake behavior tests pkg/executor/handshake_test.go): config errors,
stage crashes mid-epoch, and clean-shutdown/resume semantics."""

import os

import pytest

from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob
from dstream_ray.sources.transcripts import generate_transcripts


@pytest.fixture()
def feed(tmp_path):
    d = tmp_path / "feed"
    generate_transcripts(n_convs=12, mean_turns=6, seed=4, out_path=str(d), n_shards=3)
    return d


def test_unknown_operator_fails_fast(ray_session, tmp_path, feed):
    """'error' behavior: invalid config surfaces as a clear exception and
    commits nothing."""
    cfg = StreamingConfig(
        feed_dir=str(feed), out_dir=str(tmp_path / "out"), num_partitions=2,
        operators={"nonexistent_window": {}},
    )
    job = StreamingJob(cfg)
    with pytest.raises(Exception) as ei:
        job.run()
    assert "nonexistent_window" in str(ei.value)
    assert job.store.last_committed() is None  # no partial commit


def test_stage_crash_mid_epoch_no_partial_commit(ray_session, tmp_path, feed):
    """'ready_then_crash': a kernel raising during epoch 1 must leave the
    commit sequence at epoch 0; a fixed engine then resumes to completion."""
    cfg = StreamingConfig(
        feed_dir=str(feed), out_dir=str(tmp_path / "out"), num_partitions=2,
        files_per_epoch=1, operators={"tumbling": {"width_s": 300}},
    )
    job = StreamingJob(cfg)
    job.run(max_epochs=1, flush_at_end=False)
    assert job.store.last_committed()[0] == 0

    # inject a kernel that raises while processing the epoch's batches
    # (sliding asserts width % slide == 0 inside the reduce task)
    bad_cfg = StreamingConfig(
        feed_dir=str(feed), out_dir=str(tmp_path / "out"), num_partitions=2,
        files_per_epoch=1,
        operators={"sliding": {"width_s": 100, "slide_s": 33}},
    )
    with pytest.raises(Exception):
        StreamingJob(bad_cfg).run(max_epochs=1, flush_at_end=False)
    assert job.store.last_committed()[0] == 0  # epoch 1 not committed

    # recovery: healthy engine resumes and completes
    st = StreamingJob(cfg).run()
    assert st["flushed"] and st["file_cursor"] == 3
    events = job.sink.read_op("events")
    import pyarrow.parquet as pq

    expected = sum(
        pq.read_table(str(feed / f)).num_rows for f in sorted(os.listdir(feed))
    )
    assert events.num_rows == expected


def test_clean_stop_then_resume_continues(ray_session, tmp_path, feed):
    """graceful-shutdown analog: stopping after any epoch commits a
    consistent state; a new driver picks up exactly where it left off."""
    cfg = StreamingConfig(
        feed_dir=str(feed), out_dir=str(tmp_path / "out"), num_partitions=2,
        files_per_epoch=1, operators={"session": {"gap_s": 120}},
    )
    StreamingJob(cfg).run(max_epochs=2, flush_at_end=False)
    st1 = StreamingJob(cfg).status()
    assert st1["file_cursor"] == 2 and not st1["flushed"]
    st2 = StreamingJob(cfg).run()
    assert st2["file_cursor"] == 3 and st2["flushed"]


def test_resume_with_changed_config_rejected(ray_session, tmp_path, feed):
    cfg = StreamingConfig(
        feed_dir=str(feed), out_dir=str(tmp_path / "out"), num_partitions=2,
        files_per_epoch=1, operators={"tumbling": {"width_s": 300}},
    )
    StreamingJob(cfg).run(max_epochs=1, flush_at_end=False)

    bad_p = StreamingConfig(
        feed_dir=str(feed), out_dir=str(tmp_path / "out"), num_partitions=4,
        files_per_epoch=1, operators={"tumbling": {"width_s": 300}},
    )
    with pytest.raises(ValueError, match="num_partitions"):
        StreamingJob(bad_p).run()

    bad_ops = StreamingConfig(
        feed_dir=str(feed), out_dir=str(tmp_path / "out"), num_partitions=2,
        files_per_epoch=1, operators={"tumbling": {"width_s": 600}},
    )
    with pytest.raises(ValueError, match="operator"):
        StreamingJob(bad_ops).run()

    # unchanged config resumes fine
    st = StreamingJob(cfg).run()
    assert st["flushed"]
