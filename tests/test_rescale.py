"""Checkpoint rescaling: a job interrupted mid-stream, rescaled to a
different partition count, and resumed must emit the same committed sinks
as an uninterrupted run — growing AND shrinking — and non-key-separable
state (generational Bloom) must be rejected loudly."""

import numpy as np
import pandas as pd
import pytest

from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob
from dstream_ray.sources.transcripts import generate_transcripts

GAP_S = 120
WIDTH_S = 300

OPS = {
    "tumbling": {"width_s": WIDTH_S},
    "sliding": {"width_s": WIDTH_S, "slide_s": WIDTH_S // 3},
    "session": {"gap_s": GAP_S},
    "session_join": {"gap_s": GAP_S},
    "cep": {"pattern": "ua*t"},
    "interval_join": {"within_s": WIDTH_S},
    "outer_join": {"within_s": WIDTH_S},
    "running": {},
    "anomaly": {"z": 2, "min_prior": 3},
    "sessionize": {"gap_s": GAP_S},
    "tumbling_distinct": {"width_s": WIDTH_S},
    "tumbling_global": {"width_s": WIDTH_S},
    "tumbling_counts": {"width_s": WIDTH_S},
    "tumbling_hll": {"width_s": WIDTH_S},
    "tumbling_qsketch": {"width_s": WIDTH_S},
    "tumbling_sample": {"width_s": WIDTH_S, "k": 5},
    "tumbling_sample@role": {"width_s": WIDTH_S, "k": 3, "by": "role"},
    "tumbling_topk": {"width_s": WIDTH_S, "capacity": 50},
    "dedup": {},
    "upsert": {},
}


def _canon_sample(df: pd.DataFrame) -> pd.DataFrame:
    """Per-partition partial layout differs legitimately after a rescale;
    the invariant is the CONSUMER's global bottom-k per window."""
    return (df.sort_values(["window_id", "priority", "conv_id", "turn_idx"])
            .groupby("window_id").head(5)
            .drop(columns=["priority"]))

# how to canonicalize each sink for comparison: global partials merge
# (their partition layout legitimately differs); everything else compares
# as an exact row multiset
MERGES = {
    "tumbling_global": ("sum", ["window_id"]),
    "tumbling_counts": ("sum", ["window_id", "value"]),
    "tumbling_hll": ("max", ["window_id", "bucket"]),
    "tumbling_qsketch": ("sum", ["window_id", "bucket"]),
    "tumbling_sample": _canon_sample,
    "tumbling_sample@role": lambda df: (
        df.sort_values(["window_id", "stratum", "priority", "conv_id", "turn_idx"])
        .groupby(["window_id", "stratum"]).head(3)
        .drop(columns=["priority"])),
    "tumbling_topk": ("sum", ["window_id", "value"]),
}


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feed")
    generate_transcripts(
        n_convs=40, mean_turns=10, seed=23, session_gap_s=GAP_S,
        out_path=str(d), n_shards=6,
    )
    return d


def _cfg(tmp_path, feed_dir, P, ops=None):
    return StreamingConfig(
        feed_dir=str(feed_dir), out_dir=str(tmp_path / "out"),
        num_partitions=P, files_per_epoch=2,
        operators=dict(ops if ops is not None else OPS),
    )


def _canon(job, op):
    t = job.sink.read_op(op)
    df = t.to_pandas() if t is not None else pd.DataFrame()
    if op in MERGES:
        if callable(MERGES[op]):
            df = MERGES[op](df) if len(df) else df
        else:
            how, keys = MERGES[op]
            vals = [c for c in df.columns if c not in keys]
            df = df.groupby(keys, as_index=False)[vals].agg(how)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _assert_same_sinks(job_a, job_b):
    for op in ["events", *OPS]:
        pd.testing.assert_frame_equal(
            _canon(job_a, op), _canon(job_b, op), check_dtype=False, obj=op
        )


@pytest.mark.parametrize("new_p", [5, 2])
def test_rescale_then_resume_matches_uninterrupted(
    ray_session, tmp_path, feed_dir, new_p
):
    cfg_a = _cfg(tmp_path / "a", feed_dir, 3)
    job_a = StreamingJob(cfg_a)
    job_a.run()

    cfg_b = _cfg(tmp_path / f"b{new_p}", feed_dir, 3)
    StreamingJob(cfg_b).run(max_epochs=1, flush_at_end=False)
    res = StreamingJob(cfg_b).rescale(new_p)
    assert res["status"] == "rescaled"
    assert (res["from_partitions"], res["to_partitions"]) == (3, new_p)

    cfg_b2 = _cfg(tmp_path / f"b{new_p}", feed_dir, new_p)
    job_b = StreamingJob(cfg_b2)
    job_b.run()
    _assert_same_sinks(job_a, job_b)


WM_OPS = {
    # the watermark-closure family: scalar emission cursors (emitted_below /
    # wm_below) that a rescale must broadcast-MIN, never sum (a summed cursor
    # late-drops valid rows on p0 and re-opens committed windows elsewhere)
    "tumbling@wm": {"width_s": WIDTH_S, "closure": "watermark"},
    "sliding@wm": {"width_s": WIDTH_S, "slide_s": WIDTH_S // 3, "closure": "watermark"},
    "session@wm": {"gap_s": GAP_S, "closure": "watermark"},
    "session_with_join@wm": {"gap_s": GAP_S, "closure": "watermark"},
}


@pytest.fixture(scope="module")
def wm_feed_dir(tmp_path_factory):
    """Globally ts-ordered feed — the ordering contract under which
    watermark closure is exact (see tumbling_kernel docstring)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("wmfeed")
    # seed/size chosen to actually spread the per-partition wm_below cursors:
    # this data re-emitted 17 sliding windows under the pre-fix sum/min rules
    tbl = generate_transcripts(n_convs=60, mean_turns=12, seed=5, session_gap_s=GAP_S)
    df = tbl.to_pandas().sort_values(["ts", "conv_id", "turn_idx"]).reset_index(drop=True)
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    n, shards = tbl.num_rows, 6
    bounds = np.linspace(0, n, shards + 1).astype(int)
    for i in range(shards):
        pq.write_table(
            tbl.slice(bounds[i], bounds[i + 1] - bounds[i]),
            str(d / f"feed-{i:02d}.parquet"),
        )
    return d


@pytest.mark.parametrize("new_p", [5, 2])
def test_rescale_watermark_closure_matches_uninterrupted(
    ray_session, tmp_path, wm_feed_dir, new_p
):
    """Rescaling mid-stream with watermark-closure operators (and relay
    cursor eviction active, so the relay carries its wm_us scalar) must
    produce the same committed sinks as an uninterrupted run."""

    def cfg(base, P):
        c = _cfg(base, wm_feed_dir, P, ops=WM_OPS)
        c.relay_evict_idle_s = 24 * 3600  # far above the feed's span: no evictions
        return c

    job_a = StreamingJob(cfg(tmp_path / "a", 3))
    job_a.run()

    StreamingJob(cfg(tmp_path / f"b{new_p}", 3)).run(max_epochs=2, flush_at_end=False)
    res = StreamingJob(cfg(tmp_path / f"b{new_p}", 3)).rescale(new_p)
    assert res["status"] == "rescaled"
    job_b = StreamingJob(cfg(tmp_path / f"b{new_p}", new_p))
    job_b.run()
    for op in ["events", *WM_OPS]:
        pd.testing.assert_frame_equal(
            _canon(job_a, op), _canon(job_b, op), check_dtype=False, obj=op
        )


def test_resume_without_rescale_still_rejected(ray_session, tmp_path, feed_dir):
    cfg = _cfg(tmp_path, feed_dir, 3)
    StreamingJob(cfg).run(max_epochs=1, flush_at_end=False)
    bad = _cfg(tmp_path, feed_dir, 5)
    with pytest.raises(ValueError, match="different num_partitions"):
        StreamingJob(bad).run()


def test_rescale_rejects_bloom_state(ray_session, tmp_path, feed_dir):
    ops = {"tumbling": {"width_s": WIDTH_S}, "dedup_bloom": {"bits": 1 << 20}}
    cfg = _cfg(tmp_path, feed_dir, 3, ops=ops)
    StreamingJob(cfg).run(max_epochs=1, flush_at_end=False)
    with pytest.raises(ValueError, match="cannot be rescaled"):
        StreamingJob(cfg).rescale(5)


def test_rescale_requires_checkpoint_and_noops_same_p(ray_session, tmp_path, feed_dir):
    cfg = _cfg(tmp_path / "x", feed_dir, 3)
    with pytest.raises(ValueError, match="no committed checkpoint"):
        StreamingJob(cfg).rescale(5)
    StreamingJob(cfg).run(max_epochs=1, flush_at_end=False)
    assert StreamingJob(cfg).rescale(3)["status"] == "noop"


def test_crash_mid_rescale_recovers(ray_session, tmp_path, feed_dir):
    """A crash between the rescaled snapshot write and its manifest commit
    leaves the OLD checkpoint authoritative: resume at the old P works,
    and retrying the rescale completes. (Rescale is atomic through the
    same commit-record protocol as epochs.)"""
    import os

    cfg_a = _cfg(tmp_path / "a", feed_dir, 3)
    job_a = StreamingJob(cfg_a)
    job_a.run()

    cfg = _cfg(tmp_path / "b", feed_dir, 3)
    StreamingJob(cfg).run(max_epochs=1, flush_at_end=False)
    job = StreamingJob(cfg)
    job.rescale(5)
    e, man = job.store.last_committed()
    assert man.get("rescaled_from") == 3
    os.remove(job.store._commit_path(e))  # "crash" before commit landed

    # old checkpoint stands: the un-rescaled resume path still works…
    job2 = StreamingJob(cfg)
    job2.run()
    _assert_same_sinks(job_a, job2)
    # …and a retried rescale on a FRESH interrupted copy also completes
    cfg_c = _cfg(tmp_path / "c", feed_dir, 3)
    StreamingJob(cfg_c).run(max_epochs=1, flush_at_end=False)
    jc = StreamingJob(cfg_c)
    jc.rescale(5)
    jc.store.delete_commit(jc.store.last_committed()[0])
    assert jc.rescale(5)["status"] == "rescaled"  # retry heals
    cfg_c2 = _cfg(tmp_path / "c", feed_dir, 5)
    jc2 = StreamingJob(cfg_c2)
    jc2.run()
    _assert_same_sinks(job_a, jc2)
