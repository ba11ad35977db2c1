"""Resumable sharded export: per-shard _SUCCESS commit, crash-resume
equality, committed-only readback (sinks/shard_export.py)."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
import ray.data as rd

from dstream_ray.sinks.shard_export import (
    SUCCESS,
    completed_shards,
    export_shards,
    read_shards,
)


def _corpus(n=200):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array([f"doc {i} body" for i in range(n)]),
    }))


def _frame(ds) -> pd.DataFrame:
    return (ds.to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_export_then_full_readback(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    res = export_shards(_corpus(), out, n_shards=4)
    assert res["written"] == [0, 1, 2, 3] and res["skipped"] == []
    assert completed_shards(out, 4) == {0, 1, 2, 3}
    back = _frame(read_shards(out))
    pd.testing.assert_frame_equal(
        back[["doc_id", "text"]], _frame(_corpus())[["doc_id", "text"]])


def test_resume_rewrites_only_uncommitted(ray_session, tmp_path):
    """Kill one shard's _SUCCESS (simulating a crash mid-write): resume
    rewrites exactly that shard, leaves committed shard files untouched,
    and the final content equals an uninterrupted run."""
    out = str(tmp_path / "exp")
    export_shards(_corpus(), out, n_shards=4)
    victim = os.path.join(out, "shard=2")
    os.remove(os.path.join(victim, SUCCESS))
    # corrupt the victim dir to prove it is wiped, not appended to
    with open(os.path.join(victim, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    kept_files = {
        d: sorted(os.listdir(os.path.join(out, d)))
        for d in os.listdir(out) if d != "shard=2"
    }
    kept_mtimes = {
        d: [os.path.getmtime(os.path.join(out, d, f)) for f in fs]
        for d, fs in kept_files.items()
    }
    res = export_shards(_corpus(), out, n_shards=4)
    assert res["written"] == [2] and res["skipped"] == [0, 1, 3]
    assert not os.path.exists(os.path.join(victim, "garbage.parquet"))
    for d, fs in kept_files.items():  # committed shards untouched
        assert sorted(os.listdir(os.path.join(out, d))) == fs
        assert [os.path.getmtime(os.path.join(out, d, f)) for f in fs] \
            == kept_mtimes[d]
    back = _frame(read_shards(out))
    pd.testing.assert_frame_equal(
        back[["doc_id", "text"]], _frame(_corpus())[["doc_id", "text"]])


def test_readback_skips_uncommitted(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    export_shards(_corpus(), out, n_shards=4)
    shutil.os.remove(os.path.join(out, "shard=1", SUCCESS))
    back = read_shards(out).to_pandas()
    full = _frame(_corpus())
    assert 0 < len(back) < len(full)
    # every returned row belongs to a committed shard; none from shard 1
    from dstream_ray.common import fnv1a_u64_py
    shards = {fnv1a_u64_py(str(d)) % 4 for d in back["doc_id"]}
    assert 1 not in shards


def test_fully_committed_export_is_a_noop(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    export_shards(_corpus(), out, n_shards=4)
    res = export_shards(_corpus(), out, n_shards=4)
    assert res["written"] == [] and res["skipped"] == [0, 1, 2, 3]
