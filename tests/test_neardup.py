"""Streaming banded-MinHash near-dup suppression (stages/capture.neardup_kernel):
epoch-split invariance (incl. mid-batch generation rotations), transitive
keep-first semantics, the two-generation forget window, bounded state under
rotation, rescale rejection, and the full-engine path vs the SQL band-
collision oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dstream_ray.stages.capture import neardup_kernel

T0 = 1_700_000_000_000_000


def _rows(texts, convs=None):
    n = len(texts)
    return pa.table({
        "conv_id": pa.array(convs if convs is not None else [f"d{i}" for i in range(n)]),
        "turn_idx": pa.array(range(n), type=pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(texts),
        "tool": pa.array([""] * n),
        "ts": pa.array([T0 + i * 1_000_000 for i in range(n)],
                       type=pa.int64()).cast(pa.timestamp("us")),
    })


def _corpus(n=120, seed=5):
    """Docs with planted near-dup chains: every 6th doc is a light edit of
    its predecessor (same shingle set but one token), the rest distinct."""
    rng = np.random.default_rng(seed)
    base = ("the quick brown fox jumps over the lazy dog and then runs very "
            "far away into the green hills beyond the river today").split()
    texts = []
    for i in range(n):
        if i % 6 == 1:
            toks = texts[-1].split()
            toks[-1] = f"tail{i}"
            texts.append(" ".join(toks))
        else:
            words = [f"w{rng.integers(0, 5000)}" for _ in range(18)]
            texts.append(" ".join(base[: rng.integers(3, 8)] + words))
    return _rows(texts)


def _run_split(tbl, n_epochs, **params):
    bounds = np.linspace(0, tbl.num_rows, n_epochs + 1).astype(int)
    state: dict = {}
    outs = []
    for i in range(n_epochs):
        out, state = neardup_kernel(
            tbl.slice(bounds[i], bounds[i + 1] - bounds[i]), state,
            flush=(i == n_epochs - 1), **params,
        )
        outs.append(out)
    return pa.concat_tables(outs), state


def test_neardup_suppresses_planted_chains_keeps_first():
    tbl = _corpus()
    out, _ = _run_split(tbl, 1)
    kept = set(out["conv_id"].to_pylist())
    # every chain head survives; every near-dup copy is suppressed
    for i in range(1, tbl.num_rows, 6):
        assert f"d{i-1}" in kept
        assert f"d{i}" not in kept


def test_neardup_exact_duplicate_is_near_duplicate():
    t = "some identical message repeated by a retry storm again and again"
    out, _ = neardup_kernel(_rows([t, t, "a totally different doc with other words"]), {})
    assert out.num_rows == 2


def test_neardup_epoch_split_invariance():
    tbl = _corpus()
    single, state = _run_split(tbl, 1)
    for n_epochs in (3, 7):
        multi, _ = _run_split(tbl, n_epochs)
        assert multi.to_pydict() == single.to_pydict()
    # flush is non-terminal: replaying the head keeps suppressing
    post, _ = neardup_kernel(tbl.slice(0, 10), state)
    assert post.num_rows == 0


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_epochs=st.integers(1, 6),
    rotate=st.sampled_from([None, 13, 37, 61]),
)
def test_neardup_split_invariance_property(seed, n_epochs, rotate):
    """ANY epoch split of the same stream — with or without generation
    rotation — emits exactly the single-pass rows (the engine's multi-epoch
    == one-pass contract)."""
    rng = np.random.default_rng(seed)
    n = 90
    texts = []
    for i in range(n):
        if i and rng.random() < 0.3:
            texts.append(texts[rng.integers(0, i)])  # replay an old doc
        else:
            texts.append(" ".join(f"t{rng.integers(0, 300)}" for _ in range(12)))
    tbl = _rows(texts)
    kw = {} if rotate is None else {"rotate_rows": rotate}
    single, _ = _run_split(tbl, 1, **kw)
    multi, _ = _run_split(tbl, n_epochs, **kw)
    assert multi.to_pydict() == single.to_pydict()


def test_neardup_two_generation_forget_window_and_bounded_state():
    """With rotate_rows the state holds at most two generations of band
    sets; a doc older than two rotations is forgotten (re-emitted)."""
    texts = [" ".join(f"u{i}w{j}" for j in range(10)) for i in range(150)]
    out, state = neardup_kernel(_rows(texts), {}, rotate_rows=50)
    assert out.num_rows == 150  # all distinct
    # bounded: cur+prev hold hashes for at most 2*rotate_rows rows
    n_cur = sum(len(v) for v in state["cur"].values())
    n_prev = sum(len(v) for v in state.get("prev", {}).values())
    assert n_cur <= 16 * 50 and n_prev <= 16 * 50
    probe, _ = neardup_kernel(
        _rows([texts[0], texts[120]], convs=["p0", "p1"]), state, rotate_rows=50)
    kept = probe["conv_id"].to_pylist()
    assert "p0" in kept       # >2 rotations old: forgotten
    assert "p1" not in kept   # live generation: suppressed


def test_neardup_rejects_bad_rotate():
    with pytest.raises(ValueError, match="positive"):
        neardup_kernel(_rows(["x"]), {}, rotate_rows=0)


def test_neardup_rescale_rejected(tmp_path):
    from dstream_ray.state.rescale import UNRESCALABLE

    assert "neardup" in UNRESCALABLE


def test_neardup_in_engine_matches_band_collision_oracle(ray_session, tmp_path):
    """'neardup' through the full engine (raw-input routing, 2 partitions,
    2 epochs): emitted rows equal the SQL exists-earlier-band-collision
    oracle computed per partition."""
    import pyarrow.parquet as pq_mod

    from dstream_ray.common import partition_ids
    from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob
    from dstream_ray.stages.dedup import MinHasher

    tbl = _corpus(n=80, seed=11)
    feed = tmp_path / "feed"
    feed.mkdir()
    n = tbl.num_rows
    for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        pq_mod.write_table(tbl.slice(lo, hi - lo), str(feed / f"f-{i}.parquet"))
    job = StreamingJob(StreamingConfig(
        feed_dir=str(feed), out_dir=str(tmp_path / "out"), num_partitions=2,
        files_per_epoch=1, operators={"neardup": {}},
    ))
    job.run()
    got = sorted(job.sink.read_op("neardup")["conv_id"].to_pylist())

    # reference: per-partition exists-earlier band collision in numpy
    mh = MinHasher()
    sigs = mh.signatures_batch(tbl["text"])
    bh = sigs.reshape(n, 16, 4)
    with np.errstate(over="ignore"):
        bandh = bh[:, :, 0].copy()
        for j in range(1, 4):
            bandh = bandh * np.uint64(1099511628211) + bh[:, :, j]
    pids = partition_ids(tbl["conv_id"], 2)
    exp = []
    seen: dict = {}
    for i in range(n):
        keys = {(int(pids[i]), b, int(bandh[i, b])) for b in range(16)}
        if not (keys & seen.keys()):
            exp.append(tbl["conv_id"][i].as_py())
        seen.update(dict.fromkeys(keys, True))
    assert got == sorted(exp)
