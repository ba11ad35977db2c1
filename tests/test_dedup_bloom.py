"""Bounded-memory (generational Bloom) streaming content dedup: exact-kernel
parity at low fill, epoch-split invariance incl. mid-batch rotations, the
documented two-generation forget window, and the full-engine path."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dstream_ray.stages.capture import content_dedup_bloom_kernel

T0 = 1_700_000_000_000_000


def _rows(convs, texts):
    n = len(texts)
    return pa.table({
        "conv_id": pa.array(convs),
        "turn_idx": pa.array(range(n), type=pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(texts),
        "tool": pa.array([""] * n),
        "ts": pa.array([T0 + i * 1_000_000 for i in range(n)],
                       type=pa.int64()).cast(pa.timestamp("us")),
    })


def _dup_heavy_table():
    convs, texts = [], []
    for c in range(6):
        for t in range(30):
            convs.append(f"c{c}")
            texts.append(f"msg-{t % 7}" if t % 3 else "retry retry")
    return _rows(convs, texts)


def _run_split(tbl, n_epochs, **params):
    bounds = np.linspace(0, tbl.num_rows, n_epochs + 1).astype(int)
    state: dict = {}
    outs = []
    for i in range(n_epochs):
        out, state = content_dedup_bloom_kernel(
            tbl.slice(bounds[i], bounds[i + 1] - bounds[i]), state,
            flush=(i == n_epochs - 1), **params,
        )
        outs.append(out)
    return pa.concat_tables(outs), state


def test_bloom_dedup_matches_qualify_oracle_at_low_fill():
    """With the filter far from saturation the Bloom kernel is
    indistinguishable from exact first-occurrence (SQL QUALIFY), under any
    epoch split."""
    tbl = _dup_heavy_table()
    con = duckdb.connect()
    con.register("feed", tbl)
    exp = con.execute("""
        SELECT conv_id, turn_idx FROM feed
        QUALIFY row_number() OVER (PARTITION BY conv_id, text ORDER BY turn_idx) = 1
        ORDER BY conv_id, turn_idx
    """).fetch_df()
    for n_epochs in (1, 4):
        got_tbl, state = _run_split(tbl, n_epochs, bits=1 << 20)
        got = (
            got_tbl.to_pandas()[["conv_id", "turn_idx"]]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # flush is non-terminal: post-flush duplicates stay suppressed
    post, _ = content_dedup_bloom_kernel(tbl.slice(0, 10), state, bits=1 << 20)
    assert post.num_rows == 0


def test_bloom_dedup_epoch_split_invariance_with_rotation():
    """Rotation points are fixed in the row stream (every rotate_rows
    processed rows), so ANY epoch split — including ones that straddle a
    rotation — emits the same rows as a single pass."""
    rng = np.random.default_rng(7)
    n = 400
    convs = [f"c{i % 5}" for i in range(n)]
    texts = [f"t{rng.integers(0, 120)}" for _ in range(n)]
    tbl = _rows(convs, texts)
    single, _ = _run_split(tbl, 1, bits=1 << 14, rotate_rows=97)
    for n_epochs in (3, 8):
        multi, _ = _run_split(tbl, n_epochs, bits=1 << 14, rotate_rows=97)
        assert multi.to_pydict() == single.to_pydict()


def test_bloom_dedup_split_exactly_on_rotation_boundary():
    """An epoch ending exactly at a rotation boundary must rotate at the
    START of the next epoch — rotation belongs to the row stream, not the
    epoch framing (regression: the boundary-at-relative-row-0 case)."""
    rng = np.random.default_rng(3)
    n, rot = 300, 100
    tbl = _rows([f"c{i % 4}" for i in range(n)],
                [f"t{rng.integers(0, 80)}" for _ in range(n)])
    single, _ = _run_split(tbl, 1, bits=1 << 14, rotate_rows=rot)
    state: dict = {}
    outs = []
    for lo, hi in [(0, rot), (rot, 2 * rot), (2 * rot, n)]:  # splits ON boundaries
        out, state = content_dedup_bloom_kernel(
            tbl.slice(lo, hi - lo), state, bits=1 << 14, rotate_rows=rot)
        outs.append(out)
    assert pa.concat_tables(outs).to_pydict() == single.to_pydict()


def test_bloom_dedup_two_generation_forget_window():
    """State never exceeds two generations: a key older than two rotations
    is forgotten (re-emitted — the documented false-negative window), while
    keys in the live generations stay suppressed."""
    uniques = _rows(["c0"] * 150, [f"u{i}" for i in range(150)])
    out, state = content_dedup_bloom_kernel(
        uniques, {}, bits=1 << 16, rotate_rows=50)
    assert out.num_rows == 150  # all unique
    assert state["processed"] == 150
    # fixed footprint: exactly cur + prev bitmaps regardless of stream length
    assert state["cur"].nbytes == (1 << 16) // 8
    assert state["prev"].nbytes == (1 << 16) // 8

    probe, _ = content_dedup_bloom_kernel(
        _rows(["c0"] * 2, ["u0", "u120"]), state, bits=1 << 16, rotate_rows=50)
    texts = probe["text"].to_pylist()
    assert "u0" in texts       # >2 rotations old: forgotten, re-emitted
    assert "u120" not in texts  # in a live generation: still suppressed


def test_bloom_dedup_rejects_bad_params():
    with pytest.raises(ValueError, match="power of two"):
        content_dedup_bloom_kernel(_rows(["c"], ["x"]), {}, bits=1000)
    with pytest.raises(ValueError, match="positive"):
        content_dedup_bloom_kernel(_rows(["c"], ["x"]), {}, rotate_rows=0)


def test_bloom_dedup_in_engine(ray_session, tmp_path):
    """'dedup_bloom' through the full engine (raw-input routing) matches the
    SQL first-occurrence oracle at low fill."""
    import pyarrow.parquet as pq_mod

    from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob

    rows = []
    for c in range(8):
        for t in range(40):
            rows.append((f"c{c}", t, "user", f"m{t % 5}", "", T0 + (c * 40 + t) * 1_000_000))
    tbl = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "tool": pa.array([r[4] for r in rows]),
        "ts": pa.array([r[5] for r in rows], type=pa.int64()).cast(pa.timestamp("us")),
    })
    feed = tmp_path / "feed"
    feed.mkdir()
    n = tbl.num_rows
    for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        pq_mod.write_table(tbl.slice(lo, hi - lo), str(feed / f"f-{i}.parquet"))
    job = StreamingJob(StreamingConfig(
        feed_dir=str(feed), out_dir=str(tmp_path / "out"), num_partitions=2,
        files_per_epoch=1, operators={"dedup_bloom": {"bits": 1 << 20}},
    ))
    job.run()
    got = (
        job.sink.read_op("dedup_bloom").to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("feed", tbl)
    exp = con.execute("""
        SELECT * FROM feed
        QUALIFY row_number() OVER (PARTITION BY conv_id, text ORDER BY turn_idx) = 1
        ORDER BY conv_id, turn_idx
    """).fetch_df()
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False)
