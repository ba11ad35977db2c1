"""GLOBAL windowed HLL distinct sketch ('tumbling_hll' operator): exact
register parity vs the HUGEINT SQL oracle under any epoch split AND any
partition layout, estimate accuracy, and the engine path end-to-end."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from dstream_ray.stages.sketches import HLL
from dstream_ray.stages.windows import to_residual_rows, tumbling_hll_kernel

T0 = 1_700_000_000_000_000
W_S = 86_400


def _feed(seed=0, n_convs=40, n_turns=30):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_convs):
        ts = T0 + int(rng.integers(0, 3 * W_S)) * 1_000_000
        for t in range(n_turns):
            ts += int(rng.integers(1, W_S // 4)) * 1_000_000
            role = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
            tool = f"tool{rng.integers(0, 5)}" if role == "tool" else ""
            rows.append((f"c{c}", t, role, f"m{c}-{t}", tool, ts))
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "tool": pa.array([r[4] for r in rows]),
        "ts": pa.array([r[5] for r in rows], type=pa.int64()).cast(pa.timestamp("us")),
    })


ORACLE = f"""
    WITH duv AS (
      SELECT DISTINCT
        CAST(epoch_us(ts) // (CAST({W_S} AS BIGINT) * 1000000) AS BIGINT)
          AS window_id,
        conv_id AS uid
      FROM feed
    ), fnv AS (
      SELECT window_id,
        list_reduce(
          list_prepend(14695981039346656037::HUGEINT,
                       list_transform(split(uid, ''), c -> ord(c)::HUGEINT)),
          (h, b) -> (xor(h, b) * 1099511628211) % (1::HUGEINT << 64)
        ) AS h0
      FROM duv
    ), mix1 AS (SELECT window_id, xor(h0, h0 >> 33) AS h1 FROM fnv),
    mul1 AS (
      SELECT window_id,
        ( ((h1 >> 32) * 18397679294719823053::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
          + (h1 % (1::HUGEINT << 32)) * 18397679294719823053::HUGEINT ) % (1::HUGEINT << 64) AS h2
      FROM mix1
    ), mix2 AS (SELECT window_id, xor(h2, h2 >> 33) AS h3 FROM mul1),
    mul2 AS (
      SELECT window_id,
        ( ((h3 >> 32) * 14181476777654086739::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
          + (h3 % (1::HUGEINT << 32)) * 14181476777654086739::HUGEINT ) % (1::HUGEINT << 64) AS h4
      FROM mix2
    ), mixed AS (SELECT window_id, xor(h4, h4 >> 33) AS h FROM mul2),
    br AS (
      SELECT window_id,
        (h >> 52)::BIGINT AS bucket,
        CASE WHEN (h << 12) % (1::HUGEINT << 64) = 0 THEN 53
             ELSE list_filter(generate_series(1, 53),
                    r -> (h << 12) % (1::HUGEINT << 64) >= (1::HUGEINT << (64 - r)))[1]
        END AS rank
      FROM mixed
    )
    SELECT window_id, bucket, CAST(MAX(rank) AS BIGINT) AS rank
    FROM br GROUP BY 1, 2 ORDER BY 1, 2
"""


def _oracle(feed):
    con = duckdb.connect()
    con.register("feed", feed)
    return con.execute(ORACLE).fetch_df()


def _merge(outs):
    df = pa.concat_tables(outs).to_pandas()
    return (df.groupby(["window_id", "bucket"], as_index=False)["rank"].max()
            .sort_values(["window_id", "bucket"]).reset_index(drop=True))


def test_hll_registers_match_sql_any_split_and_any_partitioning():
    feed = _feed()
    rows = to_residual_rows(feed)
    exp = _oracle(feed)
    assert exp["window_id"].nunique() > 1
    # epoch splits on one partition
    for n_epochs in (1, 5):
        bounds = np.linspace(0, rows.num_rows, n_epochs + 1).astype(int)
        state: dict = {}
        outs = []
        for i in range(n_epochs):
            out, state = tumbling_hll_kernel(
                rows.slice(bounds[i], bounds[i + 1] - bounds[i]), state,
                width_s=W_S, flush=(i == n_epochs - 1))
            outs.append(out)
        pd.testing.assert_frame_equal(_merge(outs), exp, check_dtype=False)
        assert state == {}
    # partition layout: split convs across 4 "partitions", merge partials
    codes = np.asarray([hash(c) % 4 for c in rows["conv_id"].to_pylist()])
    outs = []
    for pid in range(4):
        part = rows.filter(pa.array(codes == pid))
        out, _ = tumbling_hll_kernel(part, {}, width_s=W_S, flush=True)
        outs.append(out)
    pd.testing.assert_frame_equal(_merge(outs), exp, check_dtype=False)


def test_hll_estimate_tracks_true_distinct():
    feed = _feed(seed=3, n_convs=300, n_turns=5)
    rows = to_residual_rows(feed)
    out, _ = tumbling_hll_kernel(rows, {}, width_s=10**9, flush=True)
    df = out.to_pandas()
    regs = np.zeros(1 << 12, dtype=np.uint8)
    regs[df["bucket"].to_numpy()] = df["rank"].to_numpy()
    est = HLL(12, regs).estimate()
    assert abs(est - 300) / 300 < 0.05  # p=12 -> ~1.6% typical error


def test_hll_engine_end_to_end(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob

    feed = _feed(seed=7)
    df = feed.to_pandas().sort_values(["conv_id", "turn_idx"])
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    bounds = np.linspace(0, tbl.num_rows, 5).astype(int)
    for i in range(4):
        pq.write_table(tbl.slice(bounds[i], bounds[i + 1] - bounds[i]),
                       str(feed_dir / f"feed-{i:02d}.parquet"))
    job = StreamingJob(StreamingConfig(
        feed_dir=str(feed_dir), out_dir=str(tmp_path / "out"),
        num_partitions=4, files_per_epoch=2,
        operators={"tumbling_hll": {"width_s": W_S}},
    ))
    job.run()
    got = _merge([job.sink.read_op("tumbling_hll")])
    pd.testing.assert_frame_equal(got, _oracle(feed), check_dtype=False)
