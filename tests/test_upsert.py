"""Latest-per-key compaction ('upsert' operator): SQL keep-last oracle
parity under any epoch split, changelog-delta semantics across periodic
flushes, CDC edit-override behavior, and the engine path end-to-end."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from dstream_ray.stages.capture import upsert_kernel

T0 = 1_700_000_000_000_000


def _feed(seed=0, n_convs=6, n_turns=40):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_convs):
        ts = T0 + int(rng.integers(0, 10**9))
        for t in range(n_turns):
            ts += int(rng.integers(1, 120)) * 1_000_000
            role = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
            tool = f"tool{rng.integers(0, 5)}" if role == "tool" else ""
            rows.append((f"c{c}", t, role, f"msg-{c}-{t}", tool, ts))
    rng.shuffle(rows)  # arrival interleaves convs; seq decides the winner
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "tool": pa.array([r[4] for r in rows]),
        "ts": pa.array([r[5] for r in rows], type=pa.int64()).cast(pa.timestamp("us")),
    })


def _oracle_keep_last(feed: pa.Table, key_cols) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("feed_raw", feed)
    keys = ", ".join(key_cols)
    return con.execute(f"""
        WITH seq AS (SELECT *, row_number() OVER () AS _arr FROM feed_raw)
        SELECT conv_id, turn_idx, role, text, tool, ts FROM seq
        QUALIFY row_number() OVER (PARTITION BY {keys} ORDER BY _arr DESC) = 1
    """).fetch_df()


def _run_split(rows: pa.Table, n_epochs: int, flush_every=False, **kw):
    bounds = np.linspace(0, rows.num_rows, n_epochs + 1).astype(int)
    state: dict = {}
    outs = []
    for i in range(n_epochs):
        out, state = upsert_kernel(
            rows.slice(bounds[i], bounds[i + 1] - bounds[i]), state,
            flush=flush_every or (i == n_epochs - 1), **kw)
        outs.append(out)
    return outs, state


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_upsert_matches_keep_last_oracle_any_split():
    feed = _feed()
    exp = _canon(_oracle_keep_last(feed, ("conv_id", "role")))
    assert len(exp) < feed.num_rows  # fixture genuinely compacts
    for n_epochs in (1, 3, 7):
        outs, _ = _run_split(feed, n_epochs)
        got = _canon(pa.concat_tables(outs).to_pandas())
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_upsert_cdc_edit_override():
    """A re-sent (conv_id, turn_idx) replaces the earlier version — the CDC
    update path (reference e2e drives insert→update rounds over one PK)."""
    base = _feed(seed=3, n_convs=2, n_turns=10)
    edits = base.slice(0, 5).set_column(
        base.schema.get_field_index("text"),
        "text", pa.array([f"edited-{i}" for i in range(5)]))
    stream = pa.concat_tables([base, edits])
    outs, _ = _run_split(stream, 4, key_cols=("conv_id", "turn_idx"))
    got = pa.concat_tables(outs).to_pandas()
    assert len(got) == base.num_rows  # one row per key
    exp = _canon(_oracle_keep_last(stream, ("conv_id", "turn_idx")))
    pd.testing.assert_frame_equal(_canon(got), exp, check_dtype=False)


def test_upsert_periodic_flush_changelog():
    """Flushing every epoch yields a changelog of deltas: each flush emits
    exactly the keys whose winner arrived since the previous flush, and the
    keep-last union of all deltas equals the single-pass snapshot."""
    feed = _feed(seed=7)
    single, _ = _run_split(feed, 1)
    snapshot = _canon(pa.concat_tables(single).to_pandas())

    deltas, _ = _run_split(feed, 5, flush_every=True)
    n = feed.num_rows
    bounds = np.linspace(0, n, 6).astype(int)
    feed_df = feed.to_pandas()
    for i, d in enumerate(deltas):
        df = d.to_pandas()
        # no key repeats within one delta
        assert not df.duplicated(["conv_id", "role"]).any()
        # every emitted key saw an arrival inside this epoch
        epoch_keys = set(map(tuple, feed_df.iloc[bounds[i]:bounds[i + 1]][
            ["conv_id", "role"]].to_numpy()))
        emitted = set(map(tuple, df[["conv_id", "role"]].to_numpy()))
        assert emitted <= epoch_keys
    union = pd.concat([d.to_pandas() for d in deltas], ignore_index=True)
    compacted = _canon(union.drop_duplicates(["conv_id", "role"], keep="last"))
    pd.testing.assert_frame_equal(compacted, snapshot, check_dtype=False)


def test_upsert_state_is_the_compacted_view():
    """State holds exactly one row per distinct key — the materialized view,
    bounded by key cardinality, not stream length."""
    feed = _feed(seed=1)
    _, state = _run_split(feed, 3)
    tbl = state["table"]
    df = tbl.to_pandas()
    assert len(df) == df[["conv_id", "role"]].drop_duplicates().shape[0]
    n_keys = feed.to_pandas()[["conv_id", "role"]].drop_duplicates().shape[0]
    assert len(df) == n_keys


def test_upsert_engine_end_to_end(ray_session, tmp_path):
    """The 'upsert' operator through the real multi-epoch engine: committed
    sink == keep-last-per-(conv,role) over the feed (relay delivers each conv
    in turn order, so arrival-latest == max turn_idx)."""
    import pyarrow.parquet as pq

    from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob

    feed = _feed(seed=5)
    # engine feeds are per-conv ordered (relay contract)
    feed = feed.to_pandas().sort_values(["conv_id", "turn_idx"])
    tbl = pa.Table.from_pandas(feed, preserve_index=False)
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    bounds = np.linspace(0, tbl.num_rows, 5).astype(int)
    for i in range(4):
        pq.write_table(tbl.slice(bounds[i], bounds[i + 1] - bounds[i]),
                       str(feed_dir / f"feed-{i:02d}.parquet"))
    job = StreamingJob(StreamingConfig(
        feed_dir=str(feed_dir), out_dir=str(tmp_path / "out"),
        num_partitions=4, files_per_epoch=2,
        operators={"upsert": {}},
    ))
    job.run()
    got = job.sink.read_op("upsert").to_pandas()
    con = duckdb.connect()
    con.register("transcripts", tbl)
    exp = con.execute("""
        SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts
        QUALIFY row_number() OVER (PARTITION BY conv_id, role
                                   ORDER BY turn_idx DESC) = 1
    """).fetch_df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp), check_dtype=False)
