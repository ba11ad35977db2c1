"""End-to-end streaming engine tests: micro-batch epochs, exactly-once
two-phase commit, kill-and-resume equivalence, lifecycle verbs — the engine
analog of the reference's failure-behavior matrix
(/root/reference/pkg/executor/handshake_test.go) and replay-safe checkpoint
semantics (docs/plugins/mssql-ingester.md:75-87)."""

import json
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob
from dstream_ray.sources.transcripts import generate_transcripts

GAP_S = 120
WIDTH_S = 300


def make_cfg(tmp_path, feed_dir, **kw):
    defaults = dict(
        feed_dir=str(feed_dir),
        out_dir=str(tmp_path / "out"),
        num_partitions=4,
        files_per_epoch=2,
        operators={
            "tumbling": {"width_s": WIDTH_S},
            "session": {"gap_s": GAP_S},
            "session_join": {"gap_s": GAP_S},
        },
    )
    defaults.update(kw)
    return StreamingConfig(**defaults)


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feed")
    generate_transcripts(
        n_convs=40, mean_turns=10, seed=11, session_gap_s=GAP_S,
        mega_conv_turns=300, out_path=str(d), n_shards=6,
    )
    return d


def read_sink(job: StreamingJob, op: str) -> pd.DataFrame:
    t = job.sink.read_op(op)
    return t.to_pandas() if t is not None else pd.DataFrame()


def oracle_on_feed(feed_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW transcripts AS SELECT * FROM read_parquet('{feed_dir}/*.parquet')"
    )
    return con.execute(sql).fetch_arrow_table().to_pandas()


def sorted_eq(a: pd.DataFrame, b: pd.DataFrame, keys):
    a = a.sort_values(keys).reset_index(drop=True)
    b = b.sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False)


def test_streaming_end_to_end(ray_session, tmp_path, feed_dir):
    job = StreamingJob(make_cfg(tmp_path, feed_dir))
    status = job.run()
    assert status["flushed"]
    assert status["committed_epochs"] >= 3  # 6 shards / 2 per epoch

    # relay contract: sink events == feed rows exactly, text byte-equal
    events = read_sink(job, "events")
    feed = oracle_on_feed(feed_dir, "SELECT * FROM transcripts")
    sorted_eq(events, feed, ["conv_id", "turn_idx"])

    # tumbling matches GROUP BY oracle over the whole feed
    tq = f"""
    SELECT conv_id, CAST(floor(epoch(ts)/{WIDTH_S}) AS BIGINT) AS window_id,
           count(*) AS n_turns,
           count(*) FILTER (WHERE role='user') AS n_user_turns,
           count(*) FILTER (WHERE role='tool') AS n_tool_turns,
           sum(length(text)) AS n_chars
    FROM transcripts GROUP BY 1,2"""
    sorted_eq(read_sink(job, "tumbling"), oracle_on_feed(feed_dir, tq),
              ["conv_id", "window_id"])

    # session join emitted some pairs and they are unique per tool turn
    pairs = read_sink(job, "session_join")
    assert len(pairs) > 0
    assert not pairs.duplicated(["conv_id", "tool_turn_idx"]).any()

    # lineage/metrics: totals add up across manifests
    last = job.store.last_committed()[1]
    tot_in = sum(p["rows_in_total"] for p in last["partitions"].values())
    assert tot_in == len(feed)


def test_kill_and_resume_matches_uninterrupted(ray_session, tmp_path, feed_dir):
    cfg_a = make_cfg(tmp_path / "a", feed_dir)
    job_a = StreamingJob(cfg_a)
    job_a.run()

    # interrupted run: one epoch, then a brand-new driver resumes
    cfg_b = make_cfg(tmp_path / "b", feed_dir)
    StreamingJob(cfg_b).run(max_epochs=1, flush_at_end=False)
    job_b2 = StreamingJob(cfg_b)  # fresh driver (≙ process restart)
    job_b2.run()

    for op in ["events", "tumbling", "session", "session_join"]:
        keys = {
            "events": ["conv_id", "turn_idx"],
            "tumbling": ["conv_id", "window_id"],
            "session": ["conv_id", "session_id"],
            "session_join": ["conv_id", "session_id", "tool_turn_idx"],
        }[op]
        sorted_eq(read_sink(job_b2, op), read_sink(StreamingJob(cfg_a), op), keys)


def test_crash_before_commit_replays_idempotently(ray_session, tmp_path, feed_dir):
    cfg = make_cfg(tmp_path, feed_dir)
    job = StreamingJob(cfg)
    job.run(max_epochs=2, flush_at_end=False)

    # simulate a crash AFTER sink promote but BEFORE manifest commit of epoch 1:
    # delete the commit record; sink files from epoch 1 remain on disk
    os.remove(job.store._commit_path(1))
    assert job.store.last_committed()[0] == 0

    # resume replays epoch 1 (same input files, same prior state) and continues
    job2 = StreamingJob(cfg)
    job2.run()
    events = read_sink(job2, "events")
    feed = oracle_on_feed(feed_dir, "SELECT * FROM transcripts")
    sorted_eq(events, feed, ["conv_id", "turn_idx"])  # no dup, no loss


def test_lifecycle_verbs(ray_session, tmp_path, feed_dir):
    cfg = make_cfg(tmp_path, feed_dir)
    job = StreamingJob(cfg)
    assert job.init()["status"] == "ready"
    plan = job.plan()
    assert len(plan["pending_files"]) == 6 and plan["file_cursor"] == 0
    assert job.status() == {"committed_epochs": 0}
    job.run(max_epochs=1, flush_at_end=False)
    st = job.status()
    assert st["committed_epochs"] == 1 and st["file_cursor"] == 2
    assert job.plan()["file_cursor"] == 2
    assert job.destroy()["status"] == "destroyed"
    assert not os.path.exists(cfg.out_dir)


def test_late_data_routing(ray_session, tmp_path):
    # two shards: second contains a brand-new conv whose ts is far behind the
    # partition watermark -> routed to the 'late' sink, excluded from windows
    feed = tmp_path / "feed"
    os.makedirs(feed)
    t0 = 1_700_000_000_000_000
    import pyarrow.parquet as pq

    def mk(conv, turns, base_us):
        return pa.table({
            "conv_id": pa.array([conv] * turns),
            "turn_idx": pa.array(range(turns), type=pa.int32()),
            "role": pa.array(["user", "assistant", "tool"] * 10)[:turns],
            "text": pa.array([f"{conv}-{i}" for i in range(turns)]),
            "tool": pa.array([""] * turns),
            "ts": pa.array([base_us + i * 1_000_000 for i in range(turns)],
                           type=pa.int64()).cast(pa.timestamp("us")),
        })

    pq.write_table(mk("fresh", 6, t0 + 10_000_000_000), str(feed / "f0.parquet"))
    pq.write_table(mk("stale", 6, t0), str(feed / "f1.parquet"))
    cfg = StreamingConfig(
        feed_dir=str(feed), out_dir=str(tmp_path / "out"), num_partitions=1,
        files_per_epoch=1, operators={"tumbling": {"width_s": 300}},
        allowed_lateness_s=60,
    )
    job = StreamingJob(cfg)
    job.run()
    late = read_sink(job, "late")
    events = read_sink(job, "events")
    assert set(late["conv_id"]) == {"stale"} and len(late) == 6
    assert set(events["conv_id"]) == {"fresh"}


def test_actor_state_store_equivalent(ray_session, tmp_path, feed_dir):
    """Actor-mode keyed state store (partition-owner actors holding state in
    memory between epochs) must produce identical sink output to task mode,
    including after a mid-stream stop + resume with a fresh actor pool."""
    cfg_t = make_cfg(tmp_path / "tasks", feed_dir)
    StreamingJob(cfg_t).run()

    cfg_a = make_cfg(tmp_path / "actors", feed_dir, use_state_actors=True)
    StreamingJob(cfg_a).run(max_epochs=1, flush_at_end=False)  # stop early
    job_a = StreamingJob(cfg_a)  # fresh driver -> fresh actors -> disk resume
    job_a.run()

    for op, keys in [
        ("events", ["conv_id", "turn_idx"]),
        ("tumbling", ["conv_id", "window_id"]),
        ("session", ["conv_id", "session_id"]),
        ("session_join", ["conv_id", "session_id", "tool_turn_idx"]),
    ]:
        sorted_eq(read_sink(job_a, op), read_sink(StreamingJob(cfg_t), op), keys)


@pytest.mark.parametrize("phase", ["before", "after"])
def test_state_actor_crash_recovers_mid_job(ray_session, tmp_path, feed_dir, phase):
    """The `ready_then_crash` analog for the keyed-state store
    (/root/reference/pkg/executor/handshake_test.go behavior matrix): a
    PartitionStateActor hard-exits mid-job — "before" = mid-epoch before
    any kernel runs, "after" = between the state snapshot and the result
    return — and the SAME driver run must recover (respawn the pool,
    rebuild from the last committed snapshot, replay uncommitted epochs)
    and finish with sinks identical to an uninterrupted task-mode run."""
    cfg_t = make_cfg(tmp_path / "tasks", feed_dir)
    StreamingJob(cfg_t).run()

    cfg_c = make_cfg(
        tmp_path / f"crash_{phase}", feed_dir,
        use_state_actors=True, crash_actor_at=(2, 1, phase),
    )
    job_c = StreamingJob(cfg_c)
    st = job_c.run()  # single run() call: recovery happens IN-RUN
    assert st["flushed"]
    assert os.path.exists(os.path.join(cfg_c.out_dir, "_crash_fired"))

    for op, keys in [
        ("events", ["conv_id", "turn_idx"]),
        ("tumbling", ["conv_id", "window_id"]),
        ("session", ["conv_id", "session_id"]),
        ("session_join", ["conv_id", "session_id", "tool_turn_idx"]),
    ]:
        sorted_eq(read_sink(job_c, op), read_sink(StreamingJob(cfg_t), op), keys)


def test_two_level_combiner_equivalent(ray_session, tmp_path, feed_dir):
    """The two-level exchange (pre-merge slices per partition before the
    reduce) must produce identical output to the direct exchange."""
    cfg_direct = make_cfg(tmp_path / "direct", feed_dir, files_per_epoch=6)
    StreamingJob(cfg_direct).run()
    cfg_comb = make_cfg(tmp_path / "comb", feed_dir, files_per_epoch=6, combine_every=2)
    job_c = StreamingJob(cfg_comb)
    job_c.run()
    for op, keys in [
        ("events", ["conv_id", "turn_idx"]),
        ("session_join", ["conv_id", "session_id", "tool_turn_idx"]),
    ]:
        sorted_eq(read_sink(job_c, op), read_sink(StreamingJob(cfg_direct), op), keys)


def test_multiple_instances_of_one_kernel(ray_session, tmp_path, feed_dir):
    """'kernel@variant' keys run several instances of the same kernel with
    different params, each with its own sink output and state slot."""
    cfg = make_cfg(
        tmp_path, feed_dir,
        operators={
            "tumbling@5m": {"width_s": 300},
            "tumbling@1h": {"width_s": 3600},
        },
    )
    job = StreamingJob(cfg)
    job.run()
    w5 = read_sink(job, "tumbling@5m")
    w1h = read_sink(job, "tumbling@1h")
    assert len(w5) > len(w1h) > 0  # finer windows -> more rows
    exp5 = oracle_on_feed(feed_dir, """
      SELECT conv_id, CAST(floor(epoch(ts)/300) AS BIGINT) AS window_id,
             count(*) AS n_turns, count(*) FILTER (WHERE role='user') AS n_user_turns,
             count(*) FILTER (WHERE role='tool') AS n_tool_turns,
             CAST(sum(length(text)) AS BIGINT) AS n_chars
      FROM transcripts GROUP BY 1,2""")
    sorted_eq(w5, exp5, ["conv_id", "window_id"])


def test_engine_sliding_watermark_closure(ray_session, tmp_path):
    """sliding@wm through the full engine (multi-epoch, exactly-once sink)
    over a globally ts-ordered feed == the batch sliding oracle, with early
    (pre-flush) emission."""
    import duckdb

    from dstream_ray.sources.transcripts import generate_transcripts

    feed_tbl = generate_transcripts(n_convs=40, mean_turns=10, seed=33)
    order = pa.compute.sort_indices(feed_tbl, sort_keys=[("ts", "ascending"), ("conv_id", "ascending"), ("turn_idx", "ascending")])
    feed_tbl = feed_tbl.take(order)
    feed = tmp_path / "feed"
    feed.mkdir()
    n = feed_tbl.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        import pyarrow.parquet as pq
        pq.write_table(feed_tbl.slice(lo, hi - lo), str(feed / f"f-{i:02d}.parquet"))
    W, S = 300, 150
    job = StreamingJob(StreamingConfig(
        feed_dir=str(feed), out_dir=str(tmp_path / "out"), num_partitions=4,
        files_per_epoch=1,
        operators={"sliding@wm": {"width_s": W, "slide_s": S, "closure": "watermark"}},
    ))
    job.run(flush_at_end=False, pipeline_depth=1)
    early = job.sink.read_op("sliding@wm")
    assert early is not None and early.num_rows > 0  # emitted before flush
    job2 = StreamingJob(job.cfg)
    job2.run()
    got = job2.sink.read_op("sliding@wm").to_pandas()
    con = duckdb.connect()
    con.register("transcripts", feed_tbl)
    exp = con.execute(f"""
        WITH fan AS (
          SELECT conv_id, CAST(floor(epoch(ts)/{S}) AS BIGINT) AS window_id, length(text) AS lc FROM transcripts
          UNION ALL
          SELECT conv_id, CAST(floor(epoch(ts)/{S}) AS BIGINT) - 1 AS window_id, length(text) AS lc FROM transcripts
        )
        SELECT conv_id, window_id, count(*) AS n_turns, CAST(sum(lc) AS BIGINT) AS n_chars
        FROM fan GROUP BY 1, 2
    """).fetch_df()
    keys = ["conv_id", "window_id"]
    got = got.sort_values(keys).reset_index(drop=True)[sorted(got.columns)]
    exp = exp.sort_values(keys).reset_index(drop=True)[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_cross_mode_resume_actor_to_task_and_back(ray_session, tmp_path, feed_dir):
    """Execution mode is not part of the state contract: epochs run by the
    actor-mode keyed state store resume correctly under task-mode reduces
    (and vice versa), because both snapshot identical per-partition state
    every epoch."""
    ref = StreamingJob(make_cfg(tmp_path / "ref", feed_dir))
    ref.run()

    # actor epochs -> task resume
    cfg_at = make_cfg(tmp_path / "at", feed_dir)
    StreamingJob(
        make_cfg(tmp_path / "at", feed_dir, use_state_actors=True)
    ).run(max_epochs=1, flush_at_end=False)
    job_at = StreamingJob(cfg_at)  # task mode finishes the stream
    job_at.run()

    # task epochs -> actor resume
    cfg_ta = make_cfg(tmp_path / "ta", feed_dir, use_state_actors=True)
    StreamingJob(make_cfg(tmp_path / "ta", feed_dir)).run(
        max_epochs=1, flush_at_end=False
    )
    job_ta = StreamingJob(cfg_ta)
    job_ta.run()

    for op, keys in [
        ("events", ["conv_id", "turn_idx"]),
        ("tumbling", ["conv_id", "window_id"]),
        ("session", ["conv_id", "session_id"]),
        ("session_join", ["conv_id", "session_id", "tool_turn_idx"]),
    ]:
        sorted_eq(read_sink(job_at, op), read_sink(ref, op), keys)
        sorted_eq(read_sink(job_ta, op), read_sink(ref, op), keys)


def test_enrich_operator_matches_left_join(ray_session, tmp_path, feed_dir):
    """'enrich' engine operator == DuckDB LEFT JOIN of the feed against the
    dimension parquet; unmatched keys keep nulls; broadcast side loaded
    once per worker."""
    import pyarrow.parquet as pq_mod

    dim = pa.table({
        "tool": pa.array(["tool_0", "tool_1", "tool_2"]),
        "category": pa.array(["search", "code", "math"]),
        "cost_ms": pa.array([10, 20, 30], type=pa.int64()),
    })
    dim_path = str(tmp_path / "tools_dim.parquet")
    pq_mod.write_table(dim, dim_path)
    job = StreamingJob(make_cfg(
        tmp_path, feed_dir,
        operators={"enrich": {
            "dim_path": dim_path, "dim_key": "tool", "key_col": "tool",
        }},
    ))
    job.run()
    got = read_sink(job, "enrich")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW transcripts AS SELECT * FROM read_parquet('{feed_dir}/*.parquet')"
    )
    con.execute(f"CREATE VIEW dim AS SELECT * FROM read_parquet('{dim_path}')")
    exp = con.execute("""
        SELECT t.*, d.category AS dim_category, d.cost_ms AS dim_cost_ms
        FROM transcripts t LEFT JOIN dim d ON t.tool = d.tool
    """).fetch_df()
    sorted_eq(got, exp, ["conv_id", "turn_idx"])
    # non-tool rows (tool='') are unmatched -> nulls
    assert got.loc[got["tool"] == "", "dim_category"].isna().all()


def test_enrich_rejects_duplicate_dim_keys(tmp_path):
    import pyarrow.parquet as pq_mod

    from dstream_ray.stages.enrich import enrich_kernel

    dim = pa.table({"tool": pa.array(["a", "a"]), "v": pa.array([1, 2])})
    p = str(tmp_path / "dup.parquet")
    pq_mod.write_table(dim, p)
    rows = pa.table({
        "conv_id": pa.array(["c"]), "turn_idx": pa.array([0], type=pa.int32()),
        "role": pa.array(["tool"]), "text": pa.array(["x"]),
        "tool": pa.array(["a"]),
        "ts": pa.array([0], type=pa.int64()).cast(pa.timestamp("us")),
    })
    with pytest.raises(ValueError, match="duplicate keys"):
        enrich_kernel(rows, {}, dim_path=p, dim_key="tool")


def test_many_partitions_epoch_loop(ray_session, tmp_path, feed_dir):
    """The epoch exchange at a cluster-scale partition count (128, vs the
    4-8 the other tests use): split fan-out (num_returns=P), per-partition
    reduce tasks, manifest bookkeeping, state snapshots and the
    partition-directory sink layout all hold, and the committed sinks are
    IDENTICAL to a narrow run — partition count is an execution knob, not
    part of the semantics (SCALE.md sizes P~thousands on a real cluster)."""
    ref = StreamingJob(make_cfg(tmp_path / "ref", feed_dir))
    ref.run()
    job = StreamingJob(
        make_cfg(tmp_path / "many", feed_dir, num_partitions=128, files_per_epoch=3)
    )
    job.run()
    for op, keys in [
        ("events", ["conv_id", "turn_idx"]),
        ("tumbling", ["conv_id", "window_id"]),
        ("session", ["conv_id", "session_id"]),
        ("session_join", ["conv_id", "session_id", "tool_turn_idx"]),
    ]:
        sorted_eq(read_sink(job, op), read_sink(ref, op), keys)
    st = job.status()
    assert st["flushed"] and st["committed_epochs"] == 2  # 6 files / 3 per epoch


def test_enrich_all_miss_batch_keeps_dim_types(tmp_path):
    """A batch where NO key matches must still emit dim columns with the
    dim table's types (an unmasked all-null build would infer `null` and
    break the sink's cross-partition concat)."""
    import pyarrow.parquet as pq_mod

    from dstream_ray.stages.enrich import enrich_kernel

    dim = pa.table({
        "tool": pa.array(["a"]),
        "name": pa.array(["x"]),
        "cost": pa.array([7], type=pa.int64()),
    })
    p = str(tmp_path / "dim.parquet")
    pq_mod.write_table(dim, p)
    rows = pa.table({
        "conv_id": pa.array(["c", "c"]),
        "turn_idx": pa.array([0, 1], type=pa.int32()),
        "role": pa.array(["user", "user"]),
        "text": pa.array(["t0", "t1"]),
        "tool": pa.array(["", "zz"]),  # nothing matches
        "ts": pa.array([0, 1], type=pa.int64()).cast(pa.timestamp("us")),
    })
    out, _ = enrich_kernel(rows, {}, dim_path=p, dim_key="tool")
    assert out.schema.field("dim_name").type == pa.string()
    assert out.schema.field("dim_cost").type == pa.int64()
    assert out["dim_name"].null_count == 2 and out["dim_cost"].null_count == 2


def test_enrich_asof_matches_duckdb_asof_join(ray_session, tmp_path, feed_dir):
    """Temporal (SCD-2 / as-of) enrichment: each stream row joins the
    LATEST dim version with effective ts <= the row's event time — equal
    to DuckDB's ASOF LEFT JOIN over the same feed + versioned dim,
    through the full multi-epoch engine."""
    import pyarrow.parquet as pq_mod

    feed = oracle_on_feed(feed_dir, "SELECT min(ts) AS lo, max(ts) AS hi FROM transcripts")
    lo = feed["lo"].iloc[0].value // 1000  # ns -> us
    hi = feed["hi"].iloc[0].value // 1000
    mid = (lo + hi) // 2
    tools, effs, rates = [], [], []
    for i, t in enumerate(["tool_0", "tool_1", "tool_2"]):
        tools += [t, t]            # two versions per key
        effs += [lo - 1_000_000, mid]
        rates += [10 * (i + 1), 10 * (i + 1) + 1]
    tools.append("tool_3")         # version that only starts mid-stream
    effs.append(mid)
    rates.append(99)
    dim = pa.table({
        "tool": pa.array(tools),
        "eff_ts": pa.array(effs, type=pa.int64()).cast(pa.timestamp("us")),
        "rate": pa.array(rates, type=pa.int64()),
    })
    dim_path = str(tmp_path / "rates_dim.parquet")
    pq_mod.write_table(dim, dim_path)

    job = StreamingJob(make_cfg(
        tmp_path, feed_dir,
        operators={"enrich": {
            "dim_path": dim_path, "dim_key": "tool", "key_col": "tool",
            "dim_effective_col": "eff_ts",
        }},
    ))
    job.run()
    got = read_sink(job, "enrich")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW transcripts AS SELECT * FROM read_parquet('{feed_dir}/*.parquet')"
    )
    con.execute(f"CREATE VIEW dim AS SELECT * FROM read_parquet('{dim_path}')")
    exp = con.execute("""
        SELECT t.*, d.rate AS dim_rate
        FROM transcripts t ASOF LEFT JOIN dim d
          ON t.tool = d.tool AND t.ts >= d.eff_ts
    """).fetch_df()
    sorted_eq(got, exp, ["conv_id", "turn_idx"])
    # the mid-stream version actually flips: both rates of tool_0 appear
    assert set(got.loc[got["tool"] == "tool_0", "dim_rate"].dropna()) == {10, 11}
    # tool_3 rows before mid are unmatched
    t3 = got[got["tool"] == "tool_3"]
    if len(t3):
        assert t3["dim_rate"].isna().eq(
            t3["ts"].astype("datetime64[us]").astype("int64") < mid
        ).all()


def test_kill_and_resume_new_stateful_operators(ray_session, tmp_path, feed_dir):
    """The round-3 stateful operators (outer join pending/matched flags,
    per-row running/sessionize carries, HLL registers, qsketch histograms)
    snapshot and replay exactly: a run interrupted after one epoch and
    resumed by a fresh driver emits byte-identical committed sinks to an
    uninterrupted run."""
    ops = {
        "outer_join": {"within_s": WIDTH_S},
        "running": {},
        "sessionize": {"gap_s": GAP_S},
        "tumbling_hll": {"width_s": WIDTH_S},
        "tumbling_qsketch": {"width_s": WIDTH_S},
    }
    cfg_a = make_cfg(tmp_path / "a", feed_dir, operators=dict(ops))
    StreamingJob(cfg_a).run()

    cfg_b = make_cfg(tmp_path / "b", feed_dir, operators=dict(ops))
    StreamingJob(cfg_b).run(max_epochs=1, flush_at_end=False)
    job_b2 = StreamingJob(cfg_b)  # fresh driver (≙ process restart)
    job_b2.run()

    keys = {
        "outer_join": ["conv_id", "user_turn_idx", "tool_turn_idx"],
        "running": ["conv_id", "turn_idx"],
        "sessionize": ["conv_id", "turn_idx"],
        "tumbling_hll": ["window_id", "bucket"],
        "tumbling_qsketch": ["window_id", "bucket"],
    }
    for op, k in keys.items():
        a = read_sink(StreamingJob(cfg_a), op)
        b = read_sink(job_b2, op)
        if op in ("tumbling_hll", "tumbling_qsketch"):
            # partial layouts may differ by epoch framing; the MERGED
            # sketch must be identical
            col, how = ("rank", "max") if op == "tumbling_hll" else ("n", "sum")
            a = a.groupby(["window_id", "bucket"], as_index=False)[col].agg(how)
            b = b.groupby(["window_id", "bucket"], as_index=False)[col].agg(how)
        sorted_eq(a, b, k)


def test_scrub_operator_masks_in_engine(ray_session, tmp_path, feed_dir):
    """The stateless 'scrub' operator through a real multi-epoch run: the
    committed sink is row-for-row the batch RE2 scrub of the relay output
    (1:1 rows, masked text, counts riding along), for any epoch split."""
    import glob

    import pyarrow.parquet as pq

    from dstream_ray.stages.text import pii_scrub_batch

    # decorate a copy of the module feed with one email per row so the
    # scrub has material (the generated transcripts are clean)
    deco_dir = tmp_path / "feed_deco"
    deco_dir.mkdir()
    for i, f in enumerate(sorted(glob.glob(f"{feed_dir}/*.parquet"))):
        t = pq.read_table(f)
        import pyarrow.compute as pc_

        txt = pc_.binary_join_element_wise(
            t["text"], pa.scalar(" ping bot@x.io ok"), ""
        )
        pq.write_table(
            t.set_column(t.schema.get_field_index("text"), "text", txt),
            str(deco_dir / f"feed-{i:02d}.parquet"),
        )
    cfg = make_cfg(tmp_path, deco_dir, operators={"scrub": {}}, files_per_epoch=1)
    job = StreamingJob(cfg)
    job.run()
    got = job.sink.read_op("scrub").to_pandas()
    feed = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(str(deco_dir / "*.parquet")))]
    )
    exp = pii_scrub_batch(
        pa.table({"doc_id": pa.array(range(feed.num_rows), type=pa.int64()),
                  "text": feed["text"]})
    ).to_pandas()
    assert len(got) == feed.num_rows
    assert (got["n_email"] >= 1).all()  # every row got a decoration
    assert sorted(got["text"]) == sorted(exp["scrubbed"])
    assert not got["text"].str.contains("@").any()


def test_kill_and_resume_sample_topk(ray_session, tmp_path, feed_dir):
    """The bounded-state sampling/heavy-hitter operators snapshot and
    replay exactly: interrupted-then-resumed committed sinks MERGE to the
    same result as an uninterrupted run (partial layouts may differ by
    epoch framing; the consumer merge is the invariant)."""
    ops = {
        "tumbling_sample": {"width_s": WIDTH_S, "k": 4},
        "tumbling_sample@role": {"width_s": WIDTH_S, "k": 2, "by": "role"},
        "tumbling_topk": {"width_s": WIDTH_S, "capacity": 64,
                          "value_col": "role", "skip_empty": False},
    }
    cfg_a = make_cfg(tmp_path / "a", feed_dir, operators=dict(ops))
    StreamingJob(cfg_a).run()

    cfg_b = make_cfg(tmp_path / "b", feed_dir, operators=dict(ops))
    StreamingJob(cfg_b).run(max_epochs=1, flush_at_end=False)
    job_b2 = StreamingJob(cfg_b)  # fresh driver (≙ process restart)
    job_b2.run()

    def merge_sample(df, keys, k):
        return (df.sort_values([*keys, "priority", "conv_id", "turn_idx"])
                .groupby(keys).head(k)
                [[*keys, "conv_id", "turn_idx"]])

    for op in ops:
        a = read_sink(StreamingJob(cfg_a), op)
        b = read_sink(job_b2, op)
        if op == "tumbling_sample":
            a, b = (merge_sample(x, ["window_id"], 4) for x in (a, b))
            sorted_eq(a, b, ["window_id", "conv_id", "turn_idx"])
        elif op == "tumbling_sample@role":
            a, b = (merge_sample(x, ["window_id", "stratum"], 2) for x in (a, b))
            sorted_eq(a, b, ["window_id", "stratum", "conv_id", "turn_idx"])
        else:
            assert int(a["err"].max()) == 0 and int(b["err"].max()) == 0
            a = a.groupby(["window_id", "value"], as_index=False)["n"].sum()
            b = b.groupby(["window_id", "value"], as_index=False)["n"].sum()
            sorted_eq(a, b, ["window_id", "value"])


def test_state_actor_crash_recovers_global_ops(ray_session, tmp_path, feed_dir):
    """Actor-held GLOBAL state (bottom-k sample buffers, Misra-Gries
    summaries, global window partials) recovers from a mid-job actor
    hard-exit just like conv-keyed state: the respawned owner rebuilds
    from the last committed snapshot and the merged sinks equal a
    task-mode run."""
    ops = {
        "tumbling_sample": {"width_s": WIDTH_S, "k": 4},
        "tumbling_topk": {"width_s": WIDTH_S, "capacity": 64,
                          "value_col": "role", "skip_empty": False},
        "tumbling_global": {"width_s": WIDTH_S},
    }
    cfg_t = make_cfg(tmp_path / "tasks", feed_dir, operators=dict(ops))
    StreamingJob(cfg_t).run()

    cfg_c = make_cfg(
        tmp_path / "crash", feed_dir, operators=dict(ops),
        use_state_actors=True, crash_actor_at=(2, 1, "after"),
    )
    job_c = StreamingJob(cfg_c)
    st = job_c.run()
    assert st["flushed"]
    assert os.path.exists(os.path.join(cfg_c.out_dir, "_crash_fired"))

    for a, b in [(read_sink(job_c, "tumbling_sample"),
                  read_sink(StreamingJob(cfg_t), "tumbling_sample"))]:
        a, b = ((x.sort_values(["window_id", "priority", "conv_id", "turn_idx"])
                 .groupby("window_id").head(4)[["window_id", "conv_id", "turn_idx"]])
                for x in (a, b))
        sorted_eq(a, b, ["window_id", "conv_id", "turn_idx"])
    a = read_sink(job_c, "tumbling_topk")
    b = read_sink(StreamingJob(cfg_t), "tumbling_topk")
    assert int(a["err"].max()) == 0 and int(b["err"].max()) == 0
    sorted_eq(a.groupby(["window_id", "value"], as_index=False)["n"].sum(),
              b.groupby(["window_id", "value"], as_index=False)["n"].sum(),
              ["window_id", "value"])
    a = read_sink(job_c, "tumbling_global").groupby("window_id", as_index=False).sum()
    b = read_sink(StreamingJob(cfg_t), "tumbling_global").groupby("window_id", as_index=False).sum()
    sorted_eq(a, b, ["window_id"])
