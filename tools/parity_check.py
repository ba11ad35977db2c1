"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side by side on an sf dir, compare row count, column
names, and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified). Usage:

    python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("datetime"):
            df[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype == object:
            df[c] = col.astype(str)
        elif str(col.dtype).startswith("float"):
            df[c] = col.round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    h.update(pd.util.hash_pandas_object(normalize(df), index=False).values.tobytes())
    return h.hexdigest()[:16]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    from dstream_ray.pipelines.oracles import assert_oracle_ascii_contract

    assert_oracle_ascii_contract(sf_dir)  # byte-level oracles are ASCII-only
    qs, sqls = entry.queries(), entry.oracle_sql()
    # library-only oracle-checked queries (ceded their driver grading slots
    # but keep full local parity; see __ray_entry__.queries docstring)
    from dstream_ray.pipelines import dataops as _d
    from dstream_ray.pipelines import queries as _q
    from dstream_ray.pipelines.oracles import ORACLE_SQL as _ALL_SQL

    for _name, _fn in [
        # batch-surface queries that ceded driver slots to their engine twins
        ("transcripts_feed", _q.q_transcripts_feed),
        ("streaming_tumbling", _q.q_streaming_tumbling),
        ("streaming_session", _q.q_streaming_session),
        ("cep_pattern", _q.q_cep_pattern),
        ("tumbling_window", _q.q_tumbling_window),
        ("sliding_window", _q.q_sliding_window),
        ("session_window", _q.q_session_window),
        ("stream_join", _q.q_stream_join),
        ("doc_fingerprint", _d.q_doc_fingerprint),
        ("embedding_norms", _d.q_embedding_norms),
        ("text_normalize", _d.q_text_normalize),
        ("dedup_exact", _d.q_dedup_exact),
        ("cms_tokens", _d.q_cms_tokens),
        ("streaming_interval_join", _q.q_streaming_interval_join),
        ("streaming_distinct", _q.q_streaming_distinct),
        ("streaming_quantile", _q.q_streaming_quantile),
        ("streaming_upsert", _q.q_streaming_upsert),
        ("streaming_global", _q.q_streaming_global),
        ("streaming_topk", _q.q_streaming_topk),
        ("streaming_absence", _q.q_streaming_absence),
        ("streaming_outer_join", _q.q_streaming_outer_join),
        ("streaming_running", _q.q_streaming_running),
        ("streaming_sessionize", _q.q_streaming_sessionize),
        ("streaming_hll", _q.q_streaming_hll),
        ("streaming_qsketch", _q.q_streaming_qsketch),
        ("streaming_sliding_global", _q.q_streaming_sliding_global),
        ("rollup_usage", _q.q_rollup_usage),
        ("cohort_retention", _q.q_cohort_retention),
        ("funnel_stages", _q.q_funnel_stages),
        ("tfidf_top_terms", _d.q_tfidf_top_terms),
        ("knn_classify", _d.q_knn_classify),
        ("pivot_roles", _q.q_pivot_roles),
        ("streaming_scrub", _q.q_streaming_scrub),
        ("streaming_anomaly", _q.q_streaming_anomaly),
        ("streaming_events_compacted", _q.q_streaming_events_compacted),
        ("streaming_tumbling_compacted", _q.q_streaming_tumbling_compacted),
        ("streaming_events_follower", _q.q_streaming_events_follower),
        ("domain_filter", _d.q_domain_filter),
        # late-round-4 cessions: generic relational demos + twins whose
        # families stay driver-gated (see __ray_entry__.queries docstring)
        ("events_hourly", _q.q_events_hourly),
        ("lineitem_pricing", _q.q_lineitem_pricing),
        ("orders_by_segment", _q.q_orders_by_segment),
        ("top_lineitems", _d.q_top_lineitems),
        ("semi_anti_orders", _q.q_semi_anti_orders),
        ("lang_stats", _d.q_lang_stats),
        ("centroid_by_label", _d.q_centroid_by_label),
        ("sample_balanced", _d.q_sample_balanced),
        ("curation_pipeline", _d.q_curation_pipeline),
        # extension-session additions
        ("line_dedup", _d.q_line_dedup),
        ("inverted_index", _d.q_inverted_index),
        ("vocab_coverage", _d.q_vocab_coverage),
        ("pq_encode", _d.q_pq_encode),
        ("pq_search", _d.q_pq_search),
        ("curriculum_shards", _d.q_curriculum_shards),
    ]:
        qs.setdefault(_name, _fn)
        if _name in _ALL_SQL:
            sqls.setdefault(_name, _ALL_SQL[_name])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        got = to_pandas(fn(sf_dir))
        t1 = time.time()
        if name not in sqls:
            print(f"  {name:24s} rows={len(got):8d}  (rows-only, no oracle)  {t1-t0:5.1f}s")
            continue
        exp = con.execute(sqls[name]).fetch_arrow_table().to_pandas()
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(exp)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"  {name:24s} {status} rows={len(got):8d}/{len(exp):<8d} "
            f"cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else 'DIFF'}  {t1-t0:5.1f}s"
        )
        if status == "FAIL":
            failures += 1
            if not ok_cols:
                print(f"    ray : {sorted(got.columns)}")
                print(f"    sql : {sorted(exp.columns)}")
            elif not ok_hash:
                g, e = normalize(got), normalize(exp)
                neq = (g != e).any(axis=1) if len(g) == len(e) else None
                print(g.head(3).to_string())
                print(e.head(3).to_string())
                if neq is not None and neq.any():
                    i = neq.idxmax()
                    print("    first diff row:", i)
                    print("    ray:", g.loc[i].to_dict())
                    print("    sql:", e.loc[i].to_dict())
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
