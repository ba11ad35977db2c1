"""Stream-table dimension enrichment: the broadcast-join operator of every
structured-streaming engine (Flink lookup joins, Spark broadcast joins) as an
engine kernel.

Each emitted row is the input row LEFT-JOINed against a small dimension
table on one key column. The dimension side is a parquet file loaded ONCE
per worker process (module-level cache keyed by (path, mtime)) — the
broadcast-small-side pattern: the stream never shuffles, the lookup rides
with the task. Stateless (state = {}); flush is a no-op; multi-epoch output
== single pass trivially.

Two lookup modes:

- point-in-key (default): the dim key is unique; plain LEFT join.
- temporal / as-of (``dim_effective_col``): the dim table is a slowly
  changing dimension (SCD type 2) with one row per (key, version); each
  stream row joins the LATEST version whose effective timestamp is <= the
  row's event time — DuckDB ``ASOF LEFT JOIN`` semantics. Rows before the
  first version (or with an unknown key) keep nulls.

The reference has no analog (its router only moves envelopes); this covers
the 'attach reference data to the stream' step every deployment bolts on.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dstream_ray.common import BoundedCache, ts_to_us

# cache key -> {"keys", "cols", "types", ...}; loaded once per worker
# process. Bounded: workers see a handful of dim tables per job; FIFO at 8.
_DIM_CACHE: dict = BoundedCache(maxsize=8)


def _load_dim(
    dim_path: str,
    dim_key: str,
    dim_cols: list[str] | None,
    effective_col: str | None = None,
):
    mtime = os.path.getmtime(dim_path)
    cache_key = (
        dim_path,
        mtime,
        dim_key,
        tuple(dim_cols) if dim_cols else None,
        effective_col,
    )
    hit = _DIM_CACHE.get(cache_key)
    if hit is not None:
        return hit
    cols = None
    if dim_cols:
        cols = [dim_key] + list(dim_cols)
        if effective_col and effective_col not in cols:
            cols.append(effective_col)
    tbl = pq.read_table(dim_path, columns=cols)
    df = tbl.to_pandas()
    if effective_col is None:
        if df[dim_key].duplicated().any():
            raise ValueError(
                f"dimension table {dim_path} has duplicate keys in {dim_key!r}; "
                "point enrichment requires a unique key (deduplicate the dim "
                "side, or pass dim_effective_col for versioned/as-of lookup)"
            )
        df = df.sort_values(dim_key).reset_index(drop=True)
        drop = {dim_key}
    else:
        if df.duplicated([dim_key, effective_col]).any():
            raise ValueError(
                f"dimension table {dim_path} has duplicate "
                f"({dim_key!r}, {effective_col!r}) versions; as-of lookup needs "
                "one row per key per effective timestamp"
            )
        df = df.sort_values([dim_key, effective_col]).reset_index(drop=True)
        drop = {dim_key, effective_col}
    out_cols = [c for c in df.columns if c not in drop]
    entry = {
        "keys": df[dim_key].to_numpy(),
        "cols": {c: df[c].to_numpy() for c in out_cols},
        # pin Arrow output types from the dim schema: a batch whose rows all
        # miss would otherwise infer type `null` and break sink concat
        "types": {c: tbl.schema.field(c).type for c in out_cols},
    }
    if effective_col is not None:
        eff_sorted = df[effective_col]  # already (key, eff)-sorted
        entry["eff_us"] = (
            eff_sorted.astype("datetime64[us]").astype("int64").to_numpy()
            if str(eff_sorted.dtype).startswith("datetime")
            else eff_sorted.to_numpy().astype(np.int64)
        )
        keys_sorted = entry["keys"]
        seg = np.flatnonzero(np.r_[True, keys_sorted[1:] != keys_sorted[:-1]])
        entry["uniq_keys"] = keys_sorted[seg]
        entry["seg_bounds"] = np.r_[seg, len(keys_sorted)]
    _DIM_CACHE[cache_key] = entry
    return entry


def enrich_kernel(
    new_rows: pa.Table,
    state: dict,
    *,
    dim_path: str,
    dim_key: str,
    key_col: str = "tool",
    dim_cols: list[str] | None = None,
    dim_effective_col: str | None = None,
    ts_col: str = "ts",
    flush: bool = False,
    **_ignored,
) -> tuple[pa.Table, dict]:
    """LEFT-join ``new_rows[key_col]`` against the dimension parquet's
    ``dim_key``; unmatched rows keep nulls in the dimension columns.
    Vectorized: sorted-key searchsorted membership + take, no per-row
    Python. With ``dim_effective_col``, as-of semantics: match the latest
    dim version with effective ts <= the row's ``ts_col`` (one vectorized
    searchsorted per dim key present in the batch — the dim side is
    broadcast-small by contract, so segments, not rows, bound the loop)."""
    if new_rows.num_rows == 0:
        return new_rows, {}
    dim = _load_dim(dim_path, dim_key, dim_cols, dim_effective_col)
    keys = dim["keys"]
    vals = np.asarray(new_rows[key_col].to_pandas())
    if dim_effective_col is None:
        if len(keys):
            idx = np.searchsorted(keys, vals)
            idx_c = np.minimum(idx, len(keys) - 1)
            hit = keys[idx_c] == vals
        else:
            idx_c = np.zeros(len(vals), dtype=np.int64)
            hit = np.zeros(len(vals), dtype=bool)
    else:
        uniq, bounds, eff = dim["uniq_keys"], dim["seg_bounds"], dim["eff_us"]
        row_ts = ts_to_us(new_rows[ts_col])
        idx_c = np.zeros(len(vals), dtype=np.int64)
        hit = np.zeros(len(vals), dtype=bool)
        if len(uniq):
            ki = np.searchsorted(uniq, vals)
            ki_c = np.minimum(ki, len(uniq) - 1)
            key_ok = uniq[ki_c] == vals
            for k in np.unique(ki_c[key_ok]):
                lo, hi = int(bounds[k]), int(bounds[k + 1])
                rows_k = np.flatnonzero(key_ok & (ki_c == k))
                # latest version with eff <= row ts (right bisect - 1)
                ver = np.searchsorted(eff[lo:hi], row_ts[rows_k], side="right") - 1
                ok = ver >= 0
                idx_c[rows_k[ok]] = lo + ver[ok]
                hit[rows_k[ok]] = True
    out = new_rows
    for cname, cvals in dim["cols"].items():
        # dtype-preserving LEFT join: build the Arrow column with a null
        # mask so an int64 dim column stays int64-with-nulls (a pandas
        # .where(None) detour would coerce to float64)
        out = out.append_column(
            f"dim_{cname}",
            pa.array(cvals[idx_c], type=dim["types"][cname], mask=~hit),
        )
    return out, {}
