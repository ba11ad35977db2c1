"""Stream-table dimension enrichment: the broadcast-join operator of every
structured-streaming engine (Flink lookup joins, Spark broadcast joins) as an
engine kernel.

Each emitted row is the input row LEFT-JOINed against a small dimension
table on one key column. The dimension side is a parquet file loaded ONCE
per worker process (module-level cache keyed by (path, mtime)) — the
broadcast-small-side pattern: the stream never shuffles, the lookup rides
with the task. Stateless (state = {}); flush is a no-op; multi-epoch output
== single pass trivially.

The reference has no analog (its router only moves envelopes); this covers
the 'attach reference data to the stream' step every deployment bolts on.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# (path, mtime) -> {"keys": sorted object ndarray, "cols": {name: ndarray}}
_DIM_CACHE: dict = {}


def _load_dim(dim_path: str, dim_key: str, dim_cols: list[str] | None):
    mtime = os.path.getmtime(dim_path)
    cache_key = (dim_path, mtime, dim_key, tuple(dim_cols) if dim_cols else None)
    hit = _DIM_CACHE.get(cache_key)
    if hit is not None:
        return hit
    cols = [dim_key] + list(dim_cols) if dim_cols else None
    tbl = pq.read_table(dim_path, columns=cols)
    df = tbl.to_pandas()
    if df[dim_key].duplicated().any():
        raise ValueError(
            f"dimension table {dim_path} has duplicate keys in {dim_key!r}; "
            "enrichment requires a unique key (deduplicate the dim side)"
        )
    df = df.sort_values(dim_key).reset_index(drop=True)
    out_cols = [c for c in df.columns if c != dim_key]
    entry = {
        "keys": df[dim_key].to_numpy(),
        "cols": {c: df[c].to_numpy() for c in out_cols},
        # pin Arrow output types from the dim schema: a batch whose rows all
        # miss would otherwise infer type `null` and break sink concat
        "types": {c: tbl.schema.field(c).type for c in out_cols},
    }
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
    flush: bool = False,
    **_ignored,
) -> tuple[pa.Table, dict]:
    """LEFT-join ``new_rows[key_col]`` against the dimension parquet's
    ``dim_key``; unmatched rows keep nulls in the dimension columns.
    Vectorized: sorted-key searchsorted membership + take, no per-row
    Python."""
    if new_rows.num_rows == 0:
        return new_rows, {}
    dim = _load_dim(dim_path, dim_key, dim_cols)
    keys = dim["keys"]
    vals = np.asarray(new_rows[key_col].to_pandas())
    if len(keys):
        idx = np.searchsorted(keys, vals)
        idx_c = np.minimum(idx, len(keys) - 1)
        hit = keys[idx_c] == vals
    else:
        idx_c = np.zeros(len(vals), dtype=np.int64)
        hit = np.zeros(len(vals), dtype=bool)
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
