"""Deduplication stages for training-data pipelines.

All variants follow the scale pattern from the Ray guide: vectorized
per-batch signature computation in ``map_batches`` → ONE groupby on the
signature/bucket key → per-group verification. Small sides (candidate doc
texts for exact-Jaccard verification) are broadcast with ``ray.put``.

- exact: content hash → hash-partitioned group → keep min doc_id
- MinHash + LSH: word-shingle → k-perm minhash → banded buckets →
  candidate pairs → exact Jaccard verify → min-label components
- SimHash: 64-bit sign-hash of token weights; near-dup = small Hamming dist
- n-gram Jaccard: exact pairwise within a blocking key (source)
- embedding cosine: normalized-vector LSH bucket (or brute force per group)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MERSENNE = np.uint64((1 << 61) - 1)


def _token_hashes(text: str) -> np.ndarray:
    """Stable 64-bit hashes of whitespace tokens."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = np.uint64(14695981039346656037)
        with np.errstate(over="ignore"):
            for b in t.encode("utf-8"):
                h = (h ^ np.uint64(b)) * np.uint64(1099511628211)
        out[i] = h
    return out


def shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """Hashes of word w-shingles (overlapping windows of w tokens)."""
    th = _token_hashes(text)
    if len(th) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(th) < w:
        return np.array([th.sum()], dtype=np.uint64)  # degenerate short doc
    with np.errstate(over="ignore"):
        acc = th[: len(th) - w + 1].copy()
        for j in range(1, w):
            acc = acc * np.uint64(1000003) + th[j : len(th) - w + 1 + j]
    return np.unique(acc)


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature (k permutations) +
    banded LSH keys. Permutation parameters are seeded in __init__ (once per
    actor, identical across actors)."""

    def __init__(self, k: int = 64, bands: int = 16, shingle_w: int = 3, seed: int = 97):
        assert k % bands == 0
        rng = np.random.default_rng(seed)
        self.k, self.bands, self.rows = k, bands, k // bands
        self.w = shingle_w
        self.a = rng.integers(1, (1 << 61) - 1, k, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, k, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.w)
        if len(sh) == 0:
            return np.zeros(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (k, n_shingles) universal hashing, min per permutation
            vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """doc batch -> exploded (doc_id, band_id, band_hash) rows."""
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(texts)
        sigs = np.empty((n, self.k), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = self.signature(t)
        band_sigs = sigs.reshape(n, self.bands, self.rows)
        with np.errstate(over="ignore"):
            band_hash = band_sigs[:, :, 0].copy()
            for j in range(1, self.rows):
                band_hash = band_hash * np.uint64(1099511628211) + band_sigs[:, :, j]
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, self.bands)),
                "band_id": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(band_hash.reshape(-1).astype(np.int64)),
            }
        )


def candidate_pairs_from_band_group(group: pd.DataFrame) -> pd.DataFrame:
    """All doc pairs sharing one (band_id, band_hash) bucket."""
    ids = np.sort(group["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})


def candidate_pairs_from_band_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized candidate-pair extraction for a PARTITION of band rows
    (many buckets at once): sort, find same-(band_id, band_hash) runs,
    expand only the multi-doc runs. Avoids one Python call per bucket —
    buckets are numerous and tiny, partitions are few and large."""
    if not len(df):
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")})
    df = df.sort_values(["band_id", "band_hash", "doc_id"], kind="mergesort")
    band = df["band_id"].to_numpy()
    bh = df["band_hash"].to_numpy()
    ids = df["doc_id"].to_numpy()
    new_run = np.r_[True, (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])]
    starts = np.flatnonzero(new_run)
    ends = np.r_[starts[1:], len(df)]
    sizes = ends - starts
    out_a, out_b = [], []
    for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
        u = np.unique(ids[s:e])
        if len(u) < 2:
            continue
        ia, ib = np.triu_indices(len(u), k=1)
        out_a.append(u[ia])
        out_b.append(u[ib])
    if not out_a:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")})
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
    ).drop_duplicates()


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def simhash64(text: str) -> np.uint64:
    """64-bit SimHash over token hashes (unit weights)."""
    th = _token_hashes(text)
    if len(th) == 0:
        return np.uint64(0)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    with np.errstate(over="ignore"):
        for i in range(64):
            if v[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
    return out


def simhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    hs = np.array([simhash64(t) for t in texts], dtype=np.uint64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(hs.astype(np.int64)),
            # 4-band blocking key for near-dup candidate generation
            "band0": pa.array((hs & np.uint64(0xFFFF)).astype(np.int64)),
        }
    )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def ngram_jaccard_pairs_group(group: pd.DataFrame, *, tau_x1000: int = 200) -> pd.DataFrame:
    """Exact pairwise token-set Jaccard within one blocking group.

    Output jaccard scaled to integer x1000 (floor) so the DuckDB oracle can
    match exactly. Token sets = distinct \\s+ tokens (unigrams, n=1)."""
    ids = group["doc_id"].to_numpy()
    sets = [np.unique(np.array(t.split(), dtype=object)) for t in group["text"]]
    rows_a, rows_b, rows_j = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(np.intersect1d(sets[i], sets[j], assume_unique=True))
            uni = len(sets[i]) + len(sets[j]) - inter
            jx = (1000 * inter) // uni if uni else 1000
            if jx >= tau_x1000:
                a, b = int(ids[i]), int(ids[j])
                if a > b:
                    a, b = b, a
                rows_a.append(a)
                rows_b.append(b)
                rows_j.append(jx)
    return pd.DataFrame(
        {
            "doc_a": pd.Series(rows_a, dtype="int64"),
            "doc_b": pd.Series(rows_b, dtype="int64"),
            "jaccard_x1000": pd.Series(rows_j, dtype="int64"),
        }
    )


def connected_components_min_label(edges: pd.DataFrame, ids: np.ndarray) -> pd.DataFrame:
    """Min-label propagation (driver-side union-find over the — small —
    verified duplicate edge set; the guide's sanctioned fallback when the
    candidate set is provably small)."""
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges["doc_a"], edges["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return pd.DataFrame(
        {
            "doc_id": [int(i) for i in ids],
            "cluster_id": [find(int(i)) for i in ids],
        }
    )
