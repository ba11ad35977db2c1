"""Text-analysis stages for large-scale training-data pipelines.

Operate on the ``documents`` table (``doc_id, text, lang, source, n_chars``)
as vectorized batch kernels; the stateful variants (compiled regexes, marker
tables) are callable CLASSES for ``map_batches(Cls, concurrency=N)`` actor
pools — setup once per actor, work per batch.

Every metric that feeds a DuckDB oracle uses integer/boolean outputs and
token semantics identical to ``string_split_regex(trim(text), '\\s+')`` so
both sides agree exactly.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from dstream_ray.common import poly_hash_strings, utf8_view

STOPWORDS = ("the", "a", "and", "of", "to")

LANG_MARKERS = {
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}


def _token_count_regex(words: tuple[str, ...]) -> re.Pattern:
    """Counts whitespace-delimited tokens exactly equal to one of ``words`` —
    same semantics as filtering the \\s+ split list."""
    alt = "|".join(re.escape(w) for w in words)
    return re.compile(rf"(?:^|\s)(?:{alt})(?=\s|$)")


class DocStats:
    """Actor-pool stage: per-doc token/quality metrics.

    __init__ compiles all patterns once per actor;
    __call__ is vectorized pandas/numpy per batch.
    """

    def __init__(self):
        self.tok = re.compile(r"\S+")
        self.alpha = re.compile(r"[a-zA-Z]")
        self.stop = _token_count_regex(STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].astype(str)
        stripped = text.str.strip()
        n_tokens = stripped.str.count(self.tok).astype("int64")
        n_tokens = n_tokens.where(stripped != "", 0)
        n_alpha = text.str.count(self.alpha).astype("int64")
        n_stop = text.str.count(self.stop).astype("int64")
        n_nospace = text.str.replace(" ", "", regex=False).str.len().astype("int64")
        mean_tok_len_x100 = np.where(
            n_tokens > 0, (n_nospace * 100) // n_tokens.clip(lower=1), 0
        ).astype("int64")
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tokens,
                "n_alpha": n_alpha,
                "n_stop": n_stop,
                "mean_tok_len_x100": mean_tok_len_x100,
                "is_quality": (n_tokens.between(10, 1000)) & (n_stop * 5 <= n_tokens),
            }
        )
        return out


class LangIdMarkers:
    """Marker-word language ID (SQL-expressible variant: exact token counts
    per language marker set, argmax with ties -> 'en')."""

    def __init__(self):
        self.pats = {lang: _token_count_regex(ws) for lang, ws in LANG_MARKERS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].astype(str)
        scores = {lang: text.str.count(p).to_numpy() for lang, p in self.pats.items()}
        de, fr, es = scores["de"], scores["fr"], scores["es"]
        pred = np.full(len(text), "en", dtype=object)
        pred[(de > fr) & (de > es) & (de > 0)] = "de"
        pred[(fr > de) & (fr > es) & (fr > 0)] = "fr"
        pred[(es > de) & (es > fr) & (es > 0)] = "es"
        return pd.DataFrame({"doc_id": batch["doc_id"], "pred_lang": pred})


class LangIdNgram:
    """Real language-ID heuristic: cosine over character-trigram frequency
    profiles built per actor from small seeded exemplar corpora. Not
    SQL-expressible — validated by pytest on synthetic multilingual text."""

    EXEMPLARS = {
        "en": "the quick brown fox jumps over the lazy dog and then it runs to "
        "the house of the friend who was waiting with a cup of tea",
        "de": "der schnelle braune fuchs springt über den faulen hund und läuft "
        "dann zum haus des freundes der mit einer tasse tee wartete",
        "fr": "le rapide renard brun saute par dessus le chien paresseux et "
        "court ensuite vers la maison de l ami qui attendait avec une tasse de thé",
        "es": "el rápido zorro marrón salta sobre el perro perezoso y luego "
        "corre hacia la casa del amigo que esperaba con una taza de té",
    }

    def __init__(self):
        self.profiles = {
            lang: self._profile(txt) for lang, txt in self.EXEMPLARS.items()
        }

    @staticmethod
    def _trigrams(s: str) -> list[str]:
        s = f"  {s.lower()}  "
        return [s[i : i + 3] for i in range(len(s) - 2)]

    def _profile(self, s: str) -> dict[str, float]:
        from collections import Counter

        c = Counter(self._trigrams(s))
        norm = sum(v * v for v in c.values()) ** 0.5
        return {k: v / norm for k, v in c.items()}

    def classify(self, s: str) -> str:
        from collections import Counter

        c = Counter(self._trigrams(s))
        best, best_score = "en", -1.0
        for lang, prof in self.profiles.items():
            score = sum(prof.get(k, 0.0) * v for k, v in c.items())
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": [self.classify(t) for t in batch["text"].astype(str)],
            }
        )


def fingerprint_poly(batch: pa.Table) -> pa.Table:
    """Whole-document content fingerprint: 64-bit polynomial (Horner) hash
    of the UTF-8 bytes, vectorized over the batch (no per-row Python —
    replaces the round-2 per-row ``hashlib.md5`` loop). Oracle: the same
    Horner recurrence in HUGEINT (``list_reduce(chars, (a,b) -> (a*1000003
    + b) % 2^64)``), signed-cast to BIGINT."""
    (h,) = poly_hash_strings(batch["text"], bases=(1000003,))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint64": pa.array(h.astype(np.int64)),
        }
    )


def rolling_fingerprint(batch: pa.Table, *, window: int = 16) -> pa.Table:
    """Winnowing-style document fingerprint: min of rolling polynomial hashes
    over byte windows — robust to small appends.

    Fully vectorized over the batch: ``window`` Horner passes over the shared
    Arrow byte buffer compute every window hash of every doc at once (the
    polynomial sum mod 2^64 is identical to the per-doc rolling recurrence),
    then one ``minimum.reduceat`` takes the per-doc min. Docs shorter than
    the window hash all their bytes. Not SQL-expressible as one query; the
    oracle checks the short-doc Horner path + min-over-windows via DuckDB
    list kernels where possible, and pytest pins scalar parity."""
    data, starts, ends = utf8_view(batch["text"])
    lengths = ends - starts
    n = len(lengths)
    fps = np.zeros(n, dtype=np.uint64)
    B = np.uint64(1000003)
    with np.errstate(over="ignore"):
        long = lengths >= window
        if long.any():
            win_counts = (lengths[long] - window + 1).astype(np.int64)
            seg_offsets = np.zeros(len(win_counts) + 1, dtype=np.int64)
            np.cumsum(win_counts, out=seg_offsets[1:])
            intra = (
                np.arange(seg_offsets[-1], dtype=np.int64)
                - np.repeat(seg_offsets[:-1], win_counts)
            )
            pos = np.repeat(starts[long], win_counts) + intra
            h = np.zeros(len(pos), dtype=np.uint64)
            for t in range(window):
                h = h * B + data[pos + t].astype(np.uint64)
            fps[long] = np.minimum.reduceat(h, seg_offsets[:-1])
        short = (~long) & (lengths > 0)
        if short.any():
            s_starts = starts[short]
            s_lens = lengths[short]
            h = np.zeros(len(s_starts), dtype=np.uint64)
            for t in range(int(s_lens.max())):
                m = s_lens > t
                h[m] = h[m] * B + data[s_starts[m] + t].astype(np.uint64)
            fps[short] = h
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint64": pa.array(fps.astype(np.int64)),
        }
    )


# GPT-2-style (simplified) BPE pre-tokenizer pattern — RE2-compatible subset
# (no lookahead) so the DuckDB oracle (regexp_extract_all) counts identically.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+|\s+"


class BpeTokenCounter:
    """Actor-pool stage: BPE-ish pre-token counts per doc (compiled once)."""

    def __init__(self):
        self.pat = re.compile(BPE_PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": batch["text"]
                .astype(str)
                .str.count(self.pat)
                .astype("int64"),
            }
        )
