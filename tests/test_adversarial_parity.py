"""Adversarial-distribution oracle parity: the driver gates against the
benign sf0.01 tables; this suite regenerates a documents table full of edge
cases (empty / whitespace-only / single-token / punctuation-only / massive
duplication / skewed strata / a huge doc) and re-runs the document-family
queries against their DuckDB oracles in-process. Catches
distribution-dependent divergence the standard gate can't see.

ASCII-only by design: the oracles compare byte-level FNV against DuckDB
``ord(char)``, which only agree when codepoint == utf-8 byte (documented
oracle limitation; the ENGINE itself is byte-correct for any input).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tools.parity_check import normalize, to_pandas, value_hash

ADVERSARIAL_QUERIES = [
    "doc_stats",
    "bpe_token_counts",
    "langid_markers",
    "doc_fingerprint",
    "doc_fingerprint_rolling",
    "dedup_exact",
    "simhash",
    "minhash_dedup",
    "ngram_jaccard",
    "text_normalize",
    "sample_balanced",
    "pack_sequences",
    "len_quantiles",
    "curation_pipeline",
]


def make_adversarial_documents(tmp_path) -> str:
    rng = np.random.default_rng(99)
    vocab = "the a and of to alpha beta gamma delta tok1 tok2 tok3".split()
    texts, langs, sources = [], [], []

    def add(t, lang="en", source="srcA"):
        texts.append(t)
        langs.append(lang)
        sources.append(source)

    # edge cases
    add("")
    add("   ")
    add("\t\n")
    add("one")
    add("a b")
    add("!!! ??? ... ;;;")
    add("x" * 3000)  # one huge token
    add(("word " * 500).strip())  # long doc, quality-band boundary
    add("the the the the the the the the the the")  # all-stopwords
    # heavy duplication (exact + near)
    base = " ".join(rng.choice(vocab, 40))
    for _ in range(6):
        add(base, lang="de", source="srcB")
    near = base.split()
    near[3] = "changed"
    add(" ".join(near), lang="de", source="srcB")
    # skewed strata: lots of 'en', few 'fr'
    for i in range(40):
        add(" ".join(rng.choice(vocab, int(rng.integers(5, 60)))), lang="en",
            source="srcA" if i % 2 else "srcB")
    for _ in range(3):
        add(" ".join(rng.choice(vocab, 20)), lang="fr", source="srcB")
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array(sources, type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize("qname", ADVERSARIAL_QUERIES)
def test_adversarial_documents_parity(ray_session, tmp_path, qname):
    import __ray_entry__ as entry

    sf_dir = make_adversarial_documents(tmp_path)
    qs, sqls = entry.queries(), entry.oracle_sql()
    got = to_pandas(qs[qname](sf_dir))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(sqls[qname]).fetch_df()
    assert len(got) == len(exp), (qname, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), qname
    assert value_hash(got) == value_hash(exp), (
        qname,
        normalize(got).head(),
        normalize(exp).head(),
    )
