"""Generate a distribution-matched big scale factor locally (default sf1.0
under /root/bigsf) for INTERNAL before/after timing at driver scale.
The driver generates its own sf1.0; /root/testdata is read-only and stays
untouched. Matched properties (measured from /root/testdata/sf0.1):

- documents: rows x10 (50k), 31-word vocab, ntok ~ U[10,100], lang/source
  marginals, ~2.5%% near-dup pairs (85%% token overlap) + 0.16%% exact dups.
- embeddings: rows x10 (20k), per-label Gaussian fit from sf0.1 (10 labels,
  64 dims, float32).
- events: rows x10 (1M), users x10 (15k), SAME 30-day span (exp gaps with
  mean/10), value ~ Exp(50) 2dp, props {"k": U[0,99]}, event_id = ts rank.
- TPC-H tables: 10 key-offset copies of sf0.1 (referential integrity kept
  per copy; nation/region copied verbatim).

Usage: python tools/make_big_sf.py [out_dir] [mult]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/bigsf/sf1.0"
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SEED = 4242

VOCAB = None  # filled from sf0.1


def gen_documents(rng: np.random.Generator) -> pd.DataFrame:
    src = pd.read_parquet(f"{SRC}/documents.parquet")
    vocab = sorted(pd.Series([t for l in src.text.str.split() for t in l]).unique())
    n = len(src) * MULT
    langs, lang_p = np.unique(src.lang, return_counts=True)
    lang_p = lang_p / lang_p.sum()
    sources = sorted(src.source.unique())
    ntok = rng.integers(10, 101, size=n)
    texts = []
    for k in ntok:
        texts.append(" ".join(rng.choice(vocab, size=k)))
    # near-dup injection: ~2.5% of docs get a perturbed partner (matches the
    # ~256 candidate pairs / 5k docs measured at sf0.1)
    n_near = int(0.025 * n)
    src_idx = rng.choice(n, size=n_near * 2, replace=False)
    for a, b in zip(src_idx[:n_near], src_idx[n_near:]):
        toks = texts[a].split()
        m = max(1, int(0.15 * len(toks)))
        pos = rng.choice(len(toks), size=m, replace=False)
        for p in pos:
            toks[p] = str(rng.choice(vocab))
        texts[b] = " ".join(toks)
    # exact dups: 8 pairs per 5k docs
    n_dup = int(8 * n / 5000)
    d_idx = rng.choice(n, size=n_dup * 2, replace=False)
    for a, b in zip(d_idx[:n_dup], d_idx[n_dup:]):
        texts[b] = texts[a]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(langs, size=n, p=lang_p),
        "source": rng.choice(sources, size=n),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def gen_embeddings(rng: np.random.Generator) -> pd.DataFrame:
    src = pd.read_parquet(f"{SRC}/embeddings.parquet")
    mat = np.vstack(src.embedding.values).astype(np.float64)
    labels = src.label.values
    n = len(src) * MULT
    out_label = rng.integers(0, 10, size=n).astype(np.int32)
    vecs = np.empty((n, mat.shape[1]), dtype=np.float32)
    for lb in range(10):
        sub = mat[labels == lb]
        mu, sd = sub.mean(axis=0), sub.std(axis=0)
        sel = out_label == lb
        vecs[sel] = (mu + rng.standard_normal((sel.sum(), mat.shape[1])) * sd).astype(np.float32)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(vecs),
        "label": out_label,
    })


def gen_events(rng: np.random.Generator) -> pd.DataFrame:
    src = pd.read_parquet(f"{SRC}/events.parquet")
    n = len(src) * MULT
    n_users = src.user_id.nunique() * MULT
    mean_gap_us = 25.9198e6 / MULT
    gaps = rng.exponential(mean_gap_us, size=n).astype(np.int64)
    ts = np.datetime64("2024-01-01T00:00:00") + np.cumsum(gaps).astype("timedelta64[us]")
    types = np.array(sorted(src.event_type.unique()))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
        "event_type": rng.choice(types, size=n),
        "value": np.round(rng.exponential(49.87, size=n), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)],
    })


def copy_tpch() -> None:
    for t in ["nation", "region"]:
        pd.read_parquet(f"{SRC}/{t}.parquet").to_parquet(f"{OUT}/{t}.parquet", index=False)
    # offsets keyed by entity so foreign keys stay consistent across tables
    specs = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    }
    ent = lambda k: k.split("_", 1)[1]  # c_custkey -> custkey
    offs: dict[str, int] = {}
    tables = {t: pd.read_parquet(f"{SRC}/{t}.parquet") for t in specs}
    for t, keys in specs.items():
        for k in keys:
            offs.setdefault(ent(k), int(tables[t][k].max()) + 1)
    for t, keys in specs.items():
        copies = []
        for i in range(MULT):
            c = tables[t].copy()
            for k in keys:
                c[k] = c[k] + i * offs[ent(k)]
            copies.append(c)
        pd.concat(copies, ignore_index=True).to_parquet(f"{OUT}/{t}.parquet", index=False)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(SEED)
    gen_documents(rng).to_parquet(f"{OUT}/documents.parquet", index=False)
    print("documents done", flush=True)
    gen_embeddings(rng).to_parquet(f"{OUT}/embeddings.parquet", index=False)
    print("embeddings done", flush=True)
    gen_events(rng).to_parquet(f"{OUT}/events.parquet", index=False)
    print("events done", flush=True)
    copy_tpch()
    open(f"{OUT}/_DONE", "w").close()
    print("all done ->", OUT, flush=True)


if __name__ == "__main__":
    main()
