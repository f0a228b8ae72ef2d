#!/usr/bin/env python3
"""Deterministic scale-series generator for the r7 empirical scaling run.

Generates events/documents tables at several scale factors with the SAME
shape rules the driver's testdata follows (verified against
/root/testdata/sf*: events rows x10 AND distinct users x10 per sf step
over a FIXED 30-day window; documents rows x10, ~300 chars, 5 langs,
20 sources), so per-query scaling ratios between the generated tiers are
apples-to-apples. Only the tables the scale-run queries touch are
generated. Timestamps are written as parquet TIMESTAMP(NANOS) to match
the driver files (graft.sources.Tables reads nanos-as-long).

Usage: python3 tools/gen_scale.py <outroot> <sf> [<sf> ...]
e.g.   python3 tools/gen_scale.py tmpdata 0.1 0.3 1
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_EVENTS = 1_000_000   # rows at sf=1
BASE_USERS = 15_000       # distinct user_id at sf=1
BASE_DOCS = 50_000        # documents at sf=1
BASE_VECS = 20_000        # embeddings at sf=1 (driver sf0.1 has 2000)
DAYS = 30                 # fixed time window (does NOT scale, like the driver)
ETYPES = ["click", "view", "purchase", "scroll", "hover"]
LANGS = ["en", "de", "fr", "es", "pt"]


def gen_events(outdir: str, sf: float) -> None:
    rng = np.random.default_rng(4242)
    n = int(BASE_EVENTS * sf)
    users = max(int(BASE_USERS * sf), 1)
    ns = (rng.random(n) * DAYS * 86400 * 1e9).astype("int64")
    ns.sort()
    ts = np.datetime64("2024-01-01T00:00:00", "ns") + ns
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype="int64")),
        "ts": pa.array(ts, type=pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, users, n, dtype="int64")),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n)]),
        # positive, so candle log-returns are defined
        "value": pa.array(np.round(50.0 + 50.0 * rng.random(n), 6)),
        "props": pa.array(np.char.add("p", rng.integers(0, 100, n).astype(str))),
    })
    pq.write_table(tbl, os.path.join(outdir, "events.parquet"))


def gen_documents(outdir: str, sf: float) -> None:
    rng = np.random.default_rng(2424)
    n = int(BASE_DOCS * sf)
    vocab = np.array([f"word{i:04d}" for i in range(5000)])
    # Zipf-ish token distribution -> realistic shingle document-frequency
    # skew (what dedup_ngram's hot-shingle cap exists for)
    p = 1.0 / (np.arange(5000) + 10.0)
    p /= p.sum()
    texts = []
    for i in range(n):
        ln = int(40 + 30 * rng.random())
        toks = vocab[rng.choice(5000, size=ln, p=p)]
        if i % 200 == 199 and i >= 100:
            # ~0.5% near-dups: mutate an earlier doc by replacing 2 tokens
            prev = texts[i - 100].split(" ")
            for j in rng.integers(0, len(prev), 2):
                prev[j] = vocab[rng.integers(0, 5000)]
            texts.append(" ".join(prev))
        else:
            texts.append(" ".join(toks))
    txt = np.array(texts)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype="int64")),
        "text": pa.array(txt),
        "lang": pa.array(np.array(LANGS)[rng.integers(0, 5, n)]),
        "source": pa.array(np.char.add("src", rng.integers(0, 20, n).astype(str))),
        "n_chars": pa.array(np.char.str_len(txt).astype("int64")),
    })
    pq.write_table(tbl, os.path.join(outdir, "documents.parquet"))


def gen_embeddings(outdir: str, sf: float) -> None:
    """Match the driver's embeddings shape (verified against sf0.1): 64-dim
    float32, unit L2 norm, 10 labels, and only WEAK cluster structure —
    measured mean cosine-to-own-label-centroid ~= 0.07 on the driver file,
    i.e. e = normalize(gauss + a * c_label) with a ~= 0.38 at per-coord
    unit variance. This keeps the IVF recall problem honestly hard: lists
    barely align with true neighborhoods, so probe-count defaults are
    stress-tested rather than flattered by tight synthetic clusters."""
    rng = np.random.default_rng(6464)
    n = int(BASE_VECS * sf)
    dim, nlab, a = 64, 10, 0.38
    cents = rng.standard_normal((nlab, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    lab = rng.integers(0, nlab, n)
    e = rng.standard_normal((n, dim)) + a * cents[lab]
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    e = e.astype("float32")
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype="int64")),
        "embedding": pa.array(list(e), type=pa.list_(pa.float32())),
        "label": pa.array(lab.astype("int32")),
    })
    pq.write_table(tbl, os.path.join(outdir, "embeddings.parquet"))


def main() -> None:
    root = sys.argv[1]
    for sf_s in sys.argv[2:]:
        sf = float(sf_s)
        outdir = os.path.join(root, f"g{sf_s}")
        os.makedirs(outdir, exist_ok=True)
        gen_events(outdir, sf)
        gen_documents(outdir, sf)
        gen_embeddings(outdir, sf)
        print(f"{outdir}: events={int(BASE_EVENTS * sf)} "
              f"users={int(BASE_USERS * sf)} docs={int(BASE_DOCS * sf)} "
              f"vecs={int(BASE_VECS * sf)}")


if __name__ == "__main__":
    main()
