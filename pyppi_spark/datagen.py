"""Deterministic synthetic transcript generator (FIXTURES.md §1-§2).

Everything derives from ``(seed, conv_id)`` so the same rows come out whether
generation runs in the driver (pandas, for tests/oracle) or distributed
(``mapInPandas``, for bench scale) — unlike the reference's unseeded sampling
(``/root/reference/pyPPI/cavities.py:53``), every draw here is seeded.

Skew: conversation sizes are Zipf-distributed — a few huge conversations, the
analog of the reference's large PDB complexes dominating its per-entity loop
(``/root/reference/bin/setupPpiDb.py:163``).

Edge cases baked in (FIXTURES.md generation requirements):
- single-turn conversations
- ties on ``ts`` within a conversation (disambiguated by ``turn_idx``)
- inter-turn gaps straddling the 1800 s session threshold
- runs of null ``tool`` (backfill fodder)
- out-of-order physical row placement (engine must sort, not assume order)
- empty and multi-byte UTF-8 ``text``
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .schema import TRANSCRIPTS

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "browser", "python", "bash", "sql"])
VOCAB = np.array(
    [
        "alpha", "beta", "gamma", "delta", "réseau", "naïve", "東京", "データ",
        "query", "plan", "join", "window", "shuffle", "μ", "σ", "token",
    ]
)
EPOCH_2025 = 1735689600  # 2025-01-01T00:00:00Z

ZIPF_A = 1.5
MAX_TURNS = 20_000
SESSION_GAP_S = 1800.0


def _conv_rng(seed: int, conv_id: str) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, abs(hash_u32(conv_id))]))


def hash_u32(s: str) -> int:
    """Stable 32-bit FNV-1a hash (Python's hash() is salted per-process)."""
    h = 2166136261
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def conv_n_turns(seed: int, conv_id: str) -> int:
    rng = _conv_rng(seed, conv_id)
    n = int(rng.zipf(ZIPF_A))
    return min(n, MAX_TURNS)


def gen_conv(seed: int, conv_id: str) -> pd.DataFrame:
    """Generate one conversation's turns as a pandas frame (vectorized)."""
    rng = _conv_rng(seed, conv_id)
    n = min(int(rng.zipf(ZIPF_A)), MAX_TURNS)

    # roles: user/assistant alternating-ish with system/tool sprinkled in
    role_pick = rng.random(n)
    base = np.where(np.arange(n) % 2 == 0, 0, 1)  # user, assistant
    roles = ROLES[base]
    roles = np.where(role_pick < 0.05, "system", roles)
    roles = np.where((role_pick >= 0.05) & (role_pick < 0.25), "tool", roles)

    tools = np.where(
        (roles == "tool") | ((roles == "assistant") & (rng.random(n) < 0.3)),
        TOOLS[rng.integers(0, len(TOOLS), n)],
        None,
    )

    # gaps: mixture — ties (0 s), fast turns, slow turns, session breaks
    kind = rng.random(n)
    gaps = np.where(kind < 0.06, 0.0, rng.uniform(0.5, 120.0, n))
    gaps = np.where(kind > 0.97, rng.uniform(SESSION_GAP_S + 1.0, 4 * SESSION_GAP_S, n), gaps)
    # a few gaps exactly at the threshold to pin the inclusive/exclusive bound
    gaps = np.where((kind > 0.955) & (kind <= 0.97), SESSION_GAP_S, gaps)
    gaps[0] = 0.0
    t0 = EPOCH_2025 + (hash_u32(conv_id) % 2_000_000)
    # integer-microsecond timestamps (gap resolution 1 ms) — exact under
    # Arrow us-precision, no float residue
    gap_us = np.round(gaps * 1000.0).astype("int64") * 1000
    ts_us = t0 * 1_000_000 + np.cumsum(gap_us)

    n_words = rng.integers(0, 8, n)
    word_idx = rng.integers(0, len(VOCAB), (n, 8))
    texts = [" ".join(VOCAB[word_idx[i, : n_words[i]]]) for i in range(n)]

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": np.arange(n, dtype="int32"),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pd.to_datetime(ts_us, unit="us"),
        }
    )


def conv_ids(n_convs: int) -> list[str]:
    return [f"conv{i:07d}" for i in range(n_convs)]


def gen_transcripts_pdf(n_convs: int, seed: int = 42, shuffle: bool = True) -> pd.DataFrame:
    """Driver-side generation (tests and the single-node oracle input)."""
    parts = [gen_conv(seed, cid) for cid in conv_ids(n_convs)]
    pdf = pd.concat(parts, ignore_index=True)
    if shuffle:
        # deterministic out-of-order physical placement
        perm = np.random.default_rng(seed + 1).permutation(len(pdf))
        pdf = pdf.iloc[perm].reset_index(drop=True)
    return pdf


def gen_transcripts_df(spark: SparkSession, n_convs: int, seed: int = 42) -> DataFrame:
    """Distributed generation: conv spec scan → mapInPandas turn expansion.

    Scales to bench sizes without driver memory pressure; rows are identical
    to :func:`gen_transcripts_pdf` (modulo physical order, which the engine
    must not depend on anyway).
    """
    spec = spark.createDataFrame(
        [(cid,) for cid in conv_ids(n_convs)], "conv_id string"
    ).repartition(max(spark.sparkContext.defaultParallelism, 8), "conv_id")

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for cid in b["conv_id"]:
                yield gen_conv(seed, cid)

    return spec.mapInPandas(expand, schema=TRANSCRIPTS)


def gen_probes_pdf(transcripts: pd.DataFrame, seed: int = 42, per_conv: int = 4) -> pd.DataFrame:
    """Probe rows for as-of joins (FIXTURES.md §2): at exact turn timestamps
    (tie case), between turns, before the first turn, after the last."""
    rng = np.random.default_rng(seed + 7)
    rows = []
    for cid, g in transcripts.sort_values(["conv_id", "ts", "turn_idx"]).groupby("conv_id"):
        ts = g["ts"].to_numpy()
        lo, hi = ts.min(), ts.max()
        cand = [
            lo - np.timedelta64(60, "s"),              # before first turn
            hi + np.timedelta64(60, "s"),              # after last turn
            ts[rng.integers(0, len(ts))],              # exactly on a turn (tie)
        ]
        for _ in range(max(per_conv - 3, 1)):          # strictly between turns
            base = ts[rng.integers(0, len(ts))]
            cand.append(base + np.timedelta64(int(rng.integers(1, 30_000)), "ms"))
        for j, p in enumerate(cand):
            rows.append((cid, pd.Timestamp(p), f"{cid}#p{j}"))
    return pd.DataFrame(rows, columns=["conv_id", "probe_ts", "probe_id"])
