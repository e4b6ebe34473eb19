"""Single-node pandas/numpy oracle — the reference implementation every
Spark plan is checked against (``SURVEY.md`` §5.3: the reference ships no
tests, so we create the oracle).

Deliberately written in plain pandas group-at-a-time style — an independent
code path from the Spark plans (different sort, different cumsum, different
percentile source) so agreement is evidence, not tautology.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLE_SET = ["user", "assistant", "system", "tool"]
DEFAULT_GAP_S = 1800.0


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(drop=True)


def oracle_turn_features(pdf: pd.DataFrame, gap_s: float = DEFAULT_GAP_S) -> pd.DataFrame:
    df = _sorted(pdf).copy()
    g = df.groupby("conv_id", sort=False)
    # Spark timestamps are microsecond-precision; `cast(ts as double)` is
    # us/1e6 — reproduce exactly (int64-ns → float64 directly would be lossy
    # above 2^53 ns)
    ts_s = (df["ts"].astype("int64") // 1000).astype("float64") / 1e6
    df["_ts_s"] = ts_s
    df["gap_prev_s"] = g["_ts_s"].diff()
    df["gap_next_s"] = -g["_ts_s"].diff(-1)
    df["prev_role"] = g["role"].shift(1)
    df["next_role"] = g["role"].shift(-1)
    new_sess = df["gap_prev_s"].isna() | (df["gap_prev_s"] > gap_s)
    df["session_id"] = new_sess.groupby(df["conv_id"], sort=False).cumsum().astype("int64") - 1
    df["turn_in_session"] = (
        df.groupby(["conv_id", "session_id"], sort=False).cumcount().astype("int64") + 1
    )
    df["tool_ffill"] = g["tool"].ffill()
    df["prev_role"] = df["prev_role"].where(df["prev_role"].notna(), None)
    df["next_role"] = df["next_role"].where(df["next_role"].notna(), None)
    return df[
        [
            "conv_id", "turn_idx", "ts", "session_id", "prev_role", "next_role",
            "gap_prev_s", "gap_next_s", "tool_ffill", "turn_in_session", "text",
            "role", "tool",
        ]
    ]


def oracle_conv_features(pdf: pd.DataFrame, gap_s: float = DEFAULT_GAP_S) -> pd.DataFrame:
    tf = oracle_turn_features(pdf, gap_s)
    rows = []
    for cid, g in tf.groupby("conv_id", sort=True):
        rec: dict = {"conv_id": cid, "n_turns": len(g)}
        rec["n_sessions"] = int(g["session_id"].max()) + 1
        for r in ROLE_SET:
            rec[f"n_{r}"] = int((g["role"] == r).sum())
        for a in ROLE_SET:
            for b in ROLE_SET:
                rec[f"t_{a}__{b}"] = int(((g["prev_role"] == a) & (g["role"] == b)).sum())
        gaps = g["gap_prev_s"].dropna().to_numpy()
        rec["latency_mean_s"] = float(gaps.mean()) if len(gaps) else None
        rec["latency_max_s"] = float(gaps.max()) if len(gaps) else None
        # linear-interpolation percentile == Spark SQL percentile()
        rec["latency_p95_s"] = float(np.percentile(gaps, 95)) if len(gaps) else None
        rec["first_ts"] = g["ts"].min()
        rec["last_ts"] = g["ts"].max()
        rec["session_len_max"] = int(g["turn_in_session"].max())
        rec["n_distinct_tools"] = int(g["tool"].dropna().nunique())
        nn = g["tool"].dropna().tolist()
        rec["n_tool_transitions"] = max(len(nn) - 1, 0)
        rec["n_distinct_tool_pairs"] = len(set(zip(nn[:-1], nn[1:])))
        rec["session_len_mean"] = float(
            g.groupby("session_id").size().mean()
        )
        rows.append(rec)
    return pd.DataFrame(rows)


def oracle_pit_features(
    probes: pd.DataFrame,
    transcripts: pd.DataFrame,
    gap_s: float = DEFAULT_GAP_S,
) -> pd.DataFrame:
    """Recompute-from-prefix oracle for PIT features: for each probe, slice
    the conversation to ``ts <= probe_ts`` and compute every feature from
    scratch on the prefix — an independent formulation of the engine's
    incremental cumulative-window state (leakage-free by construction)."""
    t = _sorted(transcripts)
    t["_ts_s"] = (t["ts"].astype("int64") // 1000).astype("float64") / 1e6
    groups = {k: v for k, v in t.groupby("conv_id", sort=False)}
    rows = []
    for _, p in probes.iterrows():
        rec = dict(p)
        g = groups.get(p["conv_id"])
        prefix = None
        if g is not None:
            prefix = g[g["ts"] <= p["probe_ts"]]
        if prefix is None or prefix.empty:
            rec.update(
                {
                    "ts": None,
                    "n_turns_so_far": None,
                    "n_sessions_so_far": None,
                    "gap_mean_so_far_s": None,
                    "gap_max_so_far_s": None,
                    "last_role": None,
                    "last_tool": None,
                    "time_since_last_turn_s": None,
                }
            )
        else:
            gaps = prefix["_ts_s"].diff().dropna()
            # mean via exact int64 µs, ÷1e6 once at the end — mirrors the
            # engine's associativity-free accumulation (plans/pit.py)
            gaps_us = (prefix["ts"].astype("int64") // 1000).diff().dropna()
            rec["ts"] = prefix["ts"].iloc[-1]
            rec["n_turns_so_far"] = len(prefix)
            rec["n_sessions_so_far"] = int((gaps > gap_s).sum()) + 1
            rec["gap_mean_so_far_s"] = (
                float(int(gaps_us.sum()) / 1e6 / len(gaps_us)) if len(gaps_us) else None
            )
            rec["gap_max_so_far_s"] = (
                float(int(gaps_us.max()) / 1e6) if len(gaps_us) else None
            )
            rec["last_role"] = prefix["role"].iloc[-1]
            tools = prefix["tool"].dropna()
            rec["last_tool"] = tools.iloc[-1] if len(tools) else None
            p_s = (pd.Timestamp(p["probe_ts"]).value // 1000) / 1e6
            rec["time_since_last_turn_s"] = p_s - prefix["_ts_s"].iloc[-1]
        rows.append(rec)
    return pd.DataFrame(rows)


def oracle_asof(
    probes: pd.DataFrame,
    build: pd.DataFrame,
    payload: list[str],
    inclusive: bool = True,
    prefix: str = "matched_",
    direction: str = "backward",
    tolerance: float | None = None,
) -> pd.DataFrame:
    """Brute-force as-of: for each probe row scan all build rows of the conv —
    O(n·m), deliberately naive (no merge_asof: that is what the engine's
    cross-check path uses). ``direction`` mirrors the engine's pinned
    semantics (backward: last at-or-before with max turn_idx on ties;
    forward: first at-or-after with min turn_idx; nearest: smaller |Δt|,
    equal → backward). ``tolerance`` (seconds) nulls matches with
    |Δt| > tolerance."""
    out_rows = []
    bg = {k: v.sort_values(["ts", "turn_idx"], kind="mergesort") for k, v in build.groupby("conv_id")}
    for _, p in probes.iterrows():
        g = bg.get(p["conv_id"])
        rec = dict(p)
        match = None
        if g is not None:
            back = g[g["ts"] <= p["probe_ts"]] if inclusive else g[g["ts"] < p["probe_ts"]]
            fwd = g[g["ts"] >= p["probe_ts"]] if inclusive else g[g["ts"] > p["probe_ts"]]
            mb = back.iloc[-1] if len(back) else None
            mf = fwd.iloc[0] if len(fwd) else None
            if direction == "backward":
                match = mb
            elif direction == "forward":
                match = mf
            elif direction == "nearest":
                if mb is None:
                    match = mf
                elif mf is None:
                    match = mb
                else:
                    gap_b = p["probe_ts"] - mb["ts"]
                    gap_f = mf["ts"] - p["probe_ts"]
                    match = mf if gap_f < gap_b else mb
            else:
                raise ValueError(f"unknown direction {direction!r}")
            if match is not None and tolerance is not None:
                gap = abs(match["ts"] - p["probe_ts"])
                bound = (
                    pd.Timedelta(seconds=tolerance)
                    if isinstance(gap, pd.Timedelta)
                    else tolerance
                )
                if gap > bound:
                    match = None
        for c in payload:
            rec[f"{prefix}{c}"] = match[c] if match is not None else None
        out_rows.append(rec)
    return pd.DataFrame(out_rows)
