"""Exact corpus heavy hitters (frequent tokens) with bounded memory —
the boilerplate/stopword discovery pass of a training-data pipeline:
"which tokens exceed X parts-per-million of all token occurrences".

The naive plan (explode → groupBy token) shuffles the ENTIRE token
stream onto an unbounded vocabulary key — at 100 TB that is the biggest
shuffle in the pipeline for a report that only wants the top of the
distribution.  This operator uses the classic two-pass frequent-items
scheme (Misra-Gries flavored candidate prune + exact verify):

pass 1 (map-side only, no shuffle of occurrences): per Arrow batch,
``value_counts`` keeps tokens with ``count·10^6 ≥ min_ppm·batch_len`` —
an averaging argument makes the union across batches a SUPERSET of every
global heavy hitter (if a token's count were below the ppm line in every
batch, summing gives count below the line globally), and per batch at
most ``10^6/min_ppm`` candidates survive, so WORKER memory is bounded by
construction.  The cross-batch UNION is not intrinsically bounded — a
heterogeneous corpus (per-language/per-domain shards, each with its own
locally-frequent tokens) can push it far past the per-batch bound — so
the candidate count is checked while the candidate relation is collected
for broadcast (before it ships to executors) and the operator FAILS with
a remedy (raise ``min_ppm`` or ``max_candidates``) instead of silently
shipping an over-threshold broadcast; same no-silent-caps policy as the
LSH ``hot_bucket='error'`` mode.  The same pass emits one
total-row per batch, so the corpus token total needs no extra scan.

pass 2: one more scan joins occurrences against the BROADCAST candidate
set and counts exactly — the only aggregation key left is the (tiny)
candidate vocabulary, map-side partials collapse it, and the final
``count·10^6 ≥ min_ppm·total`` filter is pure int64, mirrored verbatim
by the SQL oracle (which runs the naive full group-by — the two must
agree exactly, which is the point: this is an EXACT operator with a
bounded-memory plan, not a sketch).

Reference analog: the corpus-frequency tables the reference builds once
and reuses (``/root/reference/pyPPI/surfaceComplementarity/
interfaceDepth.py``) — here built without the full-vocabulary
shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from pyppi_spark.operators.quality_lm import _norm_tokens

PPM = 1_000_000


def frequent_tokens(
    docs: DataFrame,
    min_ppm: int,
    text_col: str = "text",
    max_candidates: int = 1_000_000,
) -> DataFrame:
    """All tokens whose corpus occurrence share is at least
    ``min_ppm`` parts per million, with EXACT counts: ``(tok, cnt)``.

    ``min_ppm`` bounds pass-1 memory at ``10^6/min_ppm`` candidates per
    batch — 500 ppm ⇒ ≤ 2000 survivors per batch regardless of corpus
    size.  Exactness is two-sided: the prune is a guaranteed superset
    (averaging argument above) and the verify pass recounts candidates
    exactly, so output equals the naive full group-by's HAVING filter."""
    if not (isinstance(min_ppm, int) and 0 < min_ppm <= PPM):
        raise ValueError(f"min_ppm must be an int in (0, {PPM}], got {min_ppm!r}")
    toks = docs.select(F.explode(_norm_tokens(text_col)).alias("tok"))

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = len(b)
            if n == 0:
                continue
            vc = b["tok"].value_counts()
            cand = vc[vc * PPM >= min_ppm * n]
            yield pd.DataFrame(
                {
                    "tok": list(cand.index) + [None],
                    "batch_total": [0] * len(cand) + [n],
                }
            )

    # lazy: materializes once on first action, reused by totals +
    # candidates + the cap check (eager would run the corpus scan at
    # DataFrame-construction time, e.g. under a plan-only explain)
    p1 = toks.mapInPandas(prune, "tok string, batch_total long").localCheckpoint(
        eager=False
    )
    total_df = p1.agg(F.sum("batch_total").cast("long").alias("_total"))
    cands = p1.where(F.col("tok").isNotNull()).select("tok").distinct()
    # candidate-volume guard, folded INTO the broadcast side: the
    # raise_error fires while the candidate relation is being collected
    # for broadcast — i.e. before it ships to executors — and building
    # the plan stays action-free (an up-front .count() would run the
    # whole pass-1 scan at DataFrame-construction time, e.g. under a
    # plan-only explain)
    ccnt = cands.agg(F.count(F.lit(1)).alias("_nc"))
    guarded = cands.crossJoin(F.broadcast(ccnt)).select(
        F.coalesce(
            F.when(F.col("_nc") <= F.lit(max_candidates), F.col("tok")),
            F.raise_error(
                F.concat(
                    F.lit("frequent_tokens: "), F.col("_nc").cast("string"),
                    F.lit(
                        f" candidates exceed max_candidates={max_candidates}"
                        " — the corpus is too heterogeneous for this"
                        " min_ppm's per-batch prune; raise min_ppm (or"
                        " max_candidates if the broadcast can take it)"
                    ),
                )
            ),
        ).alias("tok")
    )
    exact = (
        toks.join(F.broadcast(guarded), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total_df))
        .where(F.col("cnt") * F.lit(PPM) >= F.lit(min_ppm) * F.col("_total"))
        .select("tok", "cnt")
    )
