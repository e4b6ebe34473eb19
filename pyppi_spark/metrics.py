"""Observation helpers for the skip-cap drop accounting.

The capped operators (`minhash_lsh_candidates(hot_bucket="skip")`,
`simhash_pairs_from_hashes`, `winnow_candidate_pairs`) attach
``rows_dropped`` / ``rows_total`` metrics to a caller-supplied
``pyspark.sql.Observation``. Observed metrics are collected from the
FINAL physical plan, so when the capped output ends entirely empty,
AQE's empty-relation propagation can elide the CollectMetrics node —
``Observation.get`` then fails deep in py4j row conversion instead of
returning anything usable. ``observation_metrics`` folds that corner
into a plain ``None`` so production code can write
``m = observation_metrics(obs) or {"rows_dropped": None}`` and report
"metrics elided (output empty — treat as everything capped)" instead of
crashing its ledger step.
"""

from __future__ import annotations

from pyspark.sql import Observation


def observation_metrics(observation: Observation) -> dict | None:
    """``observation.get``, or ``None`` when the observed subtree was
    elided from the final plan (AQE empty-relation propagation — happens
    only when the capped operator's output is entirely empty). Blocks
    until the observed DataFrame's first action completes, exactly like
    ``Observation.get``."""
    try:
        return dict(observation.get)
    except Exception:
        # py4j Py4JJavaError (GenericRow [] fails the toPyRow assertion)
        # or an empty-row KeyError, depending on the Spark version
        return None
