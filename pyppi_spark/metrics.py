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
    ``Observation.get``.

    Only the KNOWN elision signatures map to ``None`` — the empty
    ``GenericRow`` tripping py4j row conversion (AssertionError /
    IndexError / ValueError in toPyRow) or a missing-metric KeyError.
    Anything else (wrong metric name upstream, transport failure)
    re-raises: silently mapping every failure to None would make a
    broken metrics pipeline indistinguishable from the documented
    empty-output corner and void the no-silent-caps guarantee."""
    try:
        return dict(observation.get)
    except (AssertionError, IndexError, KeyError, ValueError) as exc:
        # PySparkAssertionError subclasses AssertionError, and its
        # NO_OBSERVE_BEFORE_GET case means the Observation was NEVER
        # attached to a DataFrame — a broken accounting pipeline, not the
        # benign AQE empty-elision corner; mapping it to None would void
        # the no-silent-caps guarantee
        if "NO_OBSERVE_BEFORE_GET" in str(exc):
            raise
        # GenericRow [] fails the toPyRow assertion / empty-row lookup,
        # depending on the Spark version
        return None
    except Exception as exc:  # py4j wraps the JVM-side assertion failure:
        # "calling ...PythonSQLUtils.toPyRow ... java.lang.AssertionError"
        # (the empty GenericRow failing row conversion)
        msg = str(exc)
        if type(exc).__name__ == "Py4JJavaError" and (
            ("toPyRow" in msg and "AssertionError" in msg)
            or "GenericRow" in msg
        ):
            return None
        raise
