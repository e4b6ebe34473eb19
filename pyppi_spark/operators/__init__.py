from .sessionize import with_session_id, session_bounds
from .lag_lead import with_lag_lead, with_gaps
from .backfill import ffill, bfill
from .asof import asof_join, asof_join_union, asof_join_merge
from .range_join import range_join
from .dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash64,
    ngram_jaccard_pairs,
)

__all__ = [
    "with_session_id",
    "session_bounds",
    "with_lag_lead",
    "with_gaps",
    "ffill",
    "bfill",
    "asof_join",
    "asof_join_union",
    "asof_join_merge",
    "range_join",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash64",
    "ngram_jaccard_pairs",
]
