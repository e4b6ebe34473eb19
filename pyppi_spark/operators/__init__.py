from .sessionize import with_session_id, session_bounds
from .lag_lead import with_lag_lead, with_gaps
from .backfill import ffill, bfill
from .asof import asof_join, asof_join_union, asof_join_merge
from .range_join import range_join
from .dedup import (
    simhash_near_dup_pairs,
    simhash_pairs_from_hashes,
    winnow_candidate_pairs,
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash64,
    ngram_jaccard_pairs,
    near_dedup_representatives,
    near_dup_components,
    star_components,
    winnow_fingerprints,
    winnow_fingerprints_kernel,
)
from .decontaminate import decontaminate, repetition_report
from .align import align_conversations
from .sampling import dataset_split, stratified_sample
from .similarity import brute_force_topk, lsh_topk, ivf_topk, embedding_neardup_pairs, threshold_pairs_exact
from .salted_agg import salted_agg
from .window_extras import (
    with_table_driven_offsets,
    bounded_lookahead,
    with_group_normalized,
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
    "simhash_near_dup_pairs",
    "simhash_pairs_from_hashes",
    "winnow_candidate_pairs",
    "ngram_jaccard_pairs",
    "near_dedup_representatives",
    "near_dup_components",
    "star_components",
    "winnow_fingerprints",
    "winnow_fingerprints_kernel",
    "decontaminate",
    "repetition_report",
    "brute_force_topk",
    "lsh_topk",
    "ivf_topk",
    "embedding_neardup_pairs",
    "threshold_pairs_exact",
    "align_conversations",
    "dataset_split",
    "stratified_sample",
    "salted_agg",
    "with_table_driven_offsets",
    "bounded_lookahead",
    "with_group_normalized",
]
