from .features import turn_features, conv_features, conv_features_from_turns, ROLE_SET
from .training_set import build_training_set, clean_documents, moss_dedup_documents, moss_dedup_incremental

__all__ = [
    "turn_features",
    "conv_features",
    "conv_features_from_turns",
    "ROLE_SET",
    "build_training_set",
    "clean_documents",
    "moss_dedup_documents",
    "moss_dedup_incremental",
]
