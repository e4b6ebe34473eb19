from .text import (
    token_count,
    char_stats,
    quality_score,
    lang_id,
    doc_fingerprint,
    pii_stats,
    repetition_stats,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "token_count",
    "char_stats",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "pii_stats",
    "repetition_stats",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
