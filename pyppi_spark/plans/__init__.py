from .features import turn_features, conv_features, conv_features_from_turns, ROLE_SET

__all__ = ["turn_features", "conv_features", "conv_features_from_turns", "ROLE_SET"]
