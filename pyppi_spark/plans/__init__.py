from .features import turn_features, conv_features, ROLE_SET

__all__ = ["turn_features", "conv_features", "ROLE_SET"]
