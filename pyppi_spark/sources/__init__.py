from .fixed_width import read_fixed_width_transcripts, read_manifest, write_debug_csv

__all__ = ["read_fixed_width_transcripts", "read_manifest", "write_debug_csv"]
