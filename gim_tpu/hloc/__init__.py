"""hloc-compatible reconstruction layer.

Mirrors the reference's hloc/ pipeline surface (SURVEY §2.6): exhaustive
pairing, SuperPoint+LightGlue sparse extract/match to h5, dense (DKM)
matching with cell-quantized keypoint aggregation, COLMAP database export
and (when pycolmap is present) incremental mapping.
"""
