"""Core device ops: image preprocessing, sampling, attention, matching kernels."""
