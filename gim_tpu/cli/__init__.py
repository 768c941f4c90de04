"""Command-line entry points (demo, zeb eval, analysis, reconstruction)."""
