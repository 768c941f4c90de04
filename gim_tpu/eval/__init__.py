"""ZEB evaluation harness: batched matching + on-chip pose + dump files."""
