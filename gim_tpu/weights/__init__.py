"""Torch checkpoint -> JAX pytree porting with reference key-remap rules."""
