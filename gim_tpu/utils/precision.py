"""Matmul precision control.

TPU matmuls on float32 inputs default to bfloat16 passes. That is the right
trade for neural-net layers but catastrophically wrong for geometry (DLT
nullspaces, Sampson residuals, pose decomposition). `@highp` forces full
float32 MXU precision for everything traced inside the function.
"""

from __future__ import annotations

import functools

import jax


def highp(fn):
    """Decorator: trace `fn` under highest matmul precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
