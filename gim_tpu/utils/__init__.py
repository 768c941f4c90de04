"""Small shared utilities."""

from gim_tpu.utils.precision import highp  # noqa: F401
