"""gim_dkm: dense Gaussian-process regression matcher (DKMv3)."""

from gim_tpu.models.dkm.model import DKMMatcher, init_params  # noqa: F401
