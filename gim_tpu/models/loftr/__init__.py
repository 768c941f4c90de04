"""gim_loftr: semi-dense coarse-to-fine matcher (flagship throughput model)."""

from gim_tpu.models.loftr.model import LoFTRMatcher, init_params  # noqa: F401
