"""gim_roma: DINOv2-coarse + VGG19-fine dense matcher."""

from gim_tpu.models.roma.model import RoMaMatcher, init_params  # noqa: F401
