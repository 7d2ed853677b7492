"""Utilities: GGX LUT generation, image IO, profiling scopes."""

from transmission_renderer_tpu.utils.ggx_lut import compute_ggx_lut, default_ggx_lut  # noqa: F401
from transmission_renderer_tpu.utils.image_io import save_png, load_png  # noqa: F401
