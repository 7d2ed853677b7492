"""Texture atlas: the TPU replacement for bindless sampled images.

The reference binds up to 193 images as a partially-bound descriptor array
(src/main.rs:59, src/descriptor_sets.rs:30-80) and lets sampler hardware do
bilinear/trilinear filtering, wrap modes, and sRGB decode. TPUs have no
sampler hardware (SURVEY.md §2.5), so:

  * all images (and their full mip chains, generated here at load time the
    way ``generate_mips``'s LINEAR blit chain does — 2x2 box) are packed
    into ONE flat uint32 texel pool (packed RGBA8),
  * a small int32 metadata table holds per-image mip offsets/sizes,
  * sampling is gather-based (ops/texture.py) with explicit sRGB decode
    matching Vulkan's R8G8B8A8_SRGB behaviour (src/model_loading.rs:348-352).
"""

from __future__ import annotations

import numpy as np

# Metadata layout per image row:
#   [0] num_mips, [1] srgb flag, then per mip m < MAX_MIPS: (offset, width, height)
MAX_MIPS = 13  # up to 4096x4096
META_COLS = 2 + 3 * MAX_MIPS


def mip_levels_for_size(width: int, height: int) -> int:
    """floor(log2(max(w,h))) + 1 (src/main.rs:2590-2592)."""
    return int(np.floor(np.log2(max(width, height)))) + 1


def _box_downsample(img: np.ndarray) -> np.ndarray:
    """2x2 average in linear space of the stored encoding.

    Vulkan's LINEAR blit averages raw (encoded) texel values; we match that
    (byte-space averaging) for fidelity with the reference's mip chains.
    Odd dimensions follow the blit's floor(n/2) convention.
    """
    h, w = img.shape[:2]
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    img = img[: nh * 2, : nw * 2].astype(np.float32)
    if h == 1:
        pooled = (img[:, 0::2] + img[:, 1::2]) / 2.0
    elif w == 1:
        pooled = (img[0::2] + img[1::2]) / 2.0
    else:
        pooled = (
            img[0::2, 0::2] + img[0::2, 1::2] + img[1::2, 0::2] + img[1::2, 1::2]
        ) / 4.0
    return np.round(pooled).astype(np.uint8)


def _pack_rgba8(img: np.ndarray) -> np.ndarray:
    """[H, W, 4] uint8 -> [H*W] uint32 (r | g<<8 | b<<16 | a<<24)."""
    img = img.astype(np.uint32)
    return (
        img[..., 0] | (img[..., 1] << 8) | (img[..., 2] << 16) | (img[..., 3] << 24)
    ).reshape(-1)


class AtlasBuilder:
    """Accumulates images; ``finish()`` yields (texels, meta, srgb) arrays.

    Plays the role of ``ImageManager`` (src/model_loading.rs:392-436): push
    an image, get back a stable integer id.
    """

    def __init__(self):
        self._chunks: list[np.ndarray] = []
        self._meta: list[np.ndarray] = []
        self._srgb: list[bool] = []
        self._offset = 0

    def push_image(self, rgba: np.ndarray, srgb: bool, generate_mips: bool = True) -> int:
        """Add an RGBA8 image (+ its mip chain); returns its texture id."""
        assert rgba.dtype == np.uint8 and rgba.ndim == 3 and rgba.shape[2] == 4, rgba.shape
        image_id = len(self._meta)
        levels = mip_levels_for_size(rgba.shape[1], rgba.shape[0]) if generate_mips else 1
        levels = min(levels, MAX_MIPS)
        row = np.zeros(META_COLS, np.int32)
        row[0] = levels
        row[1] = int(srgb)
        level_img = rgba
        for m in range(levels):
            h, w = level_img.shape[:2]
            row[2 + 3 * m + 0] = self._offset
            row[2 + 3 * m + 1] = w
            row[2 + 3 * m + 2] = h
            packed = _pack_rgba8(level_img)
            self._chunks.append(packed)
            self._offset += packed.size
            if m + 1 < levels:
                level_img = _box_downsample(level_img)
        # Unused mip slots alias the last level so out-of-range LOD clamps
        # are just index clamps.
        for m in range(levels, MAX_MIPS):
            row[2 + 3 * m :][:3] = row[2 + 3 * (levels - 1) :][:3]
        self._meta.append(row)
        self._srgb.append(srgb)
        return image_id

    @property
    def num_images(self) -> int:
        return len(self._meta)

    def finish(self):
        if not self._meta:
            # 1x1 white dummy so the pools are never empty.
            self.push_image(np.full((1, 1, 4), 255, np.uint8), srgb=False)
        texels = np.concatenate(self._chunks)
        meta = np.stack(self._meta)
        srgb = np.array(self._srgb, bool)
        return texels, meta, srgb


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    """Exact sRGB EOTF (what R8G8B8A8_SRGB sampling applies)."""
    c = np.asarray(c, np.float32)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c, np.float32)
    return np.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)
