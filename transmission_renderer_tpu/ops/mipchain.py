"""Opaque-framebuffer mip pyramid + clamp-sampled trilinear LOD fetch.

The reference blits the opaque-sampled HDR framebuffer down a full mip
chain every frame (``generate_mips`` call, src/main.rs:2054-2063) and the
transmission pass samples it at arbitrary UV with an explicit LOD
(``sample_by_lod`` closure, shader/src/lib.rs:135-138). On TPU the chain
is a 2x2-average reduction sequence packed into one flat buffer (so the
per-pixel mip level can be a dynamic gather index), matching the reference
atlas layout in scene/textures.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from transmission_renderer_tpu.scene.textures import mip_levels_for_size


class MipPyramid(NamedTuple):
    texels: jnp.ndarray  # [N, 3] float32 — all levels, flattened row-major
    offsets: jnp.ndarray  # [levels] int32
    widths: jnp.ndarray  # [levels] int32
    heights: jnp.ndarray  # [levels] int32

    @property
    def num_levels(self) -> int:
        return self.offsets.shape[0]


def pyramid_shapes(width: int, height: int) -> list[tuple[int, int]]:
    """(w, h) per level, floor(n/2) per step (Vulkan blit convention)."""
    shapes = [(width, height)]
    for _ in range(mip_levels_for_size(width, height) - 1):
        w, h = shapes[-1]
        shapes.append((max(w // 2, 1), max(h // 2, 1)))
    return shapes


def _downsample2x(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 box downsample of [H, W, 3]; odd trailing row/col dropped
    (floor(n/2) sizing, like the reference's LINEAR blit chain)."""
    h, w = img.shape[:2]
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    if h == 1:
        img2 = img[:, : nw * 2].reshape(1, nw, 2, 3)
        return jnp.mean(img2, axis=2)
    if w == 1:
        img2 = img[: nh * 2].reshape(nh, 2, 1, 3)
        return jnp.mean(img2, axis=1)
    img2 = img[: nh * 2, : nw * 2].reshape(nh, 2, nw, 2, 3)
    return jnp.mean(img2, axis=(1, 3))


def build_pyramid(framebuffer: jnp.ndarray) -> MipPyramid:
    """[H, W, 3] -> full mip pyramid (level 0 included)."""
    h, w = framebuffer.shape[:2]
    shapes = pyramid_shapes(w, h)
    levels = [framebuffer]
    for _ in range(len(shapes) - 1):
        levels.append(_downsample2x(levels[-1]))
    offsets = np.cumsum([0] + [lw * lh for (lw, lh) in shapes[:-1]])
    texels = jnp.concatenate([lvl.reshape(-1, 3) for lvl in levels], axis=0)
    return MipPyramid(
        texels=texels,
        offsets=jnp.asarray(offsets, jnp.int32),
        widths=jnp.asarray([s[0] for s in shapes], jnp.int32),
        heights=jnp.asarray([s[1] for s in shapes], jnp.int32),
    )


def _bilinear_clamp(pyr: MipPyramid, level: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Clamp-to-edge bilinear tap at a (per-pixel dynamic) level."""
    w = pyr.widths[level]
    h = pyr.heights[level]
    off = pyr.offsets[level]
    x = uv[..., 0] * w.astype(jnp.float32) - 0.5
    y = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(xi, yi):
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        return pyr.texels[off + yi * w + xi]

    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def sample_pyramid_lod(pyr: MipPyramid, uv: jnp.ndarray, lod: jnp.ndarray) -> jnp.ndarray:
    """Trilinear clamp sample -> [..., 3]; the framebuffer_sampler closure
    of the transmission shader (shader/src/lib.rs:135-138)."""
    max_level = pyr.num_levels - 1
    lod = jnp.clip(lod, 0.0, float(max_level))
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, max_level)
    c0 = _bilinear_clamp(pyr, l0, uv)
    c1 = _bilinear_clamp(pyr, l1, uv)
    frac = (lod - l0.astype(jnp.float32))[..., None]
    return c0 + (c1 - c0) * frac
