"""Tap-finish kernel (ops/tap_finish.py) vs the XLA sampler oracle.

The finish kernel reproduces sample_bundle_rows (fused=False,
trilinear) op for op: same gather indices, same select semantics, same
f32 convert point, same lerp op order. The only permitted deviation is
FMA contraction — the compiler may fuse `a + b*c` differently across
the two schedules, a 1-ULP (~6e-8) effect — so the pin is 1e-6, three
orders tighter than the existing shade-kernel pin (~1e-5) and six
orders below any select/index bug (which misreads whole texels)."""

import numpy as np
import jax.numpy as jnp
import pytest

from transmission_renderer_tpu.ops.tap_finish import (
    finish_supported,
    sample_bundle_planes,
    sample_bundle_rows_finish,
)
from transmission_renderer_tpu.ops.texture import (
    WRAP_CLAMP,
    WRAP_REPEAT,
    atlas_classes,
    sample_bundle_rows,
)
from transmission_renderer_tpu.scene.textures import AtlasBuilder


def _pool(bundle_layers, sizes, seed=3):
    """Atlas with one bundle per (layers, size) pair -> (texels, meta)."""
    rng = np.random.default_rng(seed)
    ab = AtlasBuilder()
    tids = []
    for layers, (h, w) in zip(bundle_layers, sizes):
        imgs = [
            rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
            for _ in range(layers)
        ]
        tids.append(ab.push_bundle(imgs, [False] * layers))
    texels, meta, _ = ab.finish()
    return tids, jnp.asarray(texels), jnp.asarray(meta)


def _run_case(bundle_layers, sizes, wrap, m=512, seed=11):
    tids, texels, meta = _pool(bundle_layers, sizes)
    classes = atlas_classes(meta)
    rng = np.random.default_rng(seed)
    img_pick = rng.integers(0, len(tids), m)
    rows = meta[jnp.asarray([tids[i] for i in img_pick], jnp.int32)][
        :, : meta.shape[1]
    ]
    # uv beyond [0,1) exercises REPEAT/CLAMP folding; lod spans beyond
    # the mip chain to exercise the level clamp
    uv = jnp.asarray(rng.uniform(-0.6, 1.7, (m, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(-0.5, 9.0, m).astype(np.float32))
    assert finish_supported(texels, m, fused=False, trilinear=True)

    ref = sample_bundle_rows(
        texels, rows, uv, lod, wrap, trilinear=True, classes=classes
    )
    got = sample_bundle_rows_finish(
        texels, rows, uv, lod, wrap, classes=classes, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-6, rtol=1e-6
    )


def test_single_class_repeat():
    _run_case([1, 1], [(16, 16), (8, 32)], WRAP_REPEAT)


def test_single_class_clamp():
    _run_case([1], [(16, 16)], WRAP_CLAMP)


def test_single_class_nonpow2():
    _run_case([1, 1], [(13, 21), (7, 5)], WRAP_REPEAT)


def test_multi_class_bundles():
    _run_case([1, 3, 4], [(16, 16), (16, 16), (8, 8)], WRAP_REPEAT)


def test_multi_class_two():
    _run_case([2, 1], [(32, 16), (16, 16)], WRAP_REPEAT, m=1024)


def test_plane_order_matches_stacked():
    """sample_bundle_planes order is (layer, channel) — the fused shade
    kernel's samples[4*k + c] indexing."""
    tids, texels, meta = _pool([2], [(16, 16)])
    classes = atlas_classes(meta)
    m = 256
    rng = np.random.default_rng(7)
    rows = jnp.broadcast_to(meta[tids[0]], (m, meta.shape[1]))
    uv = jnp.asarray(rng.uniform(0, 1, (m, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(0, 3, m).astype(np.float32))
    chans = sample_bundle_planes(
        texels, rows, uv, lod, WRAP_REPEAT, classes=classes, interpret=True
    )
    ref = sample_bundle_rows(
        texels, rows, uv, lod, WRAP_REPEAT, trilinear=True, classes=classes
    )
    lmax = max(classes)
    assert len(chans) == 4 * lmax
    for layer in range(lmax):
        for c in range(4):
            np.testing.assert_allclose(
                np.asarray(chans[4 * layer + c]),
                np.asarray(ref[:, layer, c]), atol=1e-6, rtol=1e-6,
            )


def test_grid_padding():
    """M not divisible by FINISH_GROUPS*128 exercises the padded tail."""
    _run_case([1], [(16, 16)], WRAP_REPEAT, m=128 * 3)


def test_unsupported_gates():
    tids, texels, meta = _pool([1], [(16, 16)])
    assert not finish_supported(texels, 100, fused=False, trilinear=True)
    assert not finish_supported(texels, 256, fused=True, trilinear=True)
    assert not finish_supported(texels, 256, fused=False, trilinear=False)
    legacy = jnp.zeros((8, 4, 16), jnp.bfloat16)
    assert not finish_supported(legacy, 256, fused=False, trilinear=True)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
