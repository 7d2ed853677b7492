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


def test_transmission_fetch_matches_xla_samplers():
    """transmission_fetch_planes vs sample_pyramid_lod (dynamic
    level-set path) + sample_lut_2ch_quad on a real pyramid: same
    gathers, same select/lerp ops -> 1e-6 pin (FMA contraction only)."""
    import jax

    from transmission_renderer_tpu.ops.mipchain import (
        build_pyramid,
        pyramid_fetch_parts,
        sample_pyramid_lod,
    )
    from transmission_renderer_tpu.ops.tap_finish import (
        transmission_fetch_planes,
    )
    from transmission_renderer_tpu.ops.texture import (
        lut_2ch_fetch_parts,
        quad_lut_2ch,
        sample_lut_2ch_quad,
    )

    rng = np.random.default_rng(4)
    h, w, m = 96, 160, 640
    img = jnp.asarray(rng.uniform(0.0, 4.0, (h, w, 3)).astype(np.float32))
    level_set = (1, 2, 3, 4, 5)
    pyr = build_pyramid(
        tuple(img[..., c] for c in range(3)), level_set=level_set
    )
    lut = jnp.asarray(rng.uniform(0.0, 1.0, (32, 32, 2)).astype(np.float32))
    lut_quads = quad_lut_2ch(lut)

    uv = jnp.asarray(rng.uniform(-0.1, 1.1, (m, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(0.0, 6.5, m).astype(np.float32))
    nov = jnp.asarray(rng.uniform(0.0, 1.0, m).astype(np.float32))
    rough = jnp.asarray(rng.uniform(0.0, 1.0, m).astype(np.float32))

    # wide set -> 2 dynamic bracketing taps; 2-level set -> per-level
    # static taps (the flagship's (2, 3) shape); both must pin
    for ls in (level_set, (2, 3)):
        lod_c = jnp.clip(lod, float(min(ls)), float(max(ls)))
        ref_t = sample_pyramid_lod(pyr, uv, lod_c, level_set=ls)
        ref_b = sample_lut_2ch_quad(lut_quads, 32, nov, rough)

        parts = pyramid_fetch_parts(pyr, uv, lod_c, ls)
        assert parts is not None
        lrows, lsub, lfx, lfy = lut_2ch_fetch_parts(
            lut_quads, 32, nov, rough
        )
        outs = jax.jit(
            lambda pp, lr, ls2, lx, ly: transmission_fetch_planes(
                pp, lr, ls2, lx, ly, interpret=True
            )
        )(parts, lrows, lsub, lfx, lfy)
        got_t = jnp.stack(outs[:3], axis=-1)
        got_b = jnp.stack(outs[3:], axis=-1)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                                   atol=1e-6)


def test_transmission_fetch_parts_gate():
    """ROW-form levels / small sets / no set must return None (the XLA
    path owns those)."""
    from transmission_renderer_tpu.ops.mipchain import (
        build_pyramid,
        pyramid_fetch_parts,
    )

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0.0, 1.0, (64, 64, 3)).astype(np.float32))
    uv = jnp.zeros((128, 2), jnp.float32)
    lod = jnp.zeros((128,), jnp.float32)
    pyr = build_pyramid(tuple(img[..., c] for c in range(3)),
                        level_set=(0, 1, 2, 3))
    assert pyramid_fetch_parts(pyr, uv, lod, None) is None
    assert len(pyramid_fetch_parts(pyr, uv, lod, (1, 2))) == 2
    if pyr.level_rows and any(r is not None for r in pyr.level_rows[:4]):
        assert pyramid_fetch_parts(pyr, uv, lod, (0, 1, 2, 3)) is None
