"""Micro-study: per-pixel table-fetch strategies inside Pallas on TPU.

The round-3 verdict's top item is a fused Pallas deferred-shade kernel;
its feasibility hinges on ONE question: how do we fetch per-pixel rows
(material matrix, cluster table, GGX LUT quads, atlas quad-blocks) from
inside a kernel, given Mosaic has no documented arbitrary per-lane VMEM
gather? This tool measures every candidate on the real chip:

  A. XLA-level gather baseline (what the current frame pays)
  B. in-kernel `jnp.take` (does Mosaic lower it at all, and at what
     rate) with the table VMEM-resident
  C. in-kernel one-hot MXU row fetch (the verdict's suggested fallback)
  D. in-kernel fori_loop of scalar dynamic-slice row reads
  E. fused math throughput reference: ~N VPU ops/pixel in one kernel
     (what the BRDF/cluster math costs once fused)

Timing: SLOPE method — each case is wrapped in one jitted function that
chains the op `reps` times with a data dependency (per-iteration index
perturbation defeats CSE), readback once; cost = (t(hi) - t(lo)) /
(hi - lo). No round-trip subtraction needed, robust to the tunneled
device's enqueue-async behaviour.

Usage: python tools/gather_study.py [A B C D E ...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/trtpu_jit_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M_PAD = 2_097_152  # ~1080p pixel count, 2^21


def slope_time(build, lo=2, hi=10, n=5):
    """build(reps) -> jitted zero-arg fn returning a scalar. Returns s/op."""
    f_lo, f_hi = build(lo), build(hi)
    float(f_lo())  # compile
    float(f_hi())
    t_lo, t_hi = [], []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f_lo())
        t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(f_hi())
        t_hi.append(time.perf_counter() - t0)
    return (min(t_hi) - min(t_lo)) / (hi - lo)


def coherent_indices(n_rows, key=0):
    """uv-driven-ish coherent indices: smooth ramp + small noise."""
    rng = np.random.default_rng(key)
    base = (np.arange(M_PAD, dtype=np.float64) / M_PAD * n_rows).astype(np.int64)
    noise = rng.integers(-8, 8, M_PAD)
    return jnp.asarray(((base + noise) % n_rows).astype(np.int32))


def frame_like_indices(n_rows, key=0):
    """Closer to real frame taps: per-256px-block base + jitter within a
    mip-locality window (neighbouring pixels hit nearby rows, blocks jump)."""
    rng = np.random.default_rng(key)
    n_blocks = M_PAD // 256
    base = rng.integers(0, n_rows, n_blocks)[:, None]
    jit = rng.integers(0, max(n_rows // 64, 16), (n_blocks, 256))
    return jnp.asarray(((base + jit) % n_rows).astype(np.int32).reshape(-1))


def case_xla_gather(n_rows, width=128, dtype=jnp.bfloat16, idx_kind="coherent"):
    table = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_rows, width)), dtype
    )
    mk = coherent_indices if idx_kind == "coherent" else frame_like_indices
    idx = mk(n_rows)

    def build(reps):
        @jax.jit
        def f():
            def body(i, acc):
                rows = table[(idx + i) % n_rows]
                return acc + jnp.sum(rows[:, :1].astype(jnp.float32))

            return jax.lax.fori_loop(0, reps, body, 0.0)

        return f

    dt = slope_time(build)
    print(f"A. XLA gather  rows={n_rows:>7} w={width} {np.dtype(dtype).name} "
          f"{idx_kind:>9}: {dt*1e3:8.2f} ms  ({dt/M_PAD*1e9:.2f} ns/idx)")


def _pallas_block_loop(kernel_per_block, table, idx3, extra_scratch=()):
    """idx3: [NB, 8, 128] int32. Runs kernel over grid NB, out [NB, 8, 128] f32."""
    nb = idx3.shape[0]
    return pl.pallas_call(
        kernel_per_block,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY)
            if table is None else pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx3.shape, jnp.float32),
        scratch_shapes=list(extra_scratch),
    )(table, idx3)


def case_pallas_take(n_rows, width=128, dtype=jnp.bfloat16):
    """Whole table VMEM-resident; 1024 idx per block; jnp.take."""
    table = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_rows, width)), dtype
    )
    idx3 = coherent_indices(n_rows).reshape(-1, 8, 128)

    def kernel(tab_ref, idx_ref, out_ref):
        ids = idx_ref[0].reshape(-1)  # [1024]
        rows = jnp.take(tab_ref[:], ids, axis=0)  # [1024, width]
        out_ref[0] = jnp.sum(rows.astype(jnp.float32), axis=-1).reshape(8, 128)

    def build(reps):
        @jax.jit
        def f():
            def body(i, acc):
                out = _pallas_block_loop(kernel, table, (idx3 + i) % n_rows)
                return acc + out[0, 0, 0]

            return jax.lax.fori_loop(0, reps, body, 0.0)

        return f

    try:
        dt = slope_time(build)
        print(f"B. pallas take  rows={n_rows:>6} w={width}: {dt*1e3:8.2f} ms "
              f"({dt/M_PAD*1e9:.2f} ns/idx)")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"B. pallas take  rows={n_rows:>6}: FAILED {type(e).__name__}: {msg}")


def case_pallas_onehot(n_rows, width=16):
    """One-hot MXU row fetch from a small VMEM-resident f32 table."""
    table = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_rows, width)), jnp.float32
    )
    idx3 = coherent_indices(n_rows).reshape(-1, 8, 128)

    def kernel(tab_ref, idx_ref, out_ref):
        ids = idx_ref[0].reshape(-1, 1)  # [1024, 1]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (1024, n_rows), 1)
        oh = (ids == row_ids).astype(jnp.float32)
        rows = jnp.dot(oh, tab_ref[:], preferred_element_type=jnp.float32)
        out_ref[0] = jnp.sum(rows, axis=-1).reshape(8, 128)

    def build(reps):
        @jax.jit
        def f():
            def body(i, acc):
                out = _pallas_block_loop(kernel, table, (idx3 + i) % n_rows)
                return acc + out[0, 0, 0]

            return jax.lax.fori_loop(0, reps, body, 0.0)

        return f

    try:
        dt = slope_time(build)
        print(f"C. pallas onehot rows={n_rows:>6} w={width}: {dt*1e3:8.2f} ms "
              f"({dt/M_PAD*1e9:.2f} ns/idx)")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"C. pallas onehot rows={n_rows:>6}: FAILED {type(e).__name__}: {msg}")


def case_pallas_scalar_loop(n_rows, width=128, n_idx=16_384):
    """fori_loop of per-row dynamic slices (the naive fallback)."""
    table = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_rows, width)), jnp.float32
    )
    idx3 = coherent_indices(n_rows)[:n_idx].reshape(-1, 8, 128)

    def kernel(tab_ref, idx_ref, out_ref, sref, acc_ref):
        sref[0] = idx_ref[0].reshape(-1)  # spill indices to SMEM? no: SMEM write
        # read indices into SMEM is itself awkward; do dynamic-slice per row
        def body(i, acc):
            r = sref[i]
            return acc + jnp.sum(tab_ref[pl.ds(r, 1), :])

        total = jax.lax.fori_loop(0, 1024, body, 0.0)
        out_ref[0] = jnp.full((8, 128), total, jnp.float32)

    def kernel2(tab_ref, idx_ref, out_ref, acc_ref):
        def body(i, acc):
            r = idx_ref[0].reshape(-1)[i]
            return acc + jnp.sum(tab_ref[pl.ds(r, 1), :])

        total = jax.lax.fori_loop(0, 1024, body, 0.0)
        out_ref[0] = jnp.full((8, 128), total, jnp.float32)

    def build(reps):
        @jax.jit
        def f():
            def body(i, acc):
                out = pl.pallas_call(
                    kernel2,
                    grid=(idx3.shape[0],),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct(idx3.shape, jnp.float32),
                    scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
                )((table + i * 0.0), (idx3 + i) % n_rows)
                return acc + out[0, 0, 0]

            return jax.lax.fori_loop(0, reps, body, 0.0)

        return f

    try:
        dt = slope_time(build)
        per_idx = dt / n_idx
        print(f"D. pallas scalar-loop rows={n_rows:>6}: {dt*1e3:8.2f} ms over "
              f"{n_idx} idx ({per_idx*1e9:.2f} ns/idx -> "
              f"{per_idx*M_PAD*1e3:.1f} ms at 2M)")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"D. pallas scalar-loop: FAILED {type(e).__name__}: {msg}")


def case_fused_math(n_ops=400):
    """Reference: n_ops chained VPU ops per pixel in one kernel, 2M px."""
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((M_PAD // 128, 128)),
        jnp.float32,
    )

    def kernel(x_ref, out_ref):
        v = x_ref[:]
        for _ in range(n_ops // 2):
            v = v * 1.0001 + 0.3
        out_ref[:] = v

    def build(reps):
        @jax.jit
        def f():
            def body(i, acc):
                out = pl.pallas_call(
                    kernel,
                    grid=(x.shape[0] // 512,),
                    in_specs=[pl.BlockSpec((512, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((512, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
                )(x + i * 0.0)
                return acc + out[0, 0]

            return jax.lax.fori_loop(0, reps, body, 0.0)

        return f

    dt = slope_time(build)
    print(f"E. fused math {n_ops} ops/px at 2M px: {dt*1e3:8.2f} ms")


def case_width_sweep():
    """SAME table bytes, different (rows x width) factorings — decides
    whether gather cost is row-count-bound or bytes/locality-bound, i.e.
    whether a select-free narrow-row atlas ([4.2M, 16] instead of
    [524k, 128] + in-register sub-block select) is free or 4x worse.
    Uses frame-like indices; when width shrinks GROUP-fold the index
    space grows GROUP-fold (same texel locality)."""
    for n_rows, width in ((524_288, 128), (2_097_152, 32), (4_194_304, 16),
                          (43_690, 128), (349_520, 16)):
        table = jnp.asarray(
            np.random.default_rng(1).standard_normal((n_rows, width)),
            jnp.bfloat16,
        )
        idx = frame_like_indices(n_rows)

        def build(reps):
            @jax.jit
            def f():
                def body(i, acc):
                    rows = table[(idx + i) % n_rows]
                    return acc + jnp.sum(rows[:, :1].astype(jnp.float32))

                return jax.lax.fori_loop(0, reps, body, 0.0)

            return f

        dt = slope_time(build)
        mb = n_rows * width * 2 / 1e6
        print(f"W. gather rows={n_rows:>8} w={width:>4} ({mb:6.0f} MB): "
              f"{dt*1e3:8.2f} ms ({dt/M_PAD*1e9:.2f} ns/idx)")


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    wanted = set(sys.argv[1:]) or {"A", "B", "C", "D", "E"}

    if "W" in wanted:
        case_width_sweep()

    if "A" in wanted:
        case_xla_gather(6144, 16, jnp.float32)       # cluster-table scale
        case_xla_gather(43_690, 128, jnp.bfloat16)   # dragon atlas scale
        case_xla_gather(43_690, 128, jnp.bfloat16, "frame")
        case_xla_gather(524_292, 128, jnp.bfloat16)  # helmet bundle scale
        case_xla_gather(524_292, 128, jnp.bfloat16, "frame")
    if "B" in wanted:
        case_pallas_take(6144, 16, jnp.float32)
        case_pallas_take(43_690, 128, jnp.bfloat16)
    if "C" in wanted:
        case_pallas_onehot(6144, 16)
        case_pallas_onehot(1024, 16)
        case_pallas_onehot(128, 16)
    if "D" in wanted:
        case_pallas_scalar_loop(43_690)
    if "E" in wanted:
        case_fused_math(400)
        case_fused_math(1600)


if __name__ == "__main__":
    main()

