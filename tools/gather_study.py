"""Micro-study: per-pixel table-fetch strategies inside Pallas on TPU.

The round-3 verdict's top item is a fused Pallas deferred-shade kernel;
its feasibility hinges on ONE question: how do we fetch per-pixel rows
(material matrix, cluster table, GGX LUT quads, atlas quad-blocks) from
inside a kernel, given Mosaic has no documented arbitrary per-lane VMEM
gather? This tool measures every candidate on the real chip:

  A. XLA-level gather baseline (what the current frame pays)
  B. in-kernel `jnp.take` / `table_ref[idx]` (does Mosaic lower it at all,
     and at what rate) with the table VMEM-resident
  C. in-kernel one-hot MXU row fetch (the verdict's suggested fallback)
  D. in-kernel fori_loop of scalar dynamic-slice row reads
  E. fused math throughput reference: ~N VPU ops/pixel in one kernel
     (what the BRDF/cluster math costs once fused)

Timing: forced tiny readback with the enqueue round-trip subtracted
(same methodology as bench.py — on the tunneled axon platform
block_until_ready returns at enqueue).

Usage: python tools/gather_study.py [case ...]
"""

import functools
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


def measure_round_trip():
    trivial = jax.jit(lambda x: jnp.sum(x))
    small = jnp.ones((8,), jnp.float32)
    float(trivial(small))
    t0 = time.perf_counter()
    for _ in range(20):
        float(trivial(small))
    return (time.perf_counter() - t0) / 20


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a real readback each iteration
    reader = jax.jit(lambda x: jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:4]))
    float(reader(out if not isinstance(out, tuple) else out[0]))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        float(reader(r if not isinstance(r, tuple) else r[0]))
        times.append(time.perf_counter() - t0)
    rt = measure_round_trip()
    return min(times) - rt


M = 2_073_600  # 1080p pixel count
M_PAD = 2_097_152  # 2^21, divisible by 1024


def coherent_indices(n_rows, key=0):
    """uv-driven-ish coherent indices: smooth ramp + small noise."""
    rng = np.random.default_rng(key)
    base = (np.arange(M_PAD, dtype=np.float64) / M_PAD * n_rows).astype(np.int64)
    noise = rng.integers(-8, 8, M_PAD)
    return jnp.asarray(((base + noise) % n_rows).astype(np.int32))


def case_xla_gather(n_rows, width=128, dtype=jnp.bfloat16):
    table = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_rows, width)), dtype
    )
    idx = coherent_indices(n_rows)

    @jax.jit
    def f(table, idx):
        return jnp.sum(table[idx].astype(jnp.float32), axis=-1)

    dt = timeit(f, table, idx)
    print(f"A. XLA gather   rows={n_rows:>7} w={width} {np.dtype(dtype).name}: "
          f"{dt*1e3:8.2f} ms  ({dt/M_PAD*1e9:.2f} ns/idx)")


def case_pallas_take(n_rows, width=128, dtype=jnp.bfloat16, block=2048):
    """Whole table VMEM-resident; per-block [block] indices; jnp.take."""
    table = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_rows, width)), dtype
    )
    idx = coherent_indices(n_rows).reshape(-1, block)

    def kernel(tab_ref, idx_ref, out_ref):
        rows = jnp.take(tab_ref[:], idx_ref[0], axis=0)  # [block, width]
        out_ref[0] = jnp.sum(rows.astype(jnp.float32), axis=-1)

    @jax.jit
    def f(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(idx.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
        )(table, idx)

    try:
        dt = timeit(f, table, idx)
        print(f"B. pallas take  rows={n_rows:>7} w={width} {np.dtype(dtype).name}: "
              f"{dt*1e3:8.2f} ms  ({dt/M_PAD*1e9:.2f} ns/idx)")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:140]
        print(f"B. pallas take  rows={n_rows:>7}: FAILED {type(e).__name__}: {msg}")


def case_pallas_onehot(n_rows, width=16, block=1024):
    """One-hot MXU row fetch from a small VMEM table, per block."""
    table = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_rows, width)), jnp.float32
    )
    idx = coherent_indices(n_rows).reshape(-1, block)

    def kernel(tab_ref, idx_ref, out_ref):
        ids = idx_ref[0]  # [block]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (block, n_rows), 1)
        oh = (ids[:, None] == row_ids).astype(jnp.float32)
        rows = jnp.dot(oh, tab_ref[:], preferred_element_type=jnp.float32)
        out_ref[0] = jnp.sum(rows, axis=-1)

    @jax.jit
    def f(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(idx.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
        )(table, idx)

    try:
        dt = timeit(f, table, idx)
        print(f"C. pallas onehot rows={n_rows:>6} w={width}: "
              f"{dt*1e3:8.2f} ms  ({dt/M_PAD*1e9:.2f} ns/idx)")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:140]
        print(f"C. pallas onehot rows={n_rows:>6}: FAILED {type(e).__name__}: {msg}")


def case_pallas_scalar_loop(n_rows, width=128, block=256):
    """fori_loop of per-row dynamic slices (the naive fallback)."""
    table = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_rows, width)), jnp.float32
    )
    idx = coherent_indices(n_rows).reshape(-1, block)
    n_blocks = min(idx.shape[0], 64)  # cap: extrapolate, this one is slow
    idx = idx[:n_blocks]

    def kernel(tab_ref, idx_ref, out_ref, scratch):
        def body(i, _):
            r = idx_ref[0, i]
            scratch[i, :] = tab_ref[r, :]
            return 0

        jax.lax.fori_loop(0, block, body, 0)
        out_ref[0] = jnp.sum(scratch[:], axis=-1)

    @jax.jit
    def f(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(idx.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (i, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, block), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
            scratch_shapes=[pltpu.VMEM((block, width), jnp.float32)],
        )(table, idx)

    try:
        dt = timeit(f, table, idx)
        per_idx = dt / (n_blocks * block)
        print(f"D. pallas scalar-loop rows={n_rows:>6}: {dt*1e3:8.2f} ms over "
              f"{n_blocks*block} idx ({per_idx*1e9:.2f} ns/idx -> "
              f"{per_idx*M_PAD*1e3:.1f} ms at 2M)")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:140]
        print(f"D. pallas scalar-loop: FAILED {type(e).__name__}: {msg}")


def case_fused_math(n_ops=400, block=1024):
    """Reference: n_ops chained VPU ops per pixel in one kernel."""
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((M_PAD // block, block)),
        jnp.float32,
    )

    def kernel(x_ref, out_ref):
        v = x_ref[:]
        for _ in range(n_ops // 2):
            v = v * 1.0001 + 0.3
        out_ref[:] = v

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            grid=(x.shape[0] // 8,),
            in_specs=[pl.BlockSpec((8, block), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, block), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(x)

    dt = timeit(f, x)
    print(f"E. fused math {n_ops} ops/px at 2M px: {dt*1e3:8.2f} ms")


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    wanted = set(sys.argv[1:]) or {"A", "B", "C", "D", "E"}

    if "A" in wanted:
        case_xla_gather(6144, 16, jnp.float32)   # cluster-table scale
        case_xla_gather(43_690, 128, jnp.bfloat16)  # dragon atlas scale
        case_xla_gather(524_292, 128, jnp.bfloat16)  # helmet bundle scale
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
