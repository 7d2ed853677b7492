"""Quantify the self-baked GGX split-sum LUT against the reference asset.

The renderer prefers the reference's own ggx_lut.png (exact parity); this
tool documents how close the fallback bake is when the asset is absent.

Usage: python tools/ggx_lut_compare.py [path/to/ggx_lut.png]
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from transmission_renderer_tpu.utils.ggx_lut import (  # noqa: E402
    compute_ggx_lut,
    load_ggx_lut_png,
)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/ggx_lut.png"
    ref = load_ggx_lut_png(path)
    size = 128
    bake = compute_ggx_lut(size)[::-1]  # asset orientation (see ggx_lut.py)
    s = ref.shape[0] // size
    ref_ds = ref.reshape(size, s, size, s, 2).mean((1, 3))
    d = np.abs(ref_ds - bake)
    print(f"reference: {path} {ref.shape}")
    print(f"bake vs reference (asset orientation, {size}^2 grid):")
    print(f"  |d| mean {d.mean():.5f}  max {d.max():.5f}")
    print(f"  scale channel: mean {d[...,0].mean():.5f}  max {d[...,0].max():.5f}")
    print(f"  bias  channel: mean {d[...,1].mean():.5f}  max {d[...,1].max():.5f}")
    flipped = np.abs(ref_ds[::-1] - bake)
    print(f"  (sanity: textbook orientation would differ by mean "
          f"{flipped.mean():.5f} — the asset's roughness axis is inverted)")


if __name__ == "__main__":
    main()
