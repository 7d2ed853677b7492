"""PNG IO via PIL (tolerates PIL being absent for headless array-only use)."""

from __future__ import annotations

import numpy as np


def save_png(path: str, rgb: np.ndarray) -> None:
    """Save [H, W, 3] uint8 or float [0,1] array as PNG."""
    from PIL import Image

    arr = np.asarray(rgb)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_png(path: str) -> np.ndarray:
    """Load a PNG as [H, W, 4] uint8 (RGB expanded with opaque alpha)."""
    from PIL import Image

    img = Image.open(path)
    if img.mode != "RGBA":
        img = img.convert("RGBA")
    return np.asarray(img, np.uint8)
