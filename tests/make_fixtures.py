"""Synthetic dataset fixtures (no real-data downloads in tests)."""

import os

import numpy as np


def make_nyuv2_h5(path: str, n: int = 16, h: int = 32, w: int = 32, seed: int = 0):
    """Write a tiny synthetic depth_{train,test}.h5 pair with the reference
    schema (keys 'image' [N,H,W,3] uint8, 'depth' [N,H,W,1] uint8)."""
    import h5py

    rng = np.random.default_rng(seed)
    os.makedirs(path, exist_ok=True)
    for split, count in (("train", n), ("test", max(n // 2, 2))):
        with h5py.File(os.path.join(path, f"depth_{split}.h5"), "w") as f:
            img = rng.integers(0, 255, (count, h, w, 3), dtype=np.uint8)
            # depth correlated with image so there is signal to learn
            depth = img.mean(axis=-1, keepdims=True).astype(np.uint8)
            f.create_dataset("image", data=img)
            f.create_dataset("depth", data=depth)
    return path
