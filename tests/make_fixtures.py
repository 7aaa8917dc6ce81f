"""Synthetic dataset fixtures (no real-data downloads in tests)."""

import os

import numpy as np


def make_sen12tp_tiles(
    path: str, n_tiles: int = 2, size: int = 200, seed: int = 0,
    splits=("train", "val"),
):
    """Synthetic multiband .npz tiles with S1 backscatter + S2 bands."""
    rng = np.random.default_rng(seed)
    for split in splits:
        d = os.path.join(path, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n_tiles):
            bands = {
                "VV_sigma0": rng.uniform(-30, 0, (size, size)).astype(np.float32),
                "VH_sigma0": rng.uniform(-40, 0, (size, size)).astype(np.float32),
                "B02": rng.uniform(0, 1e4, (size, size)).astype(np.float32),
                "B04": rng.uniform(0, 1e4, (size, size)).astype(np.float32),
                "B05": rng.uniform(0, 1e4, (size, size)).astype(np.float32),
                "B08": rng.uniform(0, 1e4, (size, size)).astype(np.float32),
                "B11": rng.uniform(0, 1e4, (size, size)).astype(np.float32),
            }
            np.savez(os.path.join(d, f"tile_{i}.npz"), **bands)
    return path


def make_make3d(path: str, n: int = 4, seed: int = 0, splits=("train",)):
    """Synthetic Make3D layout: images/*.jpg + labels/*.mat."""
    import cv2
    import scipy.io

    rng = np.random.default_rng(seed)
    for split in splits:
        img_dir = os.path.join(path, split, "images")
        lbl_dir = os.path.join(path, split, "labels")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lbl_dir, exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 255, (60, 40, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(img_dir, f"img-{i:03d}.jpg"), img)
            grid = rng.uniform(0, 100, (30, 20, 4)).astype(np.float64)
            scipy.io.savemat(
                os.path.join(lbl_dir, f"depth-{i:03d}.mat"), {"Position3DGrid": grid}
            )
    return path


def make_muad(path: str, n: int = 4, size: int = 32, seed: int = 0, splits=("train",)):
    """Synthetic MUAD layout: leftImg8bit/*.png + leftDepth disparity files.

    Real MUAD ships EXR disparity; cv2 builds often lack EXR write support,
    so the fixture falls back to 16-bit PNG (the loader reads any depth
    format via IMREAD_ANYDEPTH)."""
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    import cv2

    rng = np.random.default_rng(seed)
    for split in splits:
        img_dir = os.path.join(path, split, "leftImg8bit")
        dep_dir = os.path.join(path, split, "leftDepth")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(dep_dir, exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(img_dir, f"{i:05d}_leftImg8bit.png"), img)
            disparity = rng.uniform(0, 1, (size, size)).astype(np.float32)
            exr_path = os.path.join(dep_dir, f"{i:05d}_leftDepth.exr")
            try:
                ok = cv2.imwrite(exr_path, disparity)
            except cv2.error:
                ok = False
            if not ok:
                if os.path.exists(exr_path):
                    os.remove(exr_path)
                cv2.imwrite(
                    os.path.join(dep_dir, f"{i:05d}_leftDepth.png"),
                    (disparity * 65535).astype(np.uint16),
                )
    return path


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
