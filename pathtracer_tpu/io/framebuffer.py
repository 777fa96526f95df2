"""Framebuffer output: accumulate → tonemap → PNG/npy, plus resume files.

The reference blits its CUDA accumulation buffer to the screen through a
GL pixel-buffer object every frame (SURVEY.md §2.1 R7/R10). Headless TPU
rendering replaces that with explicit dumps ("Qt/OpenGL display → jnp
framebuffer dump", BASELINE.json:5): linear-radiance images are written as
.npy, display images as gamma-encoded PNG, and long renders checkpoint the
(accumulated radiance, sample count) pair so they can resume exactly
(SURVEY.md §5.4 — deterministic threefry makes resumed samples identical).
"""

from __future__ import annotations

import json
import os

import numpy as np


def tonemap(img: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    """Linear radiance → uint8 sRGB-ish display image (clamp + gamma)."""
    img = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    img = img ** (1.0 / gamma)
    return (img * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray, gamma: float = 2.2) -> None:
    """Write a linear-radiance (H, W, 3) image as PNG."""
    from PIL import Image

    Image.fromarray(tonemap(img, gamma)).save(path)


def write_npy(path: str, img: np.ndarray) -> None:
    np.save(path, np.asarray(img, np.float32))


def save_accumulator(
    path: str, accum: np.ndarray, spp_done: int, meta: dict | None = None
) -> None:
    """Checkpoint a partially accumulated render (resumable)."""
    np.savez(
        path,
        accum=np.asarray(accum, np.float32),
        spp_done=np.int64(spp_done),
        meta=json.dumps(meta or {}),
    )


def load_accumulator(path: str):
    """Returns (accum, spp_done, meta) from save_accumulator output."""
    z = np.load(path, allow_pickle=False)
    return z["accum"], int(z["spp_done"]), json.loads(str(z["meta"]))
