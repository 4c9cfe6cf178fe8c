"""Tiny synthetic image renderer for front-end testing.

Projects a landmark cloud into the camera and splats Gaussian blobs of fixed
per-landmark intensity — enough texture for KLT/FAST/BRIEF to operate on,
with exactly known geometry (the role EuRoC rosbag replay plays for the
reference, SURVEY.md §4.1, but with analytic ground truth).
"""

from __future__ import annotations

import numpy as np

__all__ = ["render_blobs"]


def render_blobs(cam, landmarks: np.ndarray, intensities: np.ndarray,
                 r_wb: np.ndarray, p_wb: np.ndarray,
                 r_cb: np.ndarray, p_bc: np.ndarray,
                 sigma: float = 1.5, background: float = 20.0) -> np.ndarray:
    """Render (H, W) float image for body pose (r_wb, p_wb)."""
    h, w = cam.height, cam.width
    img = np.full((h, w), background, np.float32)
    # gentle background gradient so KLT has some signal everywhere
    img += np.linspace(0, 10, w)[None, :]
    pts_b = (landmarks - p_wb) @ r_wb  # world -> body
    pts_c = (pts_b - p_bc) @ r_cb.T
    z = pts_c[:, 2]
    ok = z > 0.2
    import jax.numpy as jnp
    px = np.asarray(cam.project(jnp.asarray(pts_c[ok], jnp.float32)))
    rad = int(3 * sigma)
    ys, xs = np.mgrid[-rad:rad + 1, -rad:rad + 1]
    kernel = np.exp(-0.5 * (xs ** 2 + ys ** 2) / sigma ** 2)
    for (u, v), inten in zip(px, intensities[ok]):
        ui, vi = int(round(u)), int(round(v))
        if not (rad <= ui < w - rad and rad <= vi < h - rad):
            continue
        img[vi - rad:vi + rad + 1, ui - rad:ui + rad + 1] += inten * kernel
    return np.clip(img, 0, 255)
