"""Pyramidal Lucas-Kanade optical-flow tracking, batched over points.

The agent front-end contract (VINS-style feature tracker implied by
`/root/reference/config/euroc/euroc_config.yaml:44-63`) tracks features
between frames with `cv::calcOpticalFlowPyrLK`. Here the whole feature set is
tracked in one fused computation: every LK iteration samples all N patches
with one gather, solves all N 2×2 systems with closed-form inverses, and
updates all positions — no per-feature loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .image import bilinear_sample, build_pyramid

__all__ = ["track_points", "TrackResult"]


class TrackResult(NamedTuple):
    xy: jax.Array        # (N, 2) tracked positions in the new image
    valid: jax.Array     # (N,) bool
    residual: jax.Array  # (N,) mean abs photometric error at convergence


def _patch_coords(radius: int):
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (P, 2) as (x, y)


def track_points(img0: jax.Array, img1: jax.Array, xy0: jax.Array,
                 valid0: jax.Array | None = None,
                 radius: int = 10, levels: int = 3, iters: int = 10,
                 max_residual: float = 25.0,
                 min_eig: float = 1e-3,
                 init_xy: jax.Array | None = None,
                 fb_thresh: float | None = None) -> TrackResult:
    """Track (N, 2) points from img0 to img1.

    Window (2*radius+1)², `levels` pyramid levels, `iters` GN iterations per
    level (matches OpenCV's 21×21 / 3-level defaults the reference relies on).
    `init_xy` (N, 2) optionally seeds the search at predicted positions (the
    VINS front-end's IMU-predicted-flow trick) — essential when inter-frame
    motion exceeds the pyramid's capture range.
    `fb_thresh` enables a forward-backward consistency check: the tracked
    point is re-tracked img1→img0 and must land within `fb_thresh` px of its
    start (photometric residual alone cannot reject a lock onto the wrong
    patch of self-similar texture).

    The whole forward(+backward) computation runs as ONE jitted program
    (keyed on shapes + the static knobs): run eagerly, the per-call
    re-trace of the fori_loop bodies cost ~3.3 s/call on a CPU host vs
    ~0.1 s jitted — the difference between camera-rate tracking being
    usable and not.
    """
    if valid0 is None:
        valid0 = jnp.ones(xy0.shape[0], dtype=bool)
    if init_xy is None:
        init_xy = xy0
    return _track_points_jit(img0, img1, xy0, valid0, init_xy,
                             float(max_residual), float(min_eig),
                             0.0 if fb_thresh is None else float(fb_thresh),
                             radius, levels, iters, fb_thresh is not None)


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit,
          static_argnames=("radius", "levels", "iters", "use_fb"))
def _track_points_jit(img0, img1, xy0, valid0, init_xy, max_residual,
                      min_eig, fb_thresh, radius, levels, iters, use_fb):
    res = _track_points(img0, img1, xy0, valid0, radius, levels, iters,
                        max_residual, min_eig, init_xy)
    if not use_fb:
        return res
    back = _track_points(img1, img0, res.xy, res.valid, radius, levels,
                         iters, max_residual, min_eig, xy0)
    dist = jnp.linalg.norm(back.xy - xy0, axis=-1)
    ok = res.valid & back.valid & (dist < fb_thresh)
    return TrackResult(res.xy, ok, res.residual)


def _track_points(img0: jax.Array, img1: jax.Array, xy0: jax.Array,
                  valid0: jax.Array | None = None,
                  radius: int = 10, levels: int = 3, iters: int = 10,
                  max_residual: float = 25.0,
                  min_eig: float = 1e-3,
                  init_xy: jax.Array | None = None) -> TrackResult:
    if valid0 is None:
        valid0 = jnp.ones(xy0.shape[0], dtype=bool)
    pyr0 = build_pyramid(img0, levels)
    pyr1 = build_pyramid(img1, levels)
    offs = _patch_coords(radius)  # (P, 2)

    # displacement in full-res coords, seeded by the prediction if given
    flow = (init_xy - xy0) if init_xy is not None else jnp.zeros_like(xy0)

    residual = jnp.zeros(xy0.shape[0], dtype=jnp.float32)
    conditioned = jnp.ones(xy0.shape[0], dtype=bool)

    for lvl in reversed(range(levels)):
        scale = 2.0 ** lvl
        i0, i1 = pyr0[lvl], pyr1[lvl]
        p0 = xy0 / scale  # (N, 2)
        coords0 = p0[:, None, :] + offs[None]  # (N, P, 2)
        t = bilinear_sample(i0, coords0)  # template (N, P)
        # spatial gradients of the template (central differences via sampling)
        ex = jnp.asarray([0.5, 0.0], jnp.float32)
        ey = jnp.asarray([0.0, 0.5], jnp.float32)
        gx = bilinear_sample(i0, coords0 + ex) - bilinear_sample(i0, coords0 - ex)
        gy = bilinear_sample(i0, coords0 + ey) - bilinear_sample(i0, coords0 - ey)
        # 2x2 Gram matrix per point (inverse-compositional: constant per level)
        gxx = jnp.sum(gx * gx, axis=1)
        gxy = jnp.sum(gx * gy, axis=1)
        gyy = jnp.sum(gy * gy, axis=1)
        det = gxx * gyy - gxy * gxy
        trace = gxx + gyy
        # min eigenvalue of the Gram matrix, normalized by patch size
        mineig = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det, 0.0))) * 0.5
        conditioned = conditioned & (mineig / offs.shape[0] > min_eig)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

        def body(_, g):
            coords1 = (p0 + g / scale)[:, None, :] + offs[None]
            w = bilinear_sample(i1, coords1)
            # zero-mean patches: exposure BIAS between frames must not leak
            # into the update (brightness-constancy relaxation; the residual
            # gain term is handled by the front-end's equalize preprocessing)
            e = (w - jnp.mean(w, axis=1, keepdims=True)) \
                - (t - jnp.mean(t, axis=1, keepdims=True))  # (N, P)
            bx = jnp.sum(gx * e, axis=1)
            by = jnp.sum(gy * e, axis=1)
            dx = inv_det * (gyy * bx - gxy * by)
            dy = inv_det * (-gxy * bx + gxx * by)
            return g - jnp.stack([dx, dy], axis=-1) * scale

        flow = jax.lax.fori_loop(0, iters, body, flow)

        coords1 = (p0 + flow / scale)[:, None, :] + offs[None]
        residual = jnp.mean(jnp.abs(bilinear_sample(i1, coords1) - t), axis=1)

    xy1 = xy0 + flow
    h, w = img1.shape[-2:]
    inb = (xy1[:, 0] >= radius) & (xy1[:, 0] <= w - 1 - radius) & \
          (xy1[:, 1] >= radius) & (xy1[:, 1] <= h - 1 - radius)
    valid = valid0 & inb & conditioned & (residual < max_residual)
    return TrackResult(xy1, valid, residual)
