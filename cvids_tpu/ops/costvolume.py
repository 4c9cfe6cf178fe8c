"""Plane-sweep absolute-difference cost volume.

TPU-native redesign of the reference's `ADCalcCostKernel`
(`/root/reference/server_pose_graph/src/dense_mapping/calc_cost.cu:20-233`):
for every pixel and every inverse-depth hypothesis, warp into the measurement
frame via the per-hypothesis homography  x₂ ~ A x₁ + b·ρ  (A = K₂R₂₁K₁⁻¹,
b = K₂t₂₁), sample bilinearly, and accumulate an absolute-difference cost
averaged over a 3×3 patch with a running mean across measurement frames and
a -1 sentinel for out-of-view pixels.

Differences from the CUDA kernel, chosen for TPU shape:
- the 9-tap patch AD (center + 4 + 4 diagonal taps of the *warped* image,
  `calc_cost.cu:96-223`) becomes a 3×3 box filter over the per-pixel AD
  image — identical for locally-translational warps and one fused VPU pass;
- the 128-hypothesis axis is the innermost (lane) dimension, so the volume
  (H, W, D) tiles the VPU/MXU naturally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .image import bilinear_sample

__all__ = ["plane_sweep_cost", "accumulate_cost", "warp_coords"]


def warp_coords(a_mat: jax.Array, b_vec: jax.Array, inv_depths: jax.Array,
                height: int, width: int) -> jax.Array:
    """Warped pixel coordinates (D, H, W, 2) for each inverse-depth plane.

    a_mat: (3,3) = K2 @ R_21 @ K1^-1;  b_vec: (3,) = K2 @ t_21;
    inv_depths: (D,).  x2_h = a_mat @ [u, v, 1] + b_vec * rho.
    """
    u = jnp.arange(width, dtype=jnp.float32)
    v = jnp.arange(height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    base = jnp.einsum("ij,jhw->ihw", a_mat,
                      jnp.stack([uu, vv, jnp.ones_like(uu)]))  # (3, H, W)
    p = base[None] + b_vec[None, :, None, None] * inv_depths[:, None, None, None]
    z = p[:, 2]
    safe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    return jnp.stack([p[:, 0] / safe, p[:, 1] / safe], axis=-1)  # (D, H, W, 2)


def _box3(x: jax.Array) -> jax.Array:
    """3x3 box filter over the last two dims (edge-replicated)."""
    pads = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pads, mode="edge")
    h, w = x.shape[-2], x.shape[-1]
    acc = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            acc = acc + jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(xp, dy, h, axis=x.ndim - 2),
                dx, w, axis=x.ndim - 1)
    return acc / 9.0


def plane_sweep_cost(ref: jax.Array, meas: jax.Array,
                     a_mat: jax.Array, b_vec: jax.Array,
                     inv_depths: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One measurement frame's cost slice.

    ref, meas: (H, W) float intensity images. Returns (cost (H, W, D),
    valid (H, W, D)) where invalid = warped outside the measurement image.
    """
    h, w = ref.shape
    coords = warp_coords(a_mat, b_vec, inv_depths, h, w)  # (D, H, W, 2)
    warped = bilinear_sample(meas, coords, fill=jnp.nan)  # (D, H, W)
    ad = jnp.abs(warped - ref[None])
    valid = jnp.isfinite(ad)
    ad = jnp.where(valid, ad, 0.0)
    # patch aggregation (VPU pass); renormalize by the valid-tap count
    num = _box3(ad)
    den = _box3(valid.astype(jnp.float32))
    cost = jnp.where(den > 0.0, num / jnp.maximum(den, 1e-6) * 1.0, 0.0)
    ok = den > 0.5  # at least ~half the patch in view
    return (jnp.moveaxis(cost, 0, -1),  # (H, W, D)
            jnp.moveaxis(ok, 0, -1))


def accumulate_cost(mean_cost: jax.Array, count: jax.Array,
                    new_cost: jax.Array, new_valid: jax.Array):
    """Running mean across measurement frames (the CUDA kernel's in-place
    accumulation, `calc_cost.cu:224-230`). Invalid samples don't count.

    mean_cost/count: (H, W, D). Returns updated (mean_cost, count).
    """
    c = count + new_valid.astype(mean_cost.dtype)
    upd = jnp.where(new_valid,
                    mean_cost + (new_cost - mean_cost) / jnp.maximum(c, 1.0),
                    mean_cost)
    return upd, c
