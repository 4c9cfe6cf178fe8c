"""Per-pixel Gaussian×Beta (Vogiatzis/REMODE) inverse-depth filter.

Element-wise twin of the reference's CPU `DepthFilter::Update`
(`/root/reference/server_pose_graph/src/dense_mapping/depth_filter.cpp:177-259`)
and its GPU `FusionFilterKernel` (`calc_cost.cu:552-683`): each pixel keeps a
Gaussian depth estimate (mu, sigma²) and a Beta inlier model (a, b); a new
measurement (x, tau²) is fused by moment matching. Everything is (H, W)
array-parallel — exactly the shape the reference's GPU twin confirms belongs
on-device.

State also supports reprojection into a new reference frame
(`PropogateDepth`, `depth_filter.cpp:113-174`): forward-splat with a 3×3
footprint, inflating variance by (d'/d)⁴.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["FilterState", "init_state", "update", "propagate", "converged_mask"]


class FilterState(NamedTuple):
    mu: jax.Array      # (H, W) inverse-depth mean
    sigma2: jax.Array  # (H, W) variance
    a: jax.Array       # (H, W) Beta inlier count
    b: jax.Array       # (H, W) Beta outlier count


def init_state(height: int, width: int, mu0: float = 0.5, sigma2_0: float = 100.0,
               a0: float = 15.0, b0: float = 15.0, dtype=jnp.float32) -> FilterState:
    """Defaults mirror the reference init (`depth_filter.cpp:98-110`)."""
    full = lambda v: jnp.full((height, width), v, dtype)
    return FilterState(full(mu0), full(sigma2_0), full(a0), full(b0))


def update(state: FilterState, x: jax.Array, tau2: jax.Array,
           meas_valid: jax.Array,
           mu_range: tuple[float, float] = (0.01, 100.0)) -> FilterState:
    """Fuse measurement x (inverse depth) with variance tau2, masked.

    Vogiatzis moment-matched posterior; out-of-range measurements only bump
    the Beta outlier count (the reference's range gate,
    `depth_filter.cpp:196-206`); soft outliers are down-weighted by the
    Beta-uniform mixture itself.
    """
    mu, s2, a, b = state
    norm_scale2 = s2 + tau2
    # Gaussian fusion
    s = 1.0 / (1.0 / jnp.maximum(s2, 1e-12) + 1.0 / jnp.maximum(tau2, 1e-12))
    m = s * (mu / jnp.maximum(s2, 1e-12) + x / jnp.maximum(tau2, 1e-12))
    # responsibilities
    pdf = jnp.exp(-0.5 * (x - mu) ** 2 / jnp.maximum(norm_scale2, 1e-12)) \
        / jnp.sqrt(2 * jnp.pi * jnp.maximum(norm_scale2, 1e-12))
    uniform = 1.0 / (mu_range[1] - mu_range[0])
    c1 = a / (a + b) * pdf
    c2 = b / (a + b) * uniform
    denom = jnp.maximum(c1 + c2, 1e-12)
    c1, c2 = c1 / denom, c2 / denom
    # moment matching of the Beta
    f = c1 * (a + 1.0) / (a + b + 1.0) + c2 * a / (a + b + 1.0)
    e = c1 * (a + 1.0) * (a + 2.0) / ((a + b + 1.0) * (a + b + 2.0)) \
        + c2 * a * (a + 1.0) / ((a + b + 1.0) * (a + b + 2.0))
    mu_new = c1 * m + c2 * mu
    s2_new = c1 * (s + m * m) + c2 * (s2 + mu * mu) - mu_new * mu_new
    a_new = (e - f) / (f - e / jnp.maximum(f, 1e-12))
    b_new = a_new * (1.0 - f) / jnp.maximum(f, 1e-12)

    hard_out = (x < mu_range[0]) | (x > mu_range[1]) | ~meas_valid
    keep = lambda new, old: jnp.where(hard_out, old, new)
    return FilterState(
        mu=keep(mu_new, mu),
        sigma2=jnp.maximum(keep(s2_new, s2), 1e-10),
        a=keep(a_new, a),
        b=keep(b_new, jnp.where(meas_valid, b + 1.0, b)),
    )


def converged_mask(state: FilterState, ratio: float = 0.5,
                   max_sigma2: float | None = None,
                   min_support: float = 0.5, a0: float = 15.0) -> jax.Array:
    """Inlier-ratio mask, the reference's FinalizeMapPoints gate
    (`depth_estimator.cpp:365-492`: keep pixels with a/(a+b) >= 0.5).

    `min_support`: additionally require a > a0 + min_support — at least one
    inlier update must have actually landed. With the symmetric Beta prior
    (a0 = b0) a NEVER-updated pixel sits at ratio exactly 0.5 and would
    pass the >= 0.5 gate with its prior depth: measured as 99 %-"converged"
    depth maps hallucinating the 2 m prior across open space (and a mesh
    growing phantom surfaces there)."""
    ok = state.a / jnp.maximum(state.a + state.b, 1e-9) >= ratio
    if min_support > 0.0:
        ok = ok & (state.a > a0 + min_support)
    if max_sigma2 is not None:
        ok = ok & (state.sigma2 <= max_sigma2)
    return ok


def propagate(state: FilterState, r_no: jax.Array, t_no: jax.Array,
              k_new: jax.Array, k_old_inv: jax.Array,
              sigma_inflate: float = 1.2,
              init: FilterState | None = None) -> FilterState:
    """Reproject filter state from an old reference frame to a new one.

    r_no, t_no: transform old-cam -> new-cam. k_new: (3,3) intrinsics of the
    new frame; k_old_inv: inverse intrinsics of the old. Forward splat
    (nearest-pixel); collisions resolve toward the *nearer* surface
    (min depth), matching `PropogateDepth`'s overwrite-nearer rule; variance
    inflates by (d_new/d_old)⁴ × sigma_inflate. Unhit target pixels reset to
    `init` (fresh prior), as in the reference.
    """
    h, w = state.mu.shape
    if init is None:
        init = init_state(h, w, dtype=state.mu.dtype)
    u = jnp.arange(w, dtype=state.mu.dtype)
    v = jnp.arange(h, dtype=state.mu.dtype)
    uu, vv = jnp.meshgrid(u, v)
    rays = jnp.einsum("ij,jhw->ihw", k_old_inv,
                      jnp.stack([uu, vv, jnp.ones_like(uu)]))
    depth_old = 1.0 / jnp.maximum(state.mu, 1e-6)
    pts_old = rays * depth_old[None]
    pts_new = jnp.einsum("ij,jhw->ihw", r_no, pts_old) + t_no[:, None, None]
    z_new = pts_new[2]
    proj = jnp.einsum("ij,jhw->ihw", k_new, pts_new)
    pu = proj[0] / jnp.maximum(proj[2], 1e-6)
    pv = proj[1] / jnp.maximum(proj[2], 1e-6)
    ok = (z_new > 1e-3) & (pu >= 0) & (pu <= w - 1) & (pv >= 0) & (pv <= h - 1)

    mu_new_val = 1.0 / jnp.maximum(z_new, 1e-6)
    ratio4 = (mu_new_val / jnp.maximum(state.mu, 1e-6)) ** 4
    s2_new_val = state.sigma2 * ratio4 * sigma_inflate

    # forward splat via scatter-min on depth (nearest surface wins)
    flat_idx = (jnp.round(pv).astype(jnp.int32) * w
                + jnp.round(pu).astype(jnp.int32))
    flat_idx = jnp.where(ok, flat_idx, h * w)  # dump invalid into overflow slot
    order_key = jnp.where(ok, z_new, jnp.inf).ravel()
    n = h * w

    # segment-min of depth to find the winning source pixel per target
    seg_min = jax.ops.segment_min(order_key, flat_idx.ravel(), n + 1)
    winner = order_key == seg_min[flat_idx.ravel()]
    winner = winner & ok.ravel()

    def scatter(values, default):
        out = jnp.full(n + 1, default, state.mu.dtype)
        out = out.at[jnp.where(winner, flat_idx.ravel(), n)].set(
            jnp.where(winner, values.ravel(), default))
        return out[:n].reshape(h, w)

    got = scatter(jnp.ones_like(state.mu), 0.0) > 0.5
    return FilterState(
        mu=jnp.where(got, scatter(mu_new_val, 0.0), init.mu),
        sigma2=jnp.where(got, scatter(s2_new_val, 0.0), init.sigma2),
        a=jnp.where(got, scatter(state.a, 0.0), init.a),
        b=jnp.where(got, scatter(state.b, 0.0), init.b),
    )
