"""Semi-global matching: 4 directional scans + WTA with subpixel refinement.

Redesign of the reference's `sgm2` CUDA kernels and `filterCostKernel`
(`/root/reference/server_pose_graph/src/dense_mapping/calc_cost.cu:366-546,
235-283`): each direction is a `lax.scan` along rows/columns whose carry is a
whole (H, D) (or (W, D)) slice — the per-step work is pure VPU element-wise
min algebra over the full cross-section, so the sequential axis costs W (or
H) fused steps instead of per-pixel threads.

Penalties follow the reference semantics: P1 for ±1 disparity moves, P2
(image-gradient modulated) for larger jumps, and the classic min-normalization
`- min_d L(p-1, d)` keeping the carry bounded. Defaults pi1=16, pi2=64,
tau_so=8, q1=q2=1 mirror `dense_mapping_parameters.cpp:1-13`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sgm_aggregate", "wta_depth", "sgm_depth"]


def _shift_d(l: jax.Array, s: int) -> jax.Array:
    """Shift along the last (depth) axis with +inf padding."""
    big = jnp.asarray(jnp.inf, l.dtype)
    if s == 1:
        return jnp.concatenate([jnp.full_like(l[..., :1], big), l[..., :-1]], -1)
    return jnp.concatenate([l[..., 1:], jnp.full_like(l[..., :1], big)], -1)


def _scan_dir(cost: jax.Array, p1: jax.Array, p2_eff: jax.Array):
    """One directional pass along axis 0 of `cost` (S, X, D).

    p2_eff: (S, X) per-step large-jump penalty (already gradient-modulated).
    Returns aggregated (S, X, D).
    """
    def step(l_prev, inp):
        c, p2 = inp
        min_prev = jnp.min(l_prev, axis=-1, keepdims=True)
        cand = jnp.minimum(
            l_prev,
            jnp.minimum(jnp.minimum(_shift_d(l_prev, 1), _shift_d(l_prev, -1)) + p1,
                        min_prev + p2[..., None]))
        l = c + cand - min_prev
        return l, l

    l0 = cost[0]
    _, out = jax.lax.scan(step, l0, (cost[1:], p2_eff[1:]))
    return jnp.concatenate([l0[None], out], axis=0)


def sgm_aggregate(cost: jax.Array, grad: jax.Array,
                  pi1: float = 16.0, pi2: float = 64.0,
                  tau_so: float = 8.0, q1: float = 1.0, q2: float = 1.0,
                  penalty_scale: jax.Array | None = None) -> jax.Array:
    """4-direction SGM aggregation of (H, W, D) cost.

    Penalty modulation mirrors `sgm2`'s alpha/tau_so scheme in spirit: where
    the image gradient along the scan direction exceeds tau_so, the jump
    penalty drops (gradients license discontinuities):
        P2 = pi2 / q2  if |∇I| > tau_so else pi2
        P1 = pi1 / q1  if |∇I| > tau_so else pi1   (q1=1 -> unchanged)
    `penalty_scale` (H, W) optionally multiplies both (the reference's
    per-pixel `0.8 + 1.5 mean³/(1+|∇|³)` map from `InitReference`,
    `sgm_stereo_mapper.cpp:55-123`).
    """
    big_jump = grad > tau_so
    p2_map = jnp.where(big_jump, pi2 / q2, pi2)
    p1_map = jnp.where(big_jump, pi1 / q1, pi1)
    if penalty_scale is not None:
        p2_map = p2_map * penalty_scale
        p1_map = p1_map * penalty_scale
    # use a scalar p1 per scan step (same modulation source as p2): we pass
    # p1 via broadcasting inside the scan by folding it into p2_eff's shape.
    h, w, d = cost.shape

    agg = jnp.zeros_like(cost)
    # left -> right (scan over W): arrange as (W, H, D)
    c_lr = jnp.moveaxis(cost, 1, 0)
    p2_lr = p2_map.T  # (W, H)
    p1_s = jnp.mean(p1_map)  # P1 is effectively constant in the reference
    agg = agg + jnp.moveaxis(_scan_dir(c_lr, p1_s, p2_lr), 0, 1)
    # right -> left
    agg = agg + jnp.moveaxis(
        _scan_dir(c_lr[::-1], p1_s, p2_lr[::-1])[::-1], 0, 1)
    # top -> bottom (scan over H): (H, W, D) directly
    agg = agg + _scan_dir(cost, p1_s, p2_map)
    # bottom -> top
    agg = agg + _scan_dir(cost[::-1], p1_s, p2_map[::-1])[::-1]
    return agg


def wta_depth(cost: jax.Array, valid_count: jax.Array | None = None,
              min_count: float = 1.0, peak_ratio: float = 0.98):
    """Winner-take-all over the depth axis + parabola subpixel refinement +
    peak-sharpness rejection (`filterCostKernel`, `calc_cost.cu:235-283`).

    Returns (idx_float (H, W), conf (H, W) bool).
    """
    d = cost.shape[-1]
    idx = jnp.argmin(cost, axis=-1)
    c0 = jnp.min(cost, axis=-1)
    # parabola through (idx-1, idx, idx+1)
    im = jnp.clip(idx - 1, 0, d - 1)
    ip = jnp.clip(idx + 1, 0, d - 1)
    cm = jnp.take_along_axis(cost, im[..., None], axis=-1)[..., 0]
    cp = jnp.take_along_axis(cost, ip[..., None], axis=-1)[..., 0]
    denom = cm + cp - 2.0 * c0
    delta = jnp.where(denom > 1e-6, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    idx_f = idx.astype(cost.dtype) + delta
    # peak sharpness: second-best (excluding +-1 neighborhood) must be
    # sufficiently worse than the best
    masked = jnp.where(
        jnp.abs(jnp.arange(d)[None, None, :] - idx[..., None]) <= 1,
        jnp.inf, cost)
    c2 = jnp.min(masked, axis=-1)
    conf = c0 < peak_ratio * c2
    conf = conf & (idx > 0) & (idx < d - 1)
    if valid_count is not None:
        conf = conf & (valid_count >= min_count)
    return idx_f, conf


def sgm_depth(cost: jax.Array, grad: jax.Array, inv_depths: jax.Array,
              valid_count: jax.Array | None = None, min_count: float = 1.0,
              **kw):
    """Aggregate + WTA + map to inverse depth. Returns (inv_depth, conf)."""
    agg = sgm_aggregate(cost, grad, **kw)
    idx_f, conf = wta_depth(agg, valid_count, min_count)
    d = inv_depths.shape[0]
    step = inv_depths[1] - inv_depths[0]
    inv_depth = inv_depths[0] + idx_f * step
    return inv_depth, conf
