"""Pairwise-consistency maximization (PCM) outlier rejection for inter-agent
loop closures.

Re-design of the reference's `ConnectionGraph::ComputeGraph` + fmc max-clique
(`/root/reference/server_pose_graph/src/pcm_graph.cpp:25-361`,
`include/fmc/findCliqueHeu.cpp`): inter-agent loop edges are bucketed per
client pair; the O(E²) pairwise cycle-consistency errors are computed as one
batched 4-DoF composition over an (E, E) grid on device; the consistency
matrix feeds a max-clique search (greedy Pattabiraman-style heuristic with an
exact fallback for small graphs) on the host — the clique problem is tiny,
irregular, and latency-insensitive (the reference runs it on a 5 s cadence).

Cycle error (4-DoF semantics, as `pcm_graph.cpp:195-268`): for edges
e1 = (i1→j1, T1) and e2 = (i2→j2, T2) between clients a (i's) and b (j's),
the composed loop  T1⁻¹ · odo_a(i1→i2) · T2 · odo_b(j2→j1)  should be
identity; its (yaw, t) magnitude, whitened by a configurable sigma, is the
pairwise error; threshold gamma=5 mirrors `pcm_graph.cpp:8`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import rot_z, wrap_angle

__all__ = ["pairwise_consistency", "max_clique", "pcm_filter", "FourDof"]


class FourDof(NamedTuple):
    """Batch of 4-DoF transforms (yaw, t); composition is yaw-additive."""

    yaw: jax.Array  # (...,)
    t: jax.Array    # (..., 3)


def _compose(a: FourDof, b: FourDof) -> FourDof:
    return FourDof(wrap_angle(a.yaw + b.yaw),
                   a.t + jnp.einsum("...ij,...j->...i", rot_z(a.yaw), b.t))


def _inverse(a: FourDof) -> FourDof:
    return FourDof(wrap_angle(-a.yaw),
                   -jnp.einsum("...ij,...j->...i", rot_z(-a.yaw), a.t))


def chain_cov(pose: FourDof, idx_a: jax.Array, idx_b: jax.Array,
              step_sigma_t: float, step_sigma_yaw: float,
              rot_to_frame_a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Odometry-chain covariance of the relative 4-DoF transform between
    keyframes `idx_a` and `idx_b` of one client, from prefix sums.

    The reference walks the odometry chain per edge pair
    (`DeterminePropChainCov`, `server_keyframe.h:153-556` — O(chain) per
    pair); here the per-step noise accumulates in closed form:

      Σ_t(a,b) = σ_t²·n·I + σ_y²· ẑ× M ×ẑᵀ ,  σ_yaw²(a,b) = σ_y²·n
      M = Σ_k (t_b - t_k)(t_b - t_k)ᵀ  (k over the chain)

    and M reduces to the prefix sums S1 = Σ t_k, S2 = Σ t_k t_kᵀ — so every
    pair costs O(1) after one O(N) cumulative-sum pass (the SURVEY §5.7
    prefix-scan formulation). Isotropic per-step translation noise makes the
    rotation conjugations drop out; the ẑ× projection is applied in frame a
    via `rot_to_frame_a` (E, 3, 3).

    Returns (cov_t (..., 3, 3), var_yaw (...,)).
    """
    t = pose.t  # (N, 3) client-local positions
    n_nodes = t.shape[0]
    s1 = jnp.cumsum(t, axis=0)                      # (N, 3)
    s2 = jnp.cumsum(t[:, :, None] * t[:, None, :], axis=0)  # (N, 3, 3)
    lo = jnp.minimum(idx_a, idx_b)
    hi = jnp.maximum(idx_a, idx_b)
    n_steps = (hi - lo).astype(t.dtype)
    # sums over k in [lo, hi): S1(hi-1) - S1(lo-1)
    def seg(s, a, b):
        sa = jnp.where((a > 0)[..., None], s[jnp.maximum(a - 1, 0)], 0.0)
        return s[jnp.maximum(b - 1, 0)] - sa
    def seg2(s, a, b):
        sa = jnp.where((a > 0)[..., None, None], s[jnp.maximum(a - 1, 0)], 0.0)
        return s[jnp.maximum(b - 1, 0)] - sa
    s1_seg = seg(s1, lo, hi)
    s2_seg = seg2(s2, lo, hi)
    t_b = t[hi]
    m = (n_steps[..., None, None] * t_b[..., :, None] * t_b[..., None, :]
         - t_b[..., :, None] * s1_seg[..., None, :]
         - s1_seg[..., :, None] * t_b[..., None, :] + s2_seg)
    # ẑ× M ×ẑᵀ in frame a: rotate M then apply hat(z) sandwich
    m_a = jnp.einsum("...ij,...jk,...lk->...il", rot_to_frame_a, m, rot_to_frame_a)
    zhat = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
                       t.dtype)
    yaw_term = zhat @ m_a @ zhat.T
    cov_t = (step_sigma_t ** 2 * jnp.maximum(n_steps, 1.0)[..., None, None]
             * jnp.eye(3, dtype=t.dtype)
             + step_sigma_yaw ** 2 * yaw_term)
    var_yaw = step_sigma_yaw ** 2 * jnp.maximum(n_steps, 1.0)
    return cov_t, var_yaw


def pairwise_consistency(
    edge_T: FourDof,            # (E,) measured relative transform i->j
    pose_i: FourDof,            # (E,) odometry pose of endpoint i (client a local frame)
    pose_j: FourDof,            # (E,) odometry pose of endpoint j (client b local frame)
    valid: jax.Array,           # (E,)
    sigma_t: float = 0.1,
    sigma_yaw: float = 0.05,
    gamma: float = 5.0,
    chain: tuple | None = None,
) -> jax.Array:
    """(E, E) bool consistency matrix.

    odo_a(i1→i2) = pose_i1⁻¹ ∘ pose_i2 etc. — odometry is read straight from
    the clients' local (VIO) poses, which is equivalent to the reference's
    chained relative odometry.

    Whitening: with `chain=None`, fixed sigmas (first-order gate). With
    `chain=(all_pose_a, idx_i, all_pose_b, idx_j, step_sigma_t,
    step_sigma_yaw)`, the cycle error is whitened by the odometry-chain
    covariance of both legs computed via `chain_cov` prefix sums — the
    reference's Mahalanobis PCM (`pcm_graph.cpp:195-268`).
    """
    def cycle_of(a_idx, b_idx):
        t1 = jax.tree_util.tree_map(lambda x: x[a_idx], edge_T)
        t2 = jax.tree_util.tree_map(lambda x: x[b_idx], edge_T)
        pi1 = jax.tree_util.tree_map(lambda x: x[a_idx], pose_i)
        pi2 = jax.tree_util.tree_map(lambda x: x[b_idx], pose_i)
        pj1 = jax.tree_util.tree_map(lambda x: x[a_idx], pose_j)
        pj2 = jax.tree_util.tree_map(lambda x: x[b_idx], pose_j)
        odo_a = _compose(_inverse(pi1), pi2)
        odo_b = _compose(_inverse(pj2), pj1)
        return _compose(_compose(_compose(_inverse(t1), odo_a), t2), odo_b)

    e_count = edge_T.yaw.shape[0]
    ii = jnp.arange(e_count)
    cycles = jax.vmap(lambda a: jax.vmap(lambda b: cycle_of(a, b))(ii))(ii)

    if chain is None:
        errs = (jnp.sum((cycles.t / sigma_t) ** 2, axis=-1)
                + (cycles.yaw / sigma_yaw) ** 2)
    else:
        all_pose_a, idx_i, all_pose_b, idx_j, st_sig, sy_sig = chain
        r_a = rot_z(-pose_i.yaw)  # rotate into the frame of endpoint i1
        # pairwise chain covariances of both odometry legs
        cov_a, vy_a = chain_cov(all_pose_a, idx_i[:, None], idx_i[None, :],
                                st_sig, sy_sig, r_a[:, None])
        cov_b, vy_b = chain_cov(all_pose_b, idx_j[:, None], idx_j[None, :],
                                st_sig, sy_sig, r_a[:, None])
        meas_t = sigma_t ** 2
        meas_y = sigma_yaw ** 2
        cov = cov_a + cov_b + 2.0 * meas_t * jnp.eye(3)
        vyaw = vy_a + vy_b + 2.0 * meas_y
        sol = jnp.linalg.solve(cov, cycles.t[..., None])[..., 0]
        errs = jnp.einsum("...i,...i->...", cycles.t, sol) \
            + cycles.yaw ** 2 / vyaw
    ok = (errs < gamma ** 2) & valid[:, None] & valid[None, :]
    return ok & ok.T


def max_clique(adj: np.ndarray, exact_threshold: int = 18) -> np.ndarray:
    """Indices of a (near-)maximum clique of a boolean adjacency matrix.

    Prefers the native C++ solver (`cvids_tpu.native`, the fmc-library
    equivalent) when built; otherwise small graphs get exact Python
    branch-and-bound and larger ones the greedy degree-guided heuristic
    (Pattabiraman et al., as the reference's `maxCliqueHeu`).
    """
    from .. import native
    if native.available():
        out = native.max_clique_native(adj)
        if out is not None:
            return out
    n = adj.shape[0]
    a = np.asarray(adj, bool).copy()
    np.fill_diagonal(a, False)
    if n == 0:
        return np.zeros(0, np.int64)

    if n <= exact_threshold:
        best: list[int] = []

        def expand(r: list[int], cand: np.ndarray):
            nonlocal best
            if len(r) + cand.sum() <= len(best):
                return
            idxs = np.nonzero(cand)[0]
            if len(idxs) == 0:
                if len(r) > len(best):
                    best = list(r)
                return
            for v in idxs:
                if len(r) + cand.sum() <= len(best):
                    return
                cand2 = cand & a[v]
                cand2[: v + 1] = False
                expand(r + [int(v)], cand2)
                cand[v] = False

        expand([], np.ones(n, bool))
        return np.asarray(best, np.int64)

    # greedy heuristic: seed from each high-degree vertex, extend by degree
    deg = a.sum(1)
    order = np.argsort(-deg)
    best = []
    for seed in order[: min(n, 30)]:
        clique = [int(seed)]
        cand = a[seed].copy()
        while cand.any():
            idxs = np.nonzero(cand)[0]
            # degree within the candidate set; argmax restricted to candidates
            sub_deg = a[np.ix_(idxs, idxs)].sum(1)
            v = int(idxs[np.argmax(sub_deg)])
            clique.append(v)
            cand &= a[v]  # removes v itself (diagonal is False)
        if len(clique) > len(best):
            best = clique
    return np.asarray(sorted(best), np.int64)


def pcm_filter(edge_T: FourDof, pose_i: FourDof, pose_j: FourDof,
               valid: np.ndarray, min_edges: int = 20,
               sigma_t: float = 0.1, sigma_yaw: float = 0.05,
               gamma: float = 5.0, chain: tuple | None = None) -> np.ndarray:
    """Full PCM pass for one client pair: consistency matrix (device) +
    max clique (host). Returns (E,) bool mask of surviving edges.

    Mirrors the reference's gate of >= 20 edges before PCM engages
    (`pcm_graph.cpp:71`): below that, all valid edges pass through.
    """
    valid = np.asarray(valid, bool)
    if valid.sum() < min_edges:
        return valid
    adj = np.asarray(pairwise_consistency(edge_T, pose_i, pose_j,
                                          jnp.asarray(valid),
                                          sigma_t, sigma_yaw, gamma, chain))
    clique = max_clique(adj)
    out = np.zeros_like(valid)
    out[clique] = True
    return out & valid
