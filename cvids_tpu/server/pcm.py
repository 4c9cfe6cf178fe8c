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


def pairwise_consistency(
    edge_T: FourDof,            # (E,) measured relative transform i->j
    pose_i: FourDof,            # (E,) odometry pose of endpoint i (client a local frame)
    pose_j: FourDof,            # (E,) odometry pose of endpoint j (client b local frame)
    valid: jax.Array,           # (E,)
    sigma_t: float = 0.1,
    sigma_yaw: float = 0.05,
    gamma: float = 5.0,
) -> jax.Array:
    """(E, E) bool consistency matrix.

    odo_a(i1→i2) = pose_i1⁻¹ ∘ pose_i2 etc. — odometry is read straight from
    the clients' local (VIO) poses, which is equivalent to the reference's
    chained relative odometry. The whitened cycle error uses fixed sigmas
    (the reference propagates odometry-chain covariance; a fixed-sigma gate
    is the first-order version — chain covariance is an upgrade path).
    """
    def err(a_idx, b_idx):
        t1 = jax.tree_util.tree_map(lambda x: x[a_idx], edge_T)
        t2 = jax.tree_util.tree_map(lambda x: x[b_idx], edge_T)
        pi1 = jax.tree_util.tree_map(lambda x: x[a_idx], pose_i)
        pi2 = jax.tree_util.tree_map(lambda x: x[b_idx], pose_i)
        pj1 = jax.tree_util.tree_map(lambda x: x[a_idx], pose_j)
        pj2 = jax.tree_util.tree_map(lambda x: x[b_idx], pose_j)
        odo_a = _compose(_inverse(pi1), pi2)
        odo_b = _compose(_inverse(pj2), pj1)
        cycle = _compose(_compose(_compose(_inverse(t1), odo_a), t2), odo_b)
        e = (jnp.sum((cycle.t / sigma_t) ** 2, axis=-1)
             + (cycle.yaw / sigma_yaw) ** 2)
        return e

    e_count = edge_T.yaw.shape[0]
    ii = jnp.arange(e_count)
    errs = jax.vmap(lambda a: jax.vmap(lambda b: err(a, b))(ii))(ii)
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
               gamma: float = 5.0) -> np.ndarray:
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
                                          sigma_t, sigma_yaw, gamma))
    clique = max_clique(adj)
    out = np.zeros_like(valid)
    out[clique] = True
    return out & valid
