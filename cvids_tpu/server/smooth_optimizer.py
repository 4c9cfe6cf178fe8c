"""Relaxation-based 4-DoF smoother — the reference's alternative optimizer.

Parity component for `SmoothEulerOptimizer`
(`/root/reference/server_pose_graph/src/optimizer/smooth_euler_optimizer.h:
59-153`): instead of a Gauss-Newton solve, each sweep re-estimates every node
as the average of its neighbors' predictions through the connecting edges.
The reference sweeps back-to-front sequentially (Gauss-Seidel); here the
sweep is Jacobi-style — all nodes update simultaneously from segment-summed
neighbor predictions — which is the parallel form of the same fixed-point
iteration and runs as pure array ops (no sequential node loop).

Useful as a cheap warm-starter for `optimize_pose_graph` or as a standalone
smoother for odometry-dominated graphs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import rot_z, wrap_angle
from .optimizer import PoseGraphEdges, PoseGraphNodes, _rot_i

__all__ = ["smooth_euler_relax"]


def smooth_euler_relax(nodes: PoseGraphNodes, edges: PoseGraphEdges,
                       sweeps: int = 5, mix: float = 0.8) -> PoseGraphNodes:
    """Run `sweeps` relaxation passes (reference default: 5).

    mix blends the averaged neighbor prediction with the current estimate
    (1.0 = pure replacement, as the reference's in-place overwrite).
    """
    n = nodes.yaw.shape[0]
    ok = edges.valid & nodes.valid[edges.i] & nodes.valid[edges.j]
    w_edge = jnp.where(ok, edges.t_weight, 0.0)

    def sweep(nd, _):
        r_i = _rot_i(nd.yaw[edges.i], nd.pr[edges.i])
        # forward prediction of node j from node i through the edge
        t_j_pred = nd.t[edges.i] + jnp.einsum("eij,ej->ei", r_i, edges.t_ij)
        yaw_j_pred = nd.yaw[edges.i] + edges.yaw_ij
        # backward prediction of node i from node j
        r_i_from_j = _rot_i(nd.yaw[edges.j] - edges.yaw_ij, nd.pr[edges.i])
        t_i_pred = nd.t[edges.j] - jnp.einsum("eij,ej->ei", r_i_from_j, edges.t_ij)
        yaw_i_pred = nd.yaw[edges.j] - edges.yaw_ij

        wsum = (jax.ops.segment_sum(w_edge, edges.j, n)
                + jax.ops.segment_sum(w_edge, edges.i, n))
        t_acc = (jax.ops.segment_sum(t_j_pred * w_edge[:, None], edges.j, n)
                 + jax.ops.segment_sum(t_i_pred * w_edge[:, None], edges.i, n))
        # average yaw via unit-vector embedding (safe around ±pi)
        cy_acc = (jax.ops.segment_sum(jnp.cos(yaw_j_pred) * w_edge, edges.j, n)
                  + jax.ops.segment_sum(jnp.cos(yaw_i_pred) * w_edge, edges.i, n))
        sy_acc = (jax.ops.segment_sum(jnp.sin(yaw_j_pred) * w_edge, edges.j, n)
                  + jax.ops.segment_sum(jnp.sin(yaw_i_pred) * w_edge, edges.i, n))
        has = wsum > 1e-9
        t_new = jnp.where(has[:, None], t_acc / jnp.maximum(wsum, 1e-9)[:, None], nd.t)
        yaw_new = jnp.where(has, jnp.arctan2(sy_acc, cy_acc), nd.yaw)
        upd = nodes.valid & ~nodes.fixed
        t_out = jnp.where(upd[:, None], (1 - mix) * nd.t + mix * t_new, nd.t)
        yaw_out = jnp.where(upd, wrap_angle(nd.yaw + mix * wrap_angle(yaw_new - nd.yaw)),
                            nd.yaw)
        return nd._replace(t=t_out, yaw=yaw_out), None

    out, _ = jax.lax.scan(sweep, nodes, None, length=sweeps)
    return out
