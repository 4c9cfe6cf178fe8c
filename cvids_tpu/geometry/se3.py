"""Batched rigid-body (SE(3)) transforms as (quat, translation) pairs.

Replaces the reference's Sophus/Eigen pose plumbing (`server_keyframe.h`,
`pcm_graph.h:24-43`) with a functional, batch-first representation: a pose is
just a pytree of ``q`` (..., 4) and ``t`` (..., 3) arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rotations import (
    quat_inverse,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
    so3_exp,
    so3_log,
)

__all__ = ["Pose", "pose_identity", "compose", "inverse", "between", "transform_points",
           "pose_from_matrix", "pose_to_matrix", "se3_exp", "se3_log"]


class Pose(NamedTuple):
    """Rigid transform: x_world = R(q) @ x_local + t."""

    q: jax.Array  # (..., 4) wxyz
    t: jax.Array  # (..., 3)

    @property
    def matrix(self) -> jax.Array:
        return pose_to_matrix(self)


def pose_identity(batch_shape=(), dtype=jnp.float32) -> Pose:
    q = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0], dtype=dtype), batch_shape + (4,))
    t = jnp.zeros(batch_shape + (3,), dtype=dtype)
    return Pose(q, t)


def compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b: apply b first, then a."""
    return Pose(quat_normalize(quat_multiply(a.q, b.q)), quat_rotate(a.q, b.t) + a.t)


def inverse(p: Pose) -> Pose:
    qinv = quat_inverse(p.q)
    return Pose(qinv, -quat_rotate(qinv, p.t))


def between(a: Pose, b: Pose) -> Pose:
    """Relative pose a^{-1} ∘ b."""
    return compose(inverse(a), b)


def transform_points(p: Pose, pts: jax.Array) -> jax.Array:
    """Apply pose to (..., 3) points (pose batch dims broadcast)."""
    return quat_rotate(p.q[..., None, :], pts) + p.t[..., None, :]


def pose_to_matrix(p: Pose) -> jax.Array:
    m = jnp.zeros(p.q.shape[:-1] + (4, 4), dtype=p.q.dtype)
    m = m.at[..., :3, :3].set(quat_to_matrix(p.q))
    m = m.at[..., :3, 3].set(p.t)
    return m.at[..., 3, 3].set(1.0)


def pose_from_matrix(m: jax.Array) -> Pose:
    return Pose(matrix_to_quat(m[..., :3, :3]), m[..., :3, 3])


def se3_exp(xi: jax.Array) -> Pose:
    """Exp map with (..., 6) = (rho, phi); first-order-coupled (V matrix) version."""
    rho, phi = xi[..., :3], xi[..., 3:]
    q = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-10
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-24))
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, 1e-24))
    cross1 = jnp.cross(phi, rho)
    cross2 = jnp.cross(phi, cross1)
    t = rho + a * cross1 + b * cross2
    return Pose(q, t)


def se3_log(p: Pose) -> jax.Array:
    """Log map -> (..., 6) = (rho, phi); inverse of `se3_exp`."""
    phi = so3_log(p.q)
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-10
    half = 0.5 * theta
    # V^{-1} = I - 0.5 phî + c * phî², c = (1 - θ cot(θ/2)/2)/θ²
    cot_term = half * jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-24)
    c = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  (1.0 - cot_term) / jnp.maximum(theta2, 1e-24))
    cross1 = jnp.cross(phi, p.t)
    cross2 = jnp.cross(phi, cross1)
    rho = p.t - 0.5 * cross1 + c * cross2
    return jnp.concatenate([rho, phi], axis=-1)
