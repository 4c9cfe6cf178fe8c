"""IMU preintegration (VINS-style), as a `lax.scan` over samples.

The reference's agent VIO is external (contract only: the IMU noise block in
`/root/reference/config/euroc/euroc_config.yaml:56-63` is consumed by a
VINS-Mono-class estimator), so this module supplies the missing agent-side
capability: midpoint preintegration of gyro/accel between keyframes with
first-order bias Jacobians and covariance propagation — the inputs the
sliding-window BA's IMU factors need.

Conventions: gravity g_w = (0, 0, -9.81) in world; accelerometer measures
specific force in body frame; quaternions (w,x,y,z).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import (
    quat_inverse,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    so3_exp,
    so3_hat,
    so3_log,
)

__all__ = ["ImuNoise", "Preintegrated", "preintegrate", "imu_residual",
           "bias_corrected", "GRAVITY"]

GRAVITY = jnp.asarray([0.0, 0.0, -9.81])


class ImuNoise(NamedTuple):
    """Continuous-time noise densities (EuRoC defaults from the reference
    config `euroc_config.yaml:58-62`)."""

    acc_n: float = 0.08
    gyr_n: float = 0.004
    acc_w: float = 0.00004
    gyr_w: float = 2.0e-6


class Preintegrated(NamedTuple):
    """Preintegrated IMU between two keyframes, at linearization biases."""

    dp: jax.Array       # (3,) alpha: position delta in frame i
    dv: jax.Array       # (3,) beta: velocity delta in frame i
    dq: jax.Array       # (4,) gamma: rotation delta i->j
    dt: jax.Array       # () total time
    j_p_bg: jax.Array   # (3,3) d dp / d gyro bias
    j_p_ba: jax.Array   # (3,3) d dp / d accel bias
    j_v_bg: jax.Array   # (3,3)
    j_v_ba: jax.Array   # (3,3)
    j_q_bg: jax.Array   # (3,3) d Log(dq) / d gyro bias
    sqrt_info: jax.Array  # (9,9) sqrt information of [p, q, v] residual
    bg: jax.Array       # (3,) linearization gyro bias
    ba: jax.Array       # (3,) linearization accel bias


def preintegrate(gyr: jax.Array, acc: jax.Array, dts: jax.Array,
                 bg: jax.Array, ba: jax.Array,
                 noise: ImuNoise = ImuNoise(),
                 sample_valid: jax.Array | None = None) -> Preintegrated:
    """Midpoint preintegration over (N, 3) gyro/accel samples with (N,) dts.

    `sample_valid` masks padding samples (dt treated as 0) so fixed-shape
    batches of variable-length intervals jit cleanly.

    One jitted program per (shape, noise) — the camera-rate front-end
    re-preintegrates its accumulated buffer every frame, and the eager
    `lax.scan` re-traced its body per call (~1 s/frame on a CPU host).
    """
    if sample_valid is None:
        sample_valid = jnp.ones(dts.shape[0], bool)
    return _preintegrate_jit(gyr, acc, dts, bg, ba, sample_valid, noise)


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnames=("noise",))
def _preintegrate_jit(gyr, acc, dts, bg, ba, sample_valid,
                      noise) -> Preintegrated:
    if sample_valid is not None:
        dts = jnp.where(sample_valid, dts, 0.0)
    g_unb = gyr - bg
    a_unb = acc - ba

    # midpoint pairs: (w_k + w_{k+1})/2 etc.; last sample integrates with itself
    w_mid = 0.5 * (g_unb + jnp.roll(g_unb, -1, axis=0)).at[-1].set(g_unb[-1])
    a0 = a_unb
    a1 = jnp.roll(a_unb, -1, axis=0).at[-1].set(a_unb[-1])

    def step(carry, inp):
        dp, dv, dq, jp_bg, jp_ba, jv_bg, jv_ba, jq_bg, cov = carry
        w, acc_0, acc_1, dt = inp
        dq_half = so3_exp(w * dt)
        dq_new = quat_normalize(quat_multiply(dq, dq_half))
        r0 = quat_to_matrix(dq)
        r1 = quat_to_matrix(dq_new)
        a_w = 0.5 * (quat_rotate(dq, acc_0) + quat_rotate(dq_new, acc_1))
        dp_new = dp + dv * dt + 0.5 * a_w * dt * dt
        dv_new = dv + a_w * dt

        # first-order bias Jacobians (standard VINS midpoint linearization)
        a0_hat = so3_hat(acc_0)
        a1_hat = so3_hat(acc_1)
        i3 = jnp.eye(3, dtype=dp.dtype)
        w_hat = so3_hat(w)
        # rotation bias Jacobian recursion (right-perturbation):
        # theta_new = Log(dq * Exp(w dt)) => J_new = R(w dt)^T J_old - dt * Jr(w dt)
        # with Jr ≈ I at 200 Hz step sizes (validated against autodiff in tests)
        jq_bg_new = quat_to_matrix(dq_half).T @ jq_bg - dt * i3
        da_dbg_full = -0.5 * (r0 @ a0_hat @ jq_bg + r1 @ a1_hat @ jq_bg_new)
        da_dba = -0.5 * (r0 + r1)
        jp_bg_new = jp_bg + jv_bg * dt + 0.5 * da_dbg_full * dt * dt
        jp_ba_new = jp_ba + jv_ba * dt + 0.5 * da_dba * dt * dt
        jv_bg_new = jv_bg + da_dbg_full * dt
        jv_ba_new = jv_ba + da_dba * dt

        # covariance propagation on [dp, dtheta, dv] (9x9)
        f = jnp.zeros((9, 9), dtype=dp.dtype)
        f = f.at[0:3, 0:3].set(i3)
        f = f.at[0:3, 3:6].set(-0.25 * (r0 @ a0_hat + r1 @ a1_hat @ (i3 - w_hat * dt)) * dt * dt)
        f = f.at[0:3, 6:9].set(i3 * dt)
        f = f.at[3:6, 3:6].set(i3 - w_hat * dt)
        f = f.at[6:9, 3:6].set(-0.5 * (r0 @ a0_hat + r1 @ a1_hat @ (i3 - w_hat * dt)) * dt)
        f = f.at[6:9, 6:9].set(i3)
        # noise input: [na0, ng, na1] -> use combined: G @ Q @ G^T ≈ diag terms
        qa = noise.acc_n ** 2
        qg = noise.gyr_n ** 2
        g_mat = jnp.zeros((9, 6), dtype=dp.dtype)
        g_mat = g_mat.at[0:3, 0:3].set(0.5 * (r0 + r1) * 0.5 * dt * dt)
        g_mat = g_mat.at[0:3, 3:6].set(jnp.zeros((3, 3)))
        g_mat = g_mat.at[3:6, 3:6].set(i3 * dt)
        g_mat = g_mat.at[6:9, 0:3].set(0.5 * (r0 + r1) * dt)
        q_diag = jnp.concatenate([jnp.full(3, qa), jnp.full(3, qg)])
        cov_new = f @ cov @ f.T + (g_mat * q_diag[None, :] / jnp.maximum(dt, 1e-9)) @ g_mat.T
        # guard dt==0 (masked padding): identity propagation
        is_zero = dt <= 0.0
        keep = lambda new, old: jnp.where(is_zero, old, new)
        return (keep(dp_new, dp), keep(dv_new, dv), keep(dq_new, dq),
                keep(jp_bg_new, jp_bg), keep(jp_ba_new, jp_ba),
                keep(jv_bg_new, jv_bg), keep(jv_ba_new, jv_ba),
                keep(jq_bg_new, jq_bg), keep(cov_new, cov)), None

    dtype = gyr.dtype
    init = (jnp.zeros(3, dtype), jnp.zeros(3, dtype),
            jnp.asarray([1.0, 0, 0, 0], dtype),
            jnp.zeros((3, 3), dtype), jnp.zeros((3, 3), dtype),
            jnp.zeros((3, 3), dtype), jnp.zeros((3, 3), dtype),
            jnp.zeros((3, 3), dtype), jnp.eye(9, dtype=dtype) * 1e-12)
    (dp, dv, dq, jp_bg, jp_ba, jv_bg, jv_ba, jq_bg, cov), _ = jax.lax.scan(
        step, init, (w_mid, a0, a1, dts))

    # sqrt information: inv(chol(cov)) — robust to near-singular via jitter
    cov = cov + jnp.eye(9, dtype=dtype) * 1e-10
    l = jnp.linalg.cholesky(cov)
    sqrt_info = jax.scipy.linalg.solve_triangular(l, jnp.eye(9, dtype=dtype), lower=True)
    return Preintegrated(dp, dv, dq, jnp.sum(dts), jp_bg, jp_ba, jv_bg, jv_ba,
                         jq_bg, sqrt_info, bg, ba)


def imu_residual(pre: Preintegrated,
                 p_i, q_i, v_i, bg_i, ba_i,
                 p_j, q_j, v_j, bg_j, ba_j,
                 gravity: jax.Array = GRAVITY,
                 weight_bias: float = 1.0) -> jax.Array:
    """15-D IMU factor residual [r_p(3), r_q(3), r_v(3), r_bg(3), r_ba(3)].

    The [p,q,v] block is whitened by the preintegration sqrt-information;
    bias random-walk is whitened by a scalar weight (caller supplies
    1/(sigma_rw*sqrt(dt))).
    """
    dt = pre.dt
    dbg = bg_i - pre.bg
    dba = ba_i - pre.ba
    r_iw = quat_to_matrix(quat_inverse(q_i))  # rotate world->body_i

    dp_corr = pre.dp + pre.j_p_bg @ dbg + pre.j_p_ba @ dba
    dv_corr = pre.dv + pre.j_v_bg @ dbg + pre.j_v_ba @ dba
    dq_corr = quat_multiply(pre.dq, so3_exp(pre.j_q_bg @ dbg))

    r_p = r_iw @ (p_j - p_i - v_i * dt - 0.5 * gravity * dt * dt) - dp_corr
    r_v = r_iw @ (v_j - v_i - gravity * dt) - dv_corr
    r_q = so3_log(quat_multiply(quat_inverse(dq_corr),
                                quat_multiply(quat_inverse(q_i), q_j)))
    r_pqv = pre.sqrt_info @ jnp.concatenate([r_p, r_q, r_v])
    r_bias = jnp.concatenate([bg_j - bg_i, ba_j - ba_i]) * weight_bias
    return jnp.concatenate([r_pqv, r_bias])


def bias_corrected(pre: Preintegrated, bg: jax.Array,
                   ba: jax.Array) -> Preintegrated:
    """First-order re-linearization of the deltas at a new bias pair (the
    same Jacobian correction `imu_residual` applies in-residual) — used when
    a consumer needs the deltas themselves at an updated bias, e.g. the VI
    initializer's linear alignment after gyro-bias calibration."""
    dbg = bg - pre.bg
    dba = ba - pre.ba
    return pre._replace(
        dp=pre.dp + pre.j_p_bg @ dbg + pre.j_p_ba @ dba,
        dv=pre.dv + pre.j_v_bg @ dbg + pre.j_v_ba @ dba,
        dq=quat_normalize(quat_multiply(pre.dq, so3_exp(pre.j_q_bg @ dbg))),
        bg=bg, ba=ba)
