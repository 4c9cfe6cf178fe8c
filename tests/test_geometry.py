import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvids_tpu.geometry import (
    Pose,
    between,
    compose,
    fourdof,
    g2r,
    inverse,
    matrix_to_quat,
    pose_from_matrix,
    pose_to_matrix,
    quat_from_axis_angle,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    r_to_ypr,
    rot_z,
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
    transform_points,
    wrap_angle,
    yaw_of,
    ypr_to_r,
)


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return np.asarray(quat_normalize(jnp.asarray(q)))


def test_quat_matrix_roundtrip(rng):
    q = random_quats(rng, 64)
    m = quat_to_matrix(jnp.asarray(q))
    q2 = matrix_to_quat(m)
    np.testing.assert_allclose(np.abs(np.sum(q * np.asarray(q2), axis=-1)), 1.0, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = jnp.asarray(random_quats(rng, 32))
    v = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    out1 = quat_rotate(q, v)
    out2 = jnp.einsum("nij,nj->ni", quat_to_matrix(q), v)
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_quat_multiply_composes(rng):
    q1 = jnp.asarray(random_quats(rng, 16))
    q2 = jnp.asarray(random_quats(rng, 16))
    v = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    np.testing.assert_allclose(
        quat_rotate(quat_multiply(q1, q2), v),
        quat_rotate(q1, quat_rotate(q2, v)),
        atol=1e-5,
    )


def test_so3_exp_log_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    np.testing.assert_allclose(so3_log(so3_exp(w)), w, atol=1e-4)
    # tiny angles
    w_small = w * 1e-6
    np.testing.assert_allclose(so3_log(so3_exp(w_small)), w_small, atol=1e-9)


def test_ypr_roundtrip(rng):
    ypr = jnp.asarray(
        np.stack(
            [
                rng.uniform(-3.0, 3.0, 40),
                rng.uniform(-1.2, 1.2, 40),  # pitch away from gimbal lock
                rng.uniform(-3.0, 3.0, 40),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    r = ypr_to_r(ypr)
    ypr2 = r_to_ypr(r)
    np.testing.assert_allclose(wrap_angle(ypr2 - ypr), 0.0, atol=1e-4)


def test_yaw_of_and_rotz(rng):
    yaw = jnp.asarray(rng.uniform(-3, 3, 16).astype(np.float32))
    np.testing.assert_allclose(yaw_of(rot_z(yaw)), yaw, atol=1e-5)


def test_pose_compose_inverse(rng):
    q = jnp.asarray(random_quats(rng, 8))
    t = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    p = Pose(q, t)
    ident = compose(p, inverse(p))
    np.testing.assert_allclose(ident.t, 0.0, atol=1e-5)
    np.testing.assert_allclose(jnp.abs(ident.q[:, 0]), 1.0, atol=1e-5)


def test_pose_matrix_roundtrip(rng):
    p = Pose(jnp.asarray(random_quats(rng, 8)), jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)))
    p2 = pose_from_matrix(pose_to_matrix(p))
    np.testing.assert_allclose(p.t, p2.t, atol=1e-5)
    np.testing.assert_allclose(jnp.abs(jnp.sum(p.q * p2.q, -1)), 1.0, atol=1e-5)


def test_between_and_transform_points(rng):
    a = Pose(jnp.asarray(random_quats(rng, 1))[0], jnp.asarray(rng.normal(size=3).astype(np.float32)))
    b = Pose(jnp.asarray(random_quats(rng, 1))[0], jnp.asarray(rng.normal(size=3).astype(np.float32)))
    rel = between(a, b)
    np.testing.assert_allclose(compose(a, rel).t, b.t, atol=1e-5)
    pts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    out = transform_points(a, pts)
    np.testing.assert_allclose(out, quat_rotate(a.q[None], pts) + a.t[None], atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(30, 6)).astype(np.float32) * 0.8)
    np.testing.assert_allclose(se3_log(se3_exp(xi)), xi, atol=2e-4)


def test_g2r_aligns_gravity(rng):
    g = jnp.asarray(rng.normal(size=(12, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32))
    r = g2r(g)
    aligned = jnp.einsum("nij,nj->ni", r, g / jnp.linalg.norm(g, axis=-1, keepdims=True))
    np.testing.assert_allclose(aligned[:, :2], 0.0, atol=1e-5)
    np.testing.assert_allclose(aligned[:, 2], 1.0, atol=1e-5)
    np.testing.assert_allclose(yaw_of(r), 0.0, atol=1e-5)


def test_fourdof_edge_zero_residual(rng):
    # residual of an edge measured from the same poses must vanish
    yaw_i = jnp.asarray(0.3)
    yaw_j = jnp.asarray(-1.2)
    pr_i = jnp.asarray([0.1, -0.2])
    t_i = jnp.asarray([1.0, 2.0, 3.0])
    t_j = jnp.asarray([-1.0, 0.5, 2.0])
    t_ij, yaw_ij = fourdof.relative_edge(yaw_i, pr_i, t_i, yaw_j, t_j)
    res = fourdof.edge_residual(yaw_i, pr_i, t_i, yaw_j, t_j, t_ij, yaw_ij)
    np.testing.assert_allclose(res, 0.0, atol=1e-6)


def test_fourdof_drift(rng):
    yaw = jnp.asarray(rng.uniform(-3, 3, 5).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    yd = jnp.asarray(0.7, dtype=jnp.float32)
    td = jnp.asarray([1.0, -1.0, 0.5], dtype=jnp.float32)
    yaw2, t2 = fourdof.apply_drift(yd, td, yaw, t)
    np.testing.assert_allclose(wrap_angle(yaw2 - yaw - yd), 0.0, atol=1e-5)
    np.testing.assert_allclose(t2, jnp.einsum("ij,nj->ni", rot_z(yd), t) + td, atol=1e-5)


def test_jit_and_vmap_compat(rng):
    q = jnp.asarray(random_quats(rng, 4))
    f = jax.jit(lambda q: so3_log(quat_multiply(q, q)))
    np.testing.assert_allclose(f(q), so3_log(quat_multiply(q, q)), atol=1e-6)
    g = jax.vmap(quat_to_matrix)
    assert g(q).shape == (4, 3, 3)


def test_hostmath_twins_match_jnp(rng):
    """NumPy host-side twins must agree with the jnp geometry exactly."""
    import jax.numpy as jnp

    from cvids_tpu import geometry as g
    from cvids_tpu.geometry import hostmath as hm

    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qj = jnp.asarray(q, jnp.float32)
    np.testing.assert_allclose(hm.quat_to_matrix_np(q),
                               np.asarray(g.quat_to_matrix(qj)), atol=1e-5)
    np.testing.assert_allclose(hm.yaw_of_quat_np(q),
                               np.asarray(g.yaw_of(qj)), atol=1e-5)
    m = hm.quat_to_matrix_np(q)
    np.testing.assert_allclose(hm.r_to_ypr_np(m),
                               np.asarray(g.r_to_ypr(jnp.asarray(m, jnp.float32))),
                               atol=1e-5)
    ypr = rng.uniform(-1.4, 1.4, size=(32, 3))
    np.testing.assert_allclose(hm.ypr_to_r_np(ypr),
                               np.asarray(g.ypr_to_r(jnp.asarray(ypr, jnp.float32))),
                               atol=1e-5)
    yaw = rng.uniform(-4, 4, size=32)
    np.testing.assert_allclose(hm.rot_z_np(yaw),
                               np.asarray(g.rot_z(jnp.asarray(yaw, jnp.float32))),
                               atol=1e-5)
    a = rng.uniform(-12, 12, size=128)
    np.testing.assert_allclose(hm.wrap_angle_np(a),
                               np.asarray(g.wrap_angle(jnp.asarray(a))),
                               atol=1e-5)
    # matrix_to_quat up to sign
    qr = hm.matrix_to_quat_np(m)
    qr_j = np.asarray(g.matrix_to_quat(jnp.asarray(m, jnp.float32)))
    sign = np.where(np.sum(qr * qr_j, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    np.testing.assert_allclose(qr, qr_j * sign, atol=1e-5)
