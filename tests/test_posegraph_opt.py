import jax.numpy as jnp
import numpy as np

from cvids_tpu.geometry import wrap_angle
from cvids_tpu.server import optimizer as opt


def simulate_drifting_chain(rng, n=60, drift_yaw=0.002, drift_t=0.02):
    """Ground-truth circle + odometry with accumulating noise."""
    ang = np.linspace(0, 2 * np.pi, n)
    t_gt = np.stack([5 * np.cos(ang), 5 * np.sin(ang), 0.2 * np.sin(2 * ang)], -1)
    yaw_gt = np.unwrap(ang + np.pi / 2)
    # odometry measurements (exact relative) then integrate with noise
    yaw_est = np.zeros(n)
    t_est = np.zeros((n, 3))
    yaw_est[0] = yaw_gt[0]
    t_est[0] = t_gt[0]
    for k in range(1, n):
        dyaw = yaw_gt[k] - yaw_gt[k - 1] + rng.normal(0, drift_yaw)
        r_prev = np.array([[np.cos(yaw_gt[k - 1]), -np.sin(yaw_gt[k - 1]), 0],
                           [np.sin(yaw_gt[k - 1]), np.cos(yaw_gt[k - 1]), 0],
                           [0, 0, 1]])
        dt_local = r_prev.T @ (t_gt[k] - t_gt[k - 1]) + rng.normal(0, drift_t, 3)
        r_est = np.array([[np.cos(yaw_est[k - 1]), -np.sin(yaw_est[k - 1]), 0],
                          [np.sin(yaw_est[k - 1]), np.cos(yaw_est[k - 1]), 0],
                          [0, 0, 1]])
        yaw_est[k] = yaw_est[k - 1] + dyaw
        t_est[k] = t_est[k - 1] + r_est @ dt_local
    return yaw_gt, t_gt, yaw_est, t_est


def test_pose_graph_closes_loop(rng):
    n = 60
    yaw_gt, t_gt, yaw_est, t_est = simulate_drifting_chain(rng, n)
    drift_end = np.linalg.norm(t_est[-1] - t_gt[-1])
    assert drift_end > 0.1  # the problem is non-trivial

    nodes = opt.PoseGraphNodes(
        yaw=jnp.asarray(yaw_est, jnp.float32),
        pr=jnp.zeros((n, 2), jnp.float32),
        t=jnp.asarray(t_est, jnp.float32),
        valid=jnp.ones(n, bool),
        fixed=jnp.arange(n) == 0)

    # sequential edges from the (noisy) estimated trajectory = odometry
    seq = opt.make_sequential_edges(nodes.yaw, nodes.pr, nodes.t,
                                    jnp.zeros(n, jnp.int32), nodes.valid)
    # loop edges: exact relative pose between far-apart ground-truth nodes
    li = np.array([0, 5, 10], np.int32)
    lj = np.array([n - 1, n - 5, n - 10], np.int32)
    t_ij = []
    yaw_ij = []
    for a, b in zip(li, lj):
        r_a = np.array([[np.cos(yaw_gt[a]), -np.sin(yaw_gt[a]), 0],
                        [np.sin(yaw_gt[a]), np.cos(yaw_gt[a]), 0], [0, 0, 1]])
        t_ij.append(r_a.T @ (t_gt[b] - t_gt[a]))
        yaw_ij.append(yaw_gt[b] - yaw_gt[a])
    ne = len(li)
    loops = opt.PoseGraphEdges(
        i=jnp.asarray(li), j=jnp.asarray(lj),
        t_ij=jnp.asarray(np.stack(t_ij), jnp.float32),
        yaw_ij=jnp.asarray(np.asarray(yaw_ij), jnp.float32),
        t_weight=jnp.full(ne, 5.0, jnp.float32),
        yaw_weight=jnp.full(ne, 5.0, jnp.float32),
        valid=jnp.ones(ne, bool),
        huber=jnp.full(ne, jnp.inf, jnp.float32))

    edges = opt.PoseGraphEdges(*[jnp.concatenate([a, b]) for a, b in zip(seq, loops)])
    out = opt.optimize_pose_graph(nodes, edges, lm_iters=15, cg_iters=60)

    err_t = np.linalg.norm(np.asarray(out.t) - t_gt, axis=1)
    err_t0 = np.linalg.norm(t_est - t_gt, axis=1)
    assert err_t.mean() < 0.5 * err_t0.mean(), (err_t.mean(), err_t0.mean())
    # endpoints pulled together hard (loop edge is exact)
    assert np.linalg.norm(np.asarray(out.t)[-1] - t_gt[-1]) < 0.1 * drift_end


def test_edges_zero_residual_at_consistent_config(rng):
    n = 10
    yaw = jnp.asarray(rng.uniform(-3, 3, n), jnp.float32)
    pr = jnp.asarray(rng.uniform(-0.2, 0.2, (n, 2)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    nodes = opt.PoseGraphNodes(yaw, pr, t, jnp.ones(n, bool), jnp.zeros(n, bool))
    edges = opt.make_sequential_edges(yaw, pr, t, jnp.zeros(n, jnp.int32),
                                      jnp.ones(n, bool))
    r = opt.edge_residuals(nodes, edges)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)


def test_invalid_and_fixed_nodes_untouched(rng):
    n = 20
    yaw_gt, t_gt, yaw_est, t_est = simulate_drifting_chain(rng, n)
    valid = np.ones(n, bool)
    valid[15:] = False
    nodes = opt.PoseGraphNodes(
        yaw=jnp.asarray(yaw_est, jnp.float32), pr=jnp.zeros((n, 2), jnp.float32),
        t=jnp.asarray(t_est, jnp.float32), valid=jnp.asarray(valid),
        fixed=jnp.arange(n) == 0)
    edges = opt.make_sequential_edges(nodes.yaw, nodes.pr, nodes.t,
                                      jnp.zeros(n, jnp.int32), nodes.valid)
    out = opt.optimize_pose_graph(nodes, edges, lm_iters=3, cg_iters=10)
    np.testing.assert_allclose(np.asarray(out.t)[15:], t_est[15:], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.t)[0], t_est[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.yaw)[0], yaw_est[0], atol=1e-6)


def test_jacobians_match_autodiff(rng):
    import jax
    n = 8
    yaw = jnp.asarray(rng.uniform(-2, 2, n), jnp.float32)
    pr = jnp.asarray(rng.uniform(-0.3, 0.3, (n, 2)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    nodes = opt.PoseGraphNodes(yaw, pr, t, jnp.ones(n, bool), jnp.zeros(n, bool))
    e = 5
    edges = opt.PoseGraphEdges(
        i=jnp.asarray(rng.integers(0, n, e), jnp.int32),
        j=jnp.asarray(rng.integers(0, n, e), jnp.int32),
        t_ij=jnp.asarray(rng.normal(size=(e, 3)), jnp.float32),
        yaw_ij=jnp.asarray(rng.normal(size=e), jnp.float32),
        t_weight=jnp.asarray(rng.uniform(0.5, 2, e), jnp.float32),
        yaw_weight=jnp.asarray(rng.uniform(0.5, 2, e), jnp.float32),
        valid=jnp.ones(e, bool), huber=jnp.full(e, jnp.inf, jnp.float32))

    # autodiff J v against hand-coded _jvp (no huber so scales are constant)
    def res(yaw_, t_):
        return opt.edge_residuals(nodes._replace(yaw=yaw_, t=t_), edges)

    dyaw = jnp.asarray(rng.normal(size=n), jnp.float32)
    dt = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    _, jv_ad = jax.jvp(res, (yaw, t), (dyaw, dt))
    jt_ti, jt_tj, jt_yi = opt._edge_jacobians(nodes, edges)
    st, sy = opt._row_scales(nodes, edges)
    jv_manual = opt._jvp(nodes, edges, jt_ti, jt_tj, jt_yi, st, sy, dyaw, dt)
    np.testing.assert_allclose(np.asarray(jv_ad), np.asarray(jv_manual),
                               rtol=1e-4, atol=1e-4)
