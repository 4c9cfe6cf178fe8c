import jax.numpy as jnp
import numpy as np

from cvids_tpu.server import pcm


def test_chain_cov_grows_with_distance(rng):
    n = 50
    ts = np.cumsum(rng.normal(0, 0.3, (n, 3)), axis=0).astype(np.float32)
    pose = pcm.FourDof(jnp.zeros(n), jnp.asarray(ts))
    r_id = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    cov, vy = pcm.chain_cov(pose, jnp.asarray([0, 0]), jnp.asarray([5, 40]),
                            0.02, 0.005, r_id)
    # longer chain => strictly larger covariance trace & yaw variance
    tr = np.trace(np.asarray(cov), axis1=-2, axis2=-1)
    assert tr[1] > tr[0]
    assert float(vy[1]) > float(vy[0])
    # symmetric positive definite
    w = np.linalg.eigvalsh(np.asarray(cov))
    assert (w > 0).all()


def test_chain_cov_matches_bruteforce(rng):
    """Prefix-sum M must equal the direct sum over the chain."""
    n = 30
    ts = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    pose = pcm.FourDof(jnp.zeros(n), jnp.asarray(ts))
    a, b = 4, 21
    r_id = jnp.eye(3)[None]
    cov, vy = pcm.chain_cov(pose, jnp.asarray([a]), jnp.asarray([b]),
                            0.0, 1.0, r_id)  # pure yaw-term => isolates M
    t_b = ts[b]
    m_direct = sum(np.outer(t_b - ts[k], t_b - ts[k]) for k in range(a, b))
    zhat = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 0]])
    expected = zhat @ m_direct @ zhat.T
    np.testing.assert_allclose(np.asarray(cov[0]), expected, rtol=1e-3,
                               atol=1e-3)


def test_pcm_with_chain_whitening_filters_outliers(rng):
    """End-to-end: chain-covariance whitening keeps good edges and rejects
    corrupted ones on a realistic two-client layout."""
    n_nodes = 60
    # client trajectories
    ta = np.cumsum(rng.normal(0, 0.2, (n_nodes, 3)), 0).astype(np.float32)
    tb = np.cumsum(rng.normal(0, 0.2, (n_nodes, 3)), 0).astype(np.float32)
    chain_a = pcm.FourDof(jnp.zeros(n_nodes), jnp.asarray(ta))
    chain_b = pcm.FourDof(jnp.zeros(n_nodes), jnp.asarray(tb))
    yaw_ab, t_ab = 0.5, np.array([1.0, 2.0, 0.0], np.float32)

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    e = 24
    idx_i = rng.integers(0, n_nodes, e)
    idx_j = rng.integers(0, n_nodes, e)
    edge_yaw = np.full(e, yaw_ab, np.float32)
    edge_t = np.zeros((e, 3), np.float32)
    for k in range(e):
        tj_a = rz(yaw_ab) @ tb[idx_j[k]] + t_ab
        edge_t[k] = tj_a - ta[idx_i[k]]
        edge_yaw[k] = yaw_ab
    # corrupt the last 6
    edge_t[-6:] += rng.uniform(1.5, 3.0, (6, 3)).astype(np.float32)
    edge_T = pcm.FourDof(jnp.asarray(edge_yaw), jnp.asarray(edge_t))
    pose_i = pcm.FourDof(jnp.zeros(e), jnp.asarray(ta[idx_i]))
    pose_j = pcm.FourDof(jnp.zeros(e), jnp.asarray(tb[idx_j]))
    chain = (chain_a, jnp.asarray(idx_i), chain_b, jnp.asarray(idx_j),
             0.02, 0.005)
    keep = pcm.pcm_filter(edge_T, pose_i, pose_j, np.ones(e, bool),
                          min_edges=10, sigma_t=0.05, sigma_yaw=0.02,
                          gamma=5.0, chain=chain)
    assert keep[:-6].mean() > 0.8, keep
    assert not keep[-6:].any(), keep
