import jax
import jax.numpy as jnp
import numpy as np

from cvids_tpu.geometry import so3_exp, quat_to_matrix
from cvids_tpu.ops import ransac


def make_pnp_problem(rng, n=80, outlier_frac=0.3, noise=0.5 / 460.0):
    r = np.asarray(quat_to_matrix(so3_exp(jnp.asarray(rng.normal(size=3) * 0.3, dtype=jnp.float32))))
    t = rng.normal(size=3).astype(np.float32)
    pts = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    pts[:, 2] += 6.0  # in front after transform (t small)
    pc = pts @ r.T + t
    obs = pc[:, :2] / pc[:, 2:3]
    obs += rng.normal(size=obs.shape).astype(np.float32) * noise
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    obs[out_idx] += rng.uniform(0.1, 0.5, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return r, t, pts, obs.astype(np.float32), out_idx


def test_pnp_ransac_recovers_pose(rng):
    r_gt, t_gt, pts, obs, out_idx = make_pnp_problem(rng)
    res = ransac.pnp_ransac(
        jnp.asarray(pts), jnp.asarray(obs), jnp.ones(len(pts), bool),
        jax.random.PRNGKey(0))
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.r), r_gt, atol=2e-2)
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=5e-2)
    # outliers mostly rejected
    inl = np.asarray(res.inliers)
    assert inl[out_idx].mean() < 0.2
    assert inl.sum() >= 0.9 * (len(pts) - len(out_idx))


def test_pnp_ransac_fails_gracefully_on_garbage(rng):
    pts = rng.uniform(-2, 2, (40, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32)
    obs = rng.uniform(-0.5, 0.5, (40, 2)).astype(np.float32)
    res = ransac.pnp_ransac(jnp.asarray(pts), jnp.asarray(obs), jnp.ones(40, bool),
                            jax.random.PRNGKey(1))
    assert not bool(res.ok)


def test_pnp_respects_validity(rng):
    r_gt, t_gt, pts, obs, _ = make_pnp_problem(rng, outlier_frac=0.0)
    valid = np.ones(len(pts), bool)
    valid[50:] = False
    res = ransac.pnp_ransac(jnp.asarray(pts), jnp.asarray(obs), jnp.asarray(valid),
                            jax.random.PRNGKey(2))
    assert not np.asarray(res.inliers)[~valid].any()
    assert bool(res.ok)


def test_fundamental_ransac_epipolar(rng):
    # two views of a 3D scene
    r = np.asarray(quat_to_matrix(so3_exp(jnp.asarray([0.05, -0.1, 0.08], dtype=jnp.float32))))
    t = np.array([0.4, 0.1, 0.05], np.float32)
    pts = rng.uniform(-2, 2, (60, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    p1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ r.T + t
    p2 = pc2[:, :2] / pc2[:, 2:3]
    p1n = p1 + rng.normal(size=p1.shape).astype(np.float32) * 0.3 / 460
    p2n = p2 + rng.normal(size=p2.shape).astype(np.float32) * 0.3 / 460
    # inject outliers
    p2n[:10] += 0.2
    res = ransac.fundamental_ransac(jnp.asarray(p1n), jnp.asarray(p2n),
                                    jnp.ones(60, bool), jax.random.PRNGKey(3))
    inl = np.asarray(res.inliers)
    assert inl[10:].mean() > 0.85
    assert inl[:10].mean() < 0.3


def test_find_connection_cascade_rejects_planted_outliers(rng):
    """The full match->F-RANSAC->PnP cascade (`_match_and_pnp`) must reject
    planted wrong matches that pass the descriptor gates (they are exact
    descriptor duplicates of other features, so Hamming matching cannot see
    them) but violate the epipolar constraint — the role of the reference's
    FundmantalMatrixRANSAC stage (`server_keyframe.cpp:539`)."""
    from cvids_tpu.server.posegraph import _match_and_pnp

    n = 60
    # camera j (new): identity; camera i (old): rotated + translated
    r = np.asarray(quat_to_matrix(so3_exp(jnp.asarray([0.04, -0.08, 0.06],
                                                      dtype=jnp.float32))))
    t = np.array([0.5, 0.15, 0.1], np.float32)
    pts_cj = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pts_cj[:, 2] += 6.0
    win_uv = (pts_cj[:, :2] / pts_cj[:, 2:3]).astype(np.float32)
    pc_i = pts_cj @ r.T + t
    ext_uv = (pc_i[:, :2] / pc_i[:, 2:3]).astype(np.float32)
    ext_uv += rng.normal(size=ext_uv.shape).astype(np.float32) * 0.3 / 460

    # unique descriptors; pair k of window matches ext feature k
    desc = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    win_desc = desc.copy()
    ext_desc = desc.copy()
    # plant 18 wrong matches: window features 0..17 get the descriptors of
    # ext features 40..57, so they match confidently at the wrong location
    bad = np.arange(18)
    win_desc[bad] = desc[40 + bad]

    res, m, keep = _match_and_pnp(
        jnp.asarray(win_desc), jnp.ones(n, bool), jnp.asarray(win_uv),
        jnp.asarray(pts_cj), jnp.asarray(ext_desc), jnp.ones(n, bool),
        jnp.asarray(ext_uv), jax.random.PRNGKey(7), 10.0 / 460.0, 15)
    m_valid = np.asarray(m.valid)
    keep_np = np.asarray(keep)
    # descriptor stage alone accepted the planted matches...
    assert m_valid[bad].mean() > 0.9
    # ...the F stage rejects them while keeping the honest ones
    assert keep_np[bad].mean() < 0.2
    assert keep_np[18:].mean() > 0.8
    # and PnP still succeeds with an accurate pose on the survivors
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.r), r, atol=2e-2)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=5e-2)
