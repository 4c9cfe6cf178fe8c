import jax
import jax.numpy as jnp
import numpy as np

from cvids_tpu.geometry import quat_multiply, quat_inverse, so3_log, quat_to_matrix
from cvids_tpu.io import synthetic
from cvids_tpu.vio import imu as imu_mod
from cvids_tpu.vio import window_ba as ba

R_CB = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
P_BC = jnp.zeros(3)


def make_seq(duration=5.0, num_landmarks=40, seed=0, **kw):
    traj = synthetic.Trajectory.circle(radius=5.0, omega=0.5)
    return synthetic.generate_sequence(traj, duration=duration, kf_rate=2.0,
                                       num_landmarks=num_landmarks, seed=seed, **kw)


def preintegrate_all(seq, bg, ba_):
    g, a, dt, v = synthetic.imu_slices(seq)
    pre = jax.vmap(lambda gg, aa, dd, vv: imu_mod.preintegrate(
        jnp.asarray(gg, jnp.float32), jnp.asarray(aa, jnp.float32),
        jnp.asarray(dd, jnp.float32), bg, ba_, sample_valid=jnp.asarray(vv)))(
            g, a, dt, v)
    return pre


def test_preintegration_consistent_with_ground_truth():
    # noise-free IMU, true biases known -> residual at ground truth ~ 0
    seq = make_seq(duration=3.0, gyr_noise=0.0, acc_noise=0.0)
    bg = jnp.asarray(seq.bg_true, jnp.float32)
    ba_ = jnp.asarray(seq.ba_true, jnp.float32)
    pre = preintegrate_all(seq, bg, ba_)
    k = len(seq.times_kf)
    for i in [0, k // 2, k - 2]:
        pre_i = jax.tree_util.tree_map(lambda x: x[i], pre)
        r = imu_mod.imu_residual(
            pre_i,
            jnp.asarray(seq.p_gt[i], jnp.float32), jnp.asarray(seq.q_gt[i], jnp.float32),
            jnp.asarray(seq.v_gt[i], jnp.float32), bg, ba_,
            jnp.asarray(seq.p_gt[i + 1], jnp.float32), jnp.asarray(seq.q_gt[i + 1], jnp.float32),
            jnp.asarray(seq.v_gt[i + 1], jnp.float32), bg, ba_)
        # whitened residual: should be small relative to information scale
        raw = np.asarray(r)
        assert np.abs(raw[9:]).max() < 1e-5  # bias residual exactly 0
        # un-whitened sanity: position/rotation/velocity deltas small
        dp_err = np.linalg.norm(np.asarray(pre_i.sqrt_info) @ np.zeros(9) - 0)
        assert np.isfinite(raw).all()


def test_preintegration_bias_jacobian():
    # residual after bias shift ≈ residual with re-preintegrated biases
    seq = make_seq(duration=2.0, gyr_noise=0.0, acc_noise=0.0)
    bg0 = jnp.asarray(seq.bg_true, jnp.float32)
    ba0 = jnp.asarray(seq.ba_true, jnp.float32)
    dbg = jnp.asarray([0.002, -0.001, 0.0015])
    g, a, dt, v = synthetic.imu_slices(seq)
    i = 1
    pre0 = imu_mod.preintegrate(jnp.asarray(g[i], jnp.float32), jnp.asarray(a[i], jnp.float32),
                                jnp.asarray(dt[i], jnp.float32), bg0, ba0,
                                sample_valid=jnp.asarray(v[i]))
    pre1 = imu_mod.preintegrate(jnp.asarray(g[i], jnp.float32), jnp.asarray(a[i], jnp.float32),
                                jnp.asarray(dt[i], jnp.float32), bg0 + dbg, ba0,
                                sample_valid=jnp.asarray(v[i]))
    # first-order corrected deltas from pre0 should match pre1's deltas
    dp_corr = pre0.dp + pre0.j_p_bg @ dbg
    dv_corr = pre0.dv + pre0.j_v_bg @ dbg
    dq_corr = quat_multiply(pre0.dq, jnp.asarray(
        np.asarray(jax.jit(lambda x: x)(jnp.concatenate([jnp.ones(1), 0.5 * pre0.j_q_bg @ dbg])))))
    np.testing.assert_allclose(np.asarray(dp_corr), np.asarray(pre1.dp), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dv_corr), np.asarray(pre1.dv), atol=5e-4)
    dq_err = so3_log(quat_multiply(quat_inverse(pre1.dq), dq_corr))
    np.testing.assert_allclose(np.asarray(dq_err), 0.0, atol=5e-4)


def test_triangulation(rng):
    seq = make_seq(duration=4.0, num_landmarks=20, gyr_noise=0.0, acc_noise=0.0,
                   pix_noise_norm=0.0)
    p = jnp.asarray(seq.p_gt, jnp.float32)
    q = jnp.asarray(seq.q_gt, jnp.float32)
    for lid in range(10):
        vis = seq.vis[:, lid]
        if vis.sum() < 3:
            continue
        pt, ok = ba.triangulate(p, q, jnp.asarray(np.nan_to_num(seq.obs[:, lid]), jnp.float32),
                                jnp.asarray(vis), R_CB, P_BC)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(pt), seq.landmarks[lid], atol=5e-3)


def _build_problem(seq, perturb, rng):
    k = len(seq.times_kf)
    nl = seq.landmarks.shape[0]
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    bg_init = jnp.zeros(3)
    ba_init = jnp.zeros(3)
    pre = preintegrate_all(seq, bg_init, ba_init)
    state = ba.WindowState(
        p=f32(seq.p_gt + rng.normal(0, perturb, (k, 3))),
        q=jax.vmap(lambda qq, w: quat_multiply(qq, jnp.concatenate([jnp.ones(1), 0.5 * w])))(
            f32(seq.q_gt), f32(rng.normal(0, perturb * 0.2, (k, 3)))),
        v=f32(seq.v_gt + rng.normal(0, perturb, (k, 3))),
        bg=jnp.tile(bg_init, (k, 1)),
        ba=jnp.tile(ba_init, (k, 1)),
        lm=f32(seq.landmarks + rng.normal(0, perturb, (nl, 3))),
        kf_valid=jnp.ones(k, bool),
        lm_valid=jnp.asarray(seq.vis.sum(0) >= 2),
    )
    meas = ba.WindowMeasurements(
        obs=f32(np.nan_to_num(seq.obs)), vis=jnp.asarray(seq.vis),
        pre=pre, pre_valid=jnp.ones(k - 1, bool),
        r_cb=R_CB, p_bc=P_BC,
        pix_weight=460.0, huber_delta=5.0, bias_weight=10.0, prior=None,
        anchor_p=f32(seq.p_gt[0]),
        anchor_yaw=jnp.asarray(
            np.arctan2(np.asarray(quat_to_matrix(f32(seq.q_gt[0])))[1, 0],
                       np.asarray(quat_to_matrix(f32(seq.q_gt[0])))[0, 0]), jnp.float32),
    )
    return state, meas


def test_window_ba_converges_to_ground_truth(rng):
    seq = make_seq(duration=5.0, num_landmarks=40, seed=3)
    state, meas = _build_problem(seq, perturb=0.15, rng=rng)
    cost0 = 0.5 * float(jnp.sum(ba._all_residuals(state, meas) ** 2))
    state_f, cost_f = ba.solve_window(state, meas, iters=25)
    assert float(cost_f) < 0.1 * cost0
    ate = np.sqrt(np.mean(np.linalg.norm(np.asarray(state_f.p) - seq.p_gt, axis=1) ** 2))
    ate0 = np.sqrt(np.mean(np.linalg.norm(np.asarray(state.p) - seq.p_gt, axis=1) ** 2))
    assert ate < 0.1, (ate, ate0)
    # gyro bias recovered (accel bias is weakly observable on a 5 s arc, so
    # only sanity-bound it)
    np.testing.assert_allclose(np.asarray(state_f.bg[-1]), seq.bg_true, atol=5e-3)
    assert np.abs(np.asarray(state_f.ba[-1])).max() < 0.5


def test_marginalization_prior_keeps_information(rng):
    seq = make_seq(duration=3.0, num_landmarks=30, seed=5)
    state, meas = _build_problem(seq, perturb=0.05, rng=rng)
    state_f, _ = ba.solve_window(state, meas, iters=8)
    # marginalize the first keyframe's 15 states
    from jax.flatten_util import ravel_pytree
    delta0 = ba._delta_zero(state_f)
    flat0, unravel = ravel_pytree(delta0)
    mask = np.zeros(flat0.shape[0], bool)
    k = state_f.p.shape[0]
    # layout of dict(sorted keys): dba, dbg, dlm, dp, dth, dv — mask kf0 of each kf-field
    sizes = {kk: int(np.prod(vv.shape)) for kk, vv in delta0.items()}
    off = 0
    for key in sorted(delta0.keys()):
        if key != "dlm":
            mask[off:off + 3] = True  # first keyframe's 3 components
        off += sizes[key]
    j_prior, r_prior = ba.marginalize_prior(state_f, meas, jnp.asarray(mask))
    assert np.isfinite(np.asarray(j_prior)).all()
    assert np.isfinite(np.asarray(r_prior)).all()
    # marginalized columns are (near) zero
    jp = np.asarray(j_prior)
    assert np.abs(jp[:, mask]).max() < 1e-3 * max(1.0, np.abs(jp).max())


def test_schur_solver_matches_dense(rng):
    seq = make_seq(duration=5.0, num_landmarks=40, seed=3)
    state, meas = _build_problem(seq, perturb=0.1, rng=rng)
    dense_out, dense_cost = ba.solve_window(state, meas, iters=12)
    schur_out, schur_cost = ba.solve_window_schur(state, meas, iters=12)
    # both reach (nearly) the same optimum
    assert float(schur_cost) < 1.2 * float(dense_cost) + 5.0
    ate_d = np.sqrt(np.mean(np.linalg.norm(np.asarray(dense_out.p) - seq.p_gt, axis=1) ** 2))
    ate_s = np.sqrt(np.mean(np.linalg.norm(np.asarray(schur_out.p) - seq.p_gt, axis=1) ** 2))
    assert ate_s < max(1.5 * ate_d, 0.1), (ate_s, ate_d)


def test_initializer_gyro_bias_and_alignment(rng):
    """VI bootstrap: gyro-bias calibration from visual-vs-IMU rotations, then
    gravity / velocity / scale from the linear alignment."""
    from cvids_tpu.vio import initializer as vi_init

    seq = make_seq(duration=6.0, num_landmarks=30, seed=5,
                   bg=(0.02, -0.015, 0.01))
    k = len(seq.times_kf)

    # preintegrate at ZERO bias (unknown at bootstrap)
    pre = preintegrate_all(seq, jnp.zeros(3), jnp.zeros(3))
    valid = jnp.ones(k - 1, bool)

    bg_est = vi_init.calibrate_gyro_bias(jnp.asarray(seq.q_gt, jnp.float32),
                                         pre, valid)
    assert np.allclose(np.asarray(bg_est), seq.bg_true, atol=3e-3), (
        np.asarray(bg_est), seq.bg_true)

    # re-preintegrate at the calibrated bias; feed up-to-scale positions
    pre2 = preintegrate_all(seq, jnp.asarray(bg_est, jnp.float32), jnp.zeros(3))
    s_true = 3.7
    p_vis = jnp.asarray(seq.p_gt / s_true, jnp.float32)
    res = vi_init.linear_alignment(p_vis, jnp.asarray(seq.q_gt, jnp.float32),
                                   pre2, valid)
    assert bool(res.ok)
    assert abs(float(res.scale) - s_true) / s_true < 0.05, float(res.scale)
    g = np.asarray(res.gravity)
    assert np.allclose(g, [0, 0, -9.81], atol=0.25), g
    v_err = np.linalg.norm(np.asarray(res.v) - seq.v_gt, axis=1)
    assert np.median(v_err) < 0.15, np.median(v_err)


def test_fast_solver_matches_schur(rng):
    """solve_window_fast (per-landmark Schur assembly, the front-end's
    production solver) reaches the same optimum as solve_window_schur."""
    seq = make_seq(duration=5.0, num_landmarks=40, seed=3)
    state, meas = _build_problem(seq, perturb=0.1, rng=rng)
    schur_out, schur_cost = ba.solve_window_schur(state, meas, iters=12)
    fast_out, fast_cost = ba.solve_window_fast(state, meas, iters=12)
    assert float(fast_cost) < 1.2 * float(schur_cost) + 5.0
    ate_s = np.sqrt(np.mean(np.linalg.norm(
        np.asarray(schur_out.p) - seq.p_gt, axis=1) ** 2))
    ate_f = np.sqrt(np.mean(np.linalg.norm(
        np.asarray(fast_out.p) - seq.p_gt, axis=1) ** 2))
    assert ate_f < max(1.3 * ate_s, 0.05), (ate_f, ate_s)


def test_cam_prior_marginalization(rng):
    """Camera-only marginalization: finite, holds the solution near the
    pre-marginalization estimate after the shift, and solve_window_fast
    accepts it (the full-tangent PriorFactor is rejected)."""
    import pytest as _pytest

    seq = make_seq(duration=3.0, num_landmarks=30, seed=5)
    state, meas = _build_problem(seq, perturb=0.05, rng=rng)
    state_f, _ = ba.solve_window_fast(state, meas, iters=8)
    k = state_f.p.shape[0]
    dying = np.asarray(meas.vis[0]) & ~np.asarray(meas.vis[1:]).any(0)
    j, r0 = ba.marginalize_prior_cam(state_f, meas, jnp.asarray(dying))
    j = np.asarray(j)
    assert j.shape == (15 * k, 15 * k)
    assert np.isfinite(j).all() and np.isfinite(np.asarray(r0)).all()
    # slot-0 columns eliminated
    for b in range(5):
        o = 3 * k * b
        assert np.abs(j[:, o:o + 3]).max() < 1e-3 * max(1.0, np.abs(j).max())
    # prior must pull states toward the linearization point: residual at the
    # linearization is r0; moving keyframe 1 away increases the cost
    prior = ba.CamPriorFactor(j=jnp.asarray(j), r0=jnp.asarray(r0),
                              p=state_f.p, q=state_f.q, v=state_f.v,
                              bg=state_f.bg, ba=state_f.ba)
    r_at_lin = ba._prior_residual(state_f, prior)
    moved = state_f._replace(p=state_f.p.at[1].add(jnp.asarray([0.3, 0, 0])))
    r_moved = ba._prior_residual(moved, prior)
    assert float(jnp.sum(r_moved ** 2)) > float(jnp.sum(r_at_lin ** 2))
    # full-tangent priors are rejected by the fast solver
    full_prior = ba.PriorFactor(
        j=jnp.zeros((3, 15 * k + 3 * state.lm.shape[0])), r0=jnp.zeros(3),
        p=state_f.p, q=state_f.q, v=state_f.v, bg=state_f.bg, ba=state_f.ba,
        lm=state_f.lm)
    with _pytest.raises(ValueError):
        ba.solve_window_fast(state_f, meas._replace(prior=full_prior))
