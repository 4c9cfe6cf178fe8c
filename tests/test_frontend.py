import numpy as np
import pytest

from cvids_tpu.io import render, synthetic
from cvids_tpu.utils.config import AgentConfig, CameraConfig
from cvids_tpu.utils.metrics import ate_rmse
from cvids_tpu.vio.frontend import AgentFrontend


@pytest.mark.slow
def test_frontend_tracks_trajectory(rng):
    # small camera for speed
    cam_cfg = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                           k1=0.0, k2=0.0, p1=0.0, p2=0.0,
                           width=320, height=240)
    cfg = AgentConfig(camera=cam_cfg, fast_threshold=12.0,
                      min_feature_dist=24, max_solver_iterations=10)
    fe = AgentFrontend(cfg, client_id=0)

    # speed-modulated circle: constant-rate circular motion is a VI scale
    # degeneracy (body-frame-constant centripetal acceleration is
    # indistinguishable from an acc bias; see Trajectory.circle docstring)
    traj = synthetic.Trajectory.circle(radius=4.0, omega=0.35,
                                       height_amp=0.2,
                                       speed_mod=0.3, speed_mod_freq=0.9)
    duration, kf_rate, imu_rate = 6.0, 2.0, 200.0
    seq = synthetic.generate_sequence(traj, duration=duration, kf_rate=kf_rate,
                                      imu_rate=imu_rate, num_landmarks=0,
                                      gyr_noise=0.0005, acc_noise=0.01,
                                      bg=(0.001, -0.001, 0.0005),
                                      ba=(0.005, -0.01, 0.02))
    # dense blob field in front of the trajectory
    n_lm = 400
    landmarks = np.stack([
        rng.uniform(-12, 12, n_lm), rng.uniform(-12, 12, n_lm),
        rng.uniform(0.0, 3.5, n_lm)], -1)
    intens = rng.uniform(80, 200, n_lm)
    r_cb = np.asarray(cfg.r_cb, np.float32)
    p_bc = np.asarray(cfg.p_bc, np.float32)

    from cvids_tpu.geometry import quat_to_matrix
    import jax.numpy as jnp

    g, a, dt, vmask = synthetic.imu_slices(seq)
    packets = []
    est, gt = [], []
    k = len(seq.times_kf)
    for i in range(k):
        r_wb = np.asarray(quat_to_matrix(jnp.asarray(seq.q_gt[i], jnp.float32)))
        img = render.render_blobs(fe.cam, landmarks, intens, r_wb, seq.p_gt[i],
                                  r_cb, p_bc)
        if i == 0:
            pkt = fe.process_keyframe(seq.times_kf[i], img,
                                      np.zeros((0, 3)), seq.acc[:5], np.zeros(0))
        else:
            sel = vmask[i - 1]
            pkt = fe.process_keyframe(seq.times_kf[i], img,
                                      g[i - 1][sel], a[i - 1][sel], dt[i - 1][sel])
        if pkt is not None:
            packets.append(pkt)
            est.append(pkt.p_wb)
            gt.append(seq.p_gt[i])

    # packets start once the visual-inertial bootstrap locks (~frame 4) and
    # the publish warm-up passes; every frame after that must emit
    assert fe.vi_initialized, "VI bootstrap never locked"
    assert len(packets) >= k - 7, "frontend failed to initialize"
    est = np.asarray(est)
    gt = np.asarray(gt)
    from cvids_tpu.utils.metrics import umeyama
    err = ate_rmse(est, gt, align="sim3")
    assert err < 0.25, err
    s, _, _ = umeyama(est, gt, with_scale=True)
    assert 0.5 < s < 2.0, s  # metric scale recovered to the right ballpark
    # packets carry usable content
    last = packets[-1]
    # this scene is deliberately sparse (400 landmarks, min_dist 24): the
    # geometry-gated packet still must carry a usable handful of 3-D points
    assert last.win_pts3d.shape[0] >= 5
    assert last.ext_desc.shape[1] == 8
    assert last.win_desc.dtype == np.uint32


def test_fisheye_mask_gates_features():
    """`fisheye: 1` image-circle mask (the reference's fisheye_mask.jpg
    contract, euroc_config.yaml:41): features outside the circle die."""
    from cvids_tpu.utils.config import AgentConfig, CameraConfig
    from cvids_tpu.vio.frontend import AgentFrontend

    cam = CameraConfig(fx=150.0, fy=150.0, cx=160.0, cy=120.0,
                       width=320, height=240)
    fe = AgentFrontend(AgentConfig(camera=cam, fisheye=True))
    # radius = min(cx, cy, w-cx, h-cy) = 120
    fe.feat_xy[:4] = [[160, 120], [30, 120], [160, 230], [310, 10]]
    fe.feat_valid[:4] = True
    fe._apply_fisheye_mask()
    assert list(fe.feat_valid[:4]) == [True, False, True, False]
    # off by default
    fe2 = AgentFrontend(AgentConfig(camera=cam))
    fe2.feat_xy[:1] = [[5, 5]]
    fe2.feat_valid[:1] = True
    fe2._apply_fisheye_mask()
    assert fe2.feat_valid[0]
