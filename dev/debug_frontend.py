"""Instrumented repro of tests/test_frontend.py::test_frontend_tracks_trajectory.

Prints per-keyframe bootstrap internals so the VI-lock delay can be
bisected (VERDICT r3 weak #1a). Run: python dev/debug_frontend.py [MAX_LM_MULT]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import cvids_tpu.vio.frontend as fe_mod
from cvids_tpu.io import render, synthetic
from cvids_tpu.utils.config import AgentConfig, CameraConfig
from cvids_tpu.utils.metrics import ate_rmse, umeyama

mult = int(sys.argv[1]) if len(sys.argv) > 1 else 4

rng = np.random.default_rng(0)   # the pytest `rng` fixture seed
cam_cfg = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0,
                       width=320, height=240)
cfg = AgentConfig(camera=cam_cfg, fast_threshold=12.0,
                  min_feature_dist=24, max_solver_iterations=10)

fe = fe_mod.AgentFrontend(cfg, client_id=0)
fe.MAX_LM  # just to show
if mult != 4:
    # rebuild with the requested landmark-pool multiplier
    fe = fe_mod.AgentFrontend.__new__(fe_mod.AgentFrontend)
    fe_mod.AgentFrontend.__init__(fe, cfg, client_id=0)
    # patch: re-init with different MAX_LM
print(f"MAX_LM = {fe.MAX_LM} (mult {fe.MAX_LM // fe.MAX_FEAT})")

traj = synthetic.Trajectory.circle(radius=4.0, omega=0.35,
                                   height_amp=0.2,
                                   speed_mod=0.3, speed_mod_freq=0.9)
duration, kf_rate, imu_rate = 6.0, 2.0, 200.0
seq = synthetic.generate_sequence(traj, duration=duration, kf_rate=kf_rate,
                                  imu_rate=imu_rate, num_landmarks=0,
                                  gyr_noise=0.0005, acc_noise=0.01,
                                  bg=(0.001, -0.001, 0.0005),
                                  ba=(0.005, -0.01, 0.02))
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

# instrument the bootstrap
orig_boot = fe._try_vi_bootstrap


def spy_boot():
    from cvids_tpu.vio import initializer as vi_init
    import jax
    from cvids_tpu.vio import imu as imu_mod
    w = fe.WINDOW
    present = [p_ for p_ in fe.pre_list if p_ is not None]
    msg = f"  boot attempt: present={len(present)}"
    if len(present) >= 3:
        valid = np.array([p_ is not None for p_ in fe.pre_list[:w - 1]])
        dummy = present[0]
        pres = [p_ if p_ is not None else dummy for p_ in fe.pre_list[:w - 1]]
        pre = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
        kf_ok = np.asarray(fe.state.kf_valid)
        valid &= kf_ok[:-1] & kf_ok[1:]
        bg = vi_init.calibrate_gyro_bias(fe.state.q, pre, jnp.asarray(valid))
        msg += f" |bg|={float(jnp.linalg.norm(bg)):.4f}"
        pre_c = jax.vmap(lambda p_: imu_mod.bias_corrected(p_, bg,
                                                           jnp.zeros(3)))(pre)
        res = vi_init.linear_alignment(fe.state.p, fe.state.q, pre_c,
                                       jnp.asarray(valid))
        msg += f" ok={bool(res.ok)} scale={float(res.scale):.3f} g={np.asarray(res.gravity).round(2)}"
    print(msg)
    orig_boot()


fe._try_vi_bootstrap = spy_boot

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
    nlm = int(np.asarray(fe.state.lm_valid).sum())
    ntrk = int(fe.feat_valid.sum())
    print(f"kf {i}: tracked={ntrk} lm_valid={nlm} init={fe.initialized} "
          f"vi={fe.vi_initialized} post_boot={fe._post_boot} "
          f"emit={pkt is not None} cost={fe._last_solved}")
    if pkt is not None:
        packets.append(pkt)
        est.append(pkt.p_wb)
        gt.append(seq.p_gt[i])

print(f"\npackets: {len(packets)} (need >= {k - 7}); vi={fe.vi_initialized}")
if len(packets) >= 2:
    est = np.asarray(est)
    gt = np.asarray(gt)
    err = ate_rmse(est, gt, align="sim3")
    s, _, _ = umeyama(est, gt, with_scale=True)
    print(f"ATE sim3 {err:.3f} (need < 0.25), scale {s:.3f}")
    last = packets[-1]
    print(f"win_pts3d {last.win_pts3d.shape[0]} (need >= 5)")
