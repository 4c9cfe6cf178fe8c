#!/usr/bin/env python
"""Reproduce test_frontend scene; trace bootstrap gates."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cvids_tpu.io import render, synthetic
from cvids_tpu.utils.config import AgentConfig, CameraConfig
from cvids_tpu.vio.frontend import AgentFrontend
from cvids_tpu.vio import initializer as vi_init
from cvids_tpu.vio import imu as imu_mod
from cvids_tpu.geometry import quat_to_matrix

rng = np.random.default_rng(1234)
cam_cfg = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                       k1=0.0, k2=0.0, p1=0.0, p2=0.0, width=320, height=240)
cfg = AgentConfig(camera=cam_cfg, fast_threshold=12.0,
                  min_feature_dist=24, max_solver_iterations=10)
fe = AgentFrontend(cfg, client_id=0)
traj = synthetic.Trajectory.circle(radius=4.0, omega=0.35, height_amp=0.2,
                                   speed_mod=0.3, speed_mod_freq=0.9)
seq = synthetic.generate_sequence(traj, duration=6.0, kf_rate=2.0,
                                  imu_rate=200.0, num_landmarks=0,
                                  gyr_noise=0.0005, acc_noise=0.01,
                                  bg=(0.001, -0.001, 0.0005),
                                  ba=(0.005, -0.01, 0.02))
n_lm = 400
landmarks = np.stack([rng.uniform(-12, 12, n_lm), rng.uniform(-12, 12, n_lm),
                      rng.uniform(0.0, 3.5, n_lm)], -1)
intens = rng.uniform(80, 200, n_lm)
r_cb = np.asarray(cfg.r_cb, np.float32)
p_bc = np.asarray(cfg.p_bc, np.float32)

# instrument _try_vi_bootstrap
orig = AgentFrontend._try_vi_bootstrap
def traced(self):
    present = [p_ for p_ in self.pre_list if p_ is not None]
    print(f"    boot attempt: present={len(present)} n_in_window={self.n_in_window}")
    w = self.WINDOW
    if len(present) < 3:
        print("    -> too few preints"); return
    valid = np.array([p_ is not None for p_ in self.pre_list[:w - 1]])
    dummy = present[0]
    pres = [p_ if p_ is not None else dummy for p_ in self.pre_list[:w - 1]]
    pre = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
    kf_ok = np.asarray(self.state.kf_valid)
    valid &= kf_ok[:-1] & kf_ok[1:]
    if valid.sum() < 3:
        print("    -> too few valid intervals"); return
    bg = vi_init.calibrate_gyro_bias(self.state.q, pre, jnp.asarray(valid))
    print(f"    bg={np.asarray(bg)}")
    if not np.isfinite(np.asarray(bg)).all() or float(jnp.linalg.norm(bg)) > 0.5:
        print("    -> bg gate"); return
    pre_c = jax.vmap(lambda p_: imu_mod.bias_corrected(p_, bg, jnp.zeros(3)))(pre)
    res = vi_init.linear_alignment(self.state.p, self.state.q, pre_c,
                                   jnp.asarray(valid))
    print(f"    s={float(res.scale):.3f} ok={bool(res.ok)} g={np.asarray(res.gravity)}")
    orig(self)

AgentFrontend._try_vi_bootstrap = traced
g, a, dt, vmask = synthetic.imu_slices(seq)
k = len(seq.times_kf)
for i in range(k):
    r_wb = np.asarray(quat_to_matrix(jnp.asarray(seq.q_gt[i], jnp.float32)))
    img = render.render_blobs(fe.cam, landmarks, intens, r_wb, seq.p_gt[i],
                              r_cb, p_bc)
    if i == 0:
        pkt = fe.process_keyframe(seq.times_kf[i], img, np.zeros((0, 3)),
                                  seq.acc[:5], np.zeros(0))
    else:
        sel = vmask[i - 1]
        pkt = fe.process_keyframe(seq.times_kf[i], img, g[i - 1][sel],
                                  a[i - 1][sel], dt[i - 1][sel])
    print(f"f{i:02d} tracked={fe.feat_valid.sum()} "
          f"lm={int(np.asarray(fe.state.lm_valid).sum())} vi={fe.vi_initialized}")
