#!/usr/bin/env python
"""Scale observability test: agent VIO on a speed-modulated circle."""
import os, sys, tempfile
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cvids_tpu.io import euroc, euroc_synth, synthetic
from cvids_tpu.utils.config import AgentConfig, CameraConfig
from cvids_tpu.utils.metrics import ate_rmse, umeyama
from cvids_tpu.vio.frontend import AgentFrontend

SMALL_CAM = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                         k1=0.0, k2=0.0, p1=0.0, p2=0.0, width=320, height=240)
sm = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
base = tempfile.mkdtemp(prefix="e2e_exc_")
cfg = AgentConfig(camera=SMALL_CAM, fast_threshold=12.0, min_feature_dist=16)
traj = synthetic.Trajectory.circle(radius=4.0, omega=0.35, height_amp=0.2,
                                   phase=0.45, speed_mod=sm, speed_mod_freq=sf)
root = os.path.join(base, "agent1")
euroc_synth.write_euroc_sequence(root, cfg=cfg, trajectory=traj, duration=7.0,
                                 cam_rate=2.0, imu_rate=200.0,
                                 num_landmarks=1000, seed=12, world_seed=99)
seq = euroc.load_euroc(root)
acfg = euroc.load_agent_config(root)
if len(sys.argv) > 3:
    acfg = type(acfg)(**{**acfg.__dict__, "max_solver_iterations": int(sys.argv[3])})
fe = AgentFrontend(acfg, 1)
prev_t, est, ts_out = None, [], []
for fi in range(len(seq.cam_t)):
    t = seq.cam_t[fi]
    img = seq.load_image(fi)
    if prev_t is None:
        sel = (seq.imu_t >= t - 0.1) & (seq.imu_t < t)
        pkt = fe.process_keyframe(t, img, np.zeros((0, 3)), seq.acc[sel], np.zeros(0))
    else:
        sel = (seq.imu_t >= prev_t) & (seq.imu_t < t)
        ts_ = seq.imu_t[sel]
        dts = np.diff(np.append(ts_, t))
        pkt = fe.process_keyframe(t, img, seq.gyr[sel], seq.acc[sel], dts)
    prev_t = t
    if pkt is not None:
        est.append(pkt.p_wb); ts_out.append(t)
est = np.asarray(est); ts_out = np.asarray(ts_out)
gt = np.stack([np.interp(ts_out, seq.gt_t, seq.gt_p[:, k]) for k in range(3)], -1)
s, _, _ = umeyama(est, gt, with_scale=True)
print(f"speed_mod={sm} freq={sf}: packets={len(est)} scale(est->gt)={s:.3f} "
      f"sim3 ATE {ate_rmse(est, gt, 'sim3')*100:.1f} cm, "
      f"se3 ATE {ate_rmse(est, gt, 'se3')*100:.1f} cm")

s2, R2, t2 = umeyama(est, gt, with_scale=True)
al = s2 * est @ R2.T + t2
for i, (a, g) in enumerate(zip(al, gt)):
    print(f"  pkt{i:02d} t={ts_out[i]:.1f} err={np.linalg.norm(a-g)*100:.1f} cm")
# excluding the first three transient packets
if len(est) > 5:
    print(f"tail-only sim3 ATE {ate_rmse(est[3:], gt[3:], 'sim3')*100:.1f} cm")
