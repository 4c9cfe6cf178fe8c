#!/usr/bin/env python
"""Check solver convergence + IMU information scale on the cached dataset."""
import os, sys, glob
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cvids_tpu.io import euroc
from cvids_tpu.vio.frontend import AgentFrontend

root = sorted(glob.glob("/tmp/e2e_dbg_*/agent1"))[-1]
seq = euroc.load_euroc(root)
cfg = euroc.load_agent_config(root)
cfg = type(cfg)(**{**cfg.__dict__, "max_solver_iterations": 30})
fe = AgentFrontend(cfg, 1)
prev_t = None
for fi in range(len(seq.cam_t)):
    t = seq.cam_t[fi]
    img = seq.load_image(fi)
    if prev_t is None:
        sel = (seq.imu_t >= t - 0.1) & (seq.imu_t < t)
        fe.process_keyframe(t, img, np.zeros((0, 3)), seq.acc[sel], np.zeros(0))
    else:
        sel = (seq.imu_t >= prev_t) & (seq.imu_t < t)
        ts_ = seq.imu_t[sel]
        dts = np.diff(np.append(ts_, t))
        fe.process_keyframe(t, img, seq.gyr[sel], seq.acc[sel], dts)
    prev_t = t
    w = fe.n_in_window
    if fe.initialized and w >= 2:
        p_est = np.asarray(fe.state.p)
        d_est = np.linalg.norm(p_est[w-1] - p_est[w-2])
        g1 = np.stack([np.interp(t, seq.gt_t, seq.gt_p[:, k]) for k in range(3)])
        g0 = np.stack([np.interp(seq.cam_t[fi-1], seq.gt_t, seq.gt_p[:, k]) for k in range(3)])
        d_gt = np.linalg.norm(g1 - g0)
        pre = fe.pre_list[min(w, fe.WINDOW) - 2]
        si = np.asarray(pre.sqrt_info) if pre is not None else None
        print(f"f{fi:02d} ratio={d_est/max(d_gt,1e-9):.3f} cost={fe._last_solved:.1f}"
              f" sqrt_info diag p/q/v = "
              f"{np.diag(si)[:3].mean():.0f}/{np.diag(si)[3:6].mean():.0f}/{np.diag(si)[6:9].mean():.0f}"
              if si is not None else "")
