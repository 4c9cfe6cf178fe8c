#!/usr/bin/env python
"""Instrument the VI bootstrap + per-frame scale on a cached dataset."""
import os, sys, glob
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cvids_tpu.io import euroc
from cvids_tpu.utils.config import AgentConfig
from cvids_tpu.vio.frontend import AgentFrontend
from cvids_tpu.vio import initializer as vi_init
from cvids_tpu.vio import imu as imu_mod

root = sorted(glob.glob("/tmp/e2e_dbg_*/agent1"))[-1]
print("dataset:", root)
seq = euroc.load_euroc(root)
cfg = euroc.load_agent_config(root)
fe = AgentFrontend(cfg, 1)

orig_boot = fe._try_vi_bootstrap
def boot_wrapper():
    was = fe.vi_initialized
    st_before = fe.state
    orig_boot()
    if not was and fe.vi_initialized:
        print("  >>> bootstrap fired")
for_gt = {}

prev_t = None
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
        fe._try_vi_bootstrap = boot_wrapper
        pkt = fe.process_keyframe(t, img, seq.gyr[sel], seq.acc[sel], dts)
    prev_t = t
    # window scale vs GT: ratio of inter-KF displacements
    kfv = np.asarray(fe.state.kf_valid)
    if kfv.sum() >= 2 and fe.initialized:
        # map window slots to timestamps: slot n_in_window-1 is current
        # use last two slots
        w = fe.n_in_window
        p_est = np.asarray(fe.state.p)
        d_est = np.linalg.norm(p_est[w-1] - p_est[w-2]) if w >= 2 else 0
        g1 = np.stack([np.interp(t, seq.gt_t, seq.gt_p[:, k]) for k in range(3)])
        g0 = np.stack([np.interp(prev_t if fi==0 else seq.cam_t[fi-1], seq.gt_t, seq.gt_p[:, k]) for k in range(3)])
        d_gt = np.linalg.norm(g1 - g0)
        # velocity magnitude sanity (true speed = r*omega = 1.4)
        v = np.asarray(fe.state.v)[min(w-1, fe.WINDOW-1)]
        bg = np.asarray(fe.state.bg)[0]
        ba_ = np.asarray(fe.state.ba)[0]
        print(f"f{fi:02d} t={t:.1f} |d_est|={d_est:.3f} |d_gt|={d_gt:.3f} "
              f"ratio={d_est/max(d_gt,1e-9):.3f} |v|={np.linalg.norm(v):.2f} "
              f"bg={np.round(bg,4)} ba={np.round(ba_,3)} "
              f"cost={getattr(fe,'_last_solved',0):.1f}")
