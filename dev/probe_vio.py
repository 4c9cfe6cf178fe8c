#!/usr/bin/env python
"""Analyze VIO error structure from cached e2e packets."""
import os, pickle, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cvids_tpu.io import euroc
from cvids_tpu.utils.metrics import umeyama

with open("/tmp/e2e_dbg_packets.pkl", "rb") as f:
    payload = pickle.load(f)
roots, all_packets = payload["roots"], payload["packets"]
for cid, (root, pkts) in enumerate(zip(roots, all_packets)):
    seq = euroc.load_euroc(root)
    ts = np.array([p.timestamp for p in pkts])
    est = np.stack([p.p_wb for p in pkts])
    gt = np.stack([np.interp(ts, seq.gt_t, seq.gt_p[:, k]) for k in range(3)], -1)
    s, R, t = umeyama(est, gt, with_scale=True)
    al = s * est @ R.T + t
    err = al - gt
    print(f"agent {cid}: scale={s:.3f}")
    for k, (e, g) in enumerate(zip(err, gt)):
        print(f"  t={ts[k]:.1f} err xyz = {e[0]:+.3f} {e[1]:+.3f} {e[2]:+.3f} |e|={np.linalg.norm(e):.3f}")
    # SE3-only alignment error (scale error folded in)
    s2, R2, t2 = umeyama(est, gt, with_scale=False)
    al2 = est @ R2.T + t2
    print(f"  sim3 rmse {np.sqrt((err**2).sum(1).mean())*100:.1f} cm, "
          f"se3 rmse {np.sqrt(((al2-gt)**2).sum(1).mean())*100:.1f} cm")
