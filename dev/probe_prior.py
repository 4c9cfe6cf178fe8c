"""Residual-part decomposition of the window solves on the euroc world's
agent 0 — chases the post-marginalization cost blowup (r4)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from cvids_tpu.io import euroc
from cvids_tpu.vio import window_ba as ba
from cvids_tpu.vio.frontend import AgentFrontend

root = os.path.join(os.environ.get('EUROC_CACHE', '/tmp/euroc_world_r4'),
                    "agent0")
assert euroc.available(root), "run dev/debug_euroc.py once to write the world"
seq = euroc.load_euroc(root)
cfg = euroc.load_agent_config(root)
fe = AgentFrontend(cfg, 0)

orig_solve = fe._solve


def parts_of(state, meas):
    r_proj = ba.reprojection_residuals(state, meas)
    n_proj = float(jnp.sum(r_proj ** 2))
    # replicate _cam_residuals piecewise
    k = state.p.shape[0]
    from cvids_tpu.vio.imu import imu_residual

    def one(i):
        pre_i = jax.tree_util.tree_map(lambda x: x[i], meas.pre)
        r = imu_residual(pre_i, state.p[i], state.q[i], state.v[i],
                         state.bg[i], state.ba[i], state.p[i + 1],
                         state.q[i + 1], state.v[i + 1], state.bg[i + 1],
                         state.ba[i + 1], weight_bias=meas.bias_weight)
        ok = meas.pre_valid[i] & state.kf_valid[i] & state.kf_valid[i + 1]
        return jnp.where(ok, r, 0.0)

    r_imu = jax.vmap(one)(jnp.arange(k - 1))
    n_imu = float(jnp.sum(r_imu ** 2))
    from cvids_tpu.geometry import wrap_angle, yaw_of
    r_anchor = jnp.concatenate([
        (state.p[0] - meas.anchor_p) * 1e3,
        wrap_angle(yaw_of(state.q[0]) - meas.anchor_yaw)[None] * 1e3])
    n_anchor = float(jnp.sum(r_anchor ** 2))
    kf_mask = state.kf_valid.astype(state.p.dtype)[:, None]
    r_bp = jnp.concatenate([
        (state.ba * kf_mask).reshape(-1) * meas.ba_prior_weight,
        (state.bg * kf_mask).reshape(-1) * meas.bg_prior_weight])
    n_bp = float(jnp.sum(r_bp ** 2))
    n_prior = 0.0
    if meas.prior is not None:
        dx = ba.local_diff(state, meas.prior.p, meas.prior.q, meas.prior.v,
                           meas.prior.bg, meas.prior.ba, meas.prior.lm)
        rp = meas.prior.j @ dx + meas.prior.r0
        n_prior = float(jnp.sum(rp ** 2))
    return n_proj, n_imu, n_anchor, n_bp, n_prior


def spy_solve():
    meas = fe._build_meas()
    pre = parts_of(fe.state, meas)
    orig_solve()
    meas2 = fe._build_meas()
    post = parts_of(fe.state, meas2)
    lab = ("proj", "imu", "anchor", "biasp", "prior")
    print("   pre : " + " ".join(f"{l}={v:.1f}" for l, v in zip(lab, pre)))
    print("   post: " + " ".join(f"{l}={v:.1f}" for l, v in zip(lab, post)))


fe._solve = spy_solve

prev_t = None
for fi in range(len(seq.cam_t)):
    t = seq.cam_t[fi]
    img = seq.load_image(fi)
    if prev_t is None:
        sel = (seq.imu_t >= t - 0.1) & (seq.imu_t < t)
        pkt = fe.process_keyframe(t, img, np.zeros((0, 3)), seq.acc[sel],
                                  np.zeros(0))
    else:
        sel = (seq.imu_t >= prev_t) & (seq.imu_t < t)
        ts = seq.imu_t[sel]
        dts = np.diff(np.append(ts, t))
        pkt = fe.process_keyframe(t, img, seq.gyr[sel], seq.acc[sel], dts)
    prev_t = t
    print(f"kf{fi} done (prior={'Y' if fe._prior is not None else 'n'})")
