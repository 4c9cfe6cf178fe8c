#!/usr/bin/env python
"""Probe the loop-verification cascade on one cached keyframe pair.

Loads /tmp/e2e_dbg_packets.pkl (written by dev/debug_e2e.py), picks a
cross-agent pair with high GT overlap, and walks the cascade step by step:
descriptor matches -> GT-verified match correctness -> F-RANSAC survivors ->
PnP result, comparing against the ground-truth relative pose.
"""

import os
import pickle
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvids_tpu.geometry.hostmath import quat_to_matrix_np
from cvids_tpu.io import euroc
from cvids_tpu.ops import hamming, ransac

with open("/tmp/e2e_dbg_packets.pkl", "rb") as f:
    payload = pickle.load(f)
roots, all_packets = payload["roots"], payload["packets"]
seqs = [euroc.load_euroc(r) for r in roots]


def gt_pose(seq, t):
    """GT body pose (r_wb, p_wb) at time t."""
    p = np.stack([np.interp(t, seq.gt_t, seq.gt_p[:, k]) for k in range(3)])
    qi = np.argmin(np.abs(seq.gt_t - t))
    return quat_to_matrix_np(seq.gt_q[qi]), p


def probe_pair(j_pkt, i_pkt, seq_j, seq_i):
    """j = new KF (window feats + 3D), i = old KF (ext 2D feats)."""
    print(f"\n== probe: new=a{j_pkt.client_id}@{j_pkt.timestamp:.1f} "
          f"old=a{i_pkt.client_id}@{i_pkt.timestamp:.1f} ==")
    r_wj, p_wj = gt_pose(seq_j, j_pkt.timestamp)
    r_wi, p_wi = gt_pose(seq_i, i_pkt.timestamp)
    r_cb = np.asarray(j_pkt.r_cb, np.float64)
    p_bc = np.asarray(j_pkt.p_bc, np.float64)

    nw = int(j_pkt.win_valid.sum())
    ne = int(i_pkt.ext_valid.sum())
    print(f"win feats: {nw}, ext feats: {ne}")

    # VIO 3D points -> j camera frame (what _find_connection feeds PnP)
    pts_l = j_pkt.win_pts3d
    r_wb_vio = quat_to_matrix_np(j_pkt.q_wb)
    pts_b = (pts_l - j_pkt.p_wb) @ r_wb_vio
    pts_cam = (pts_b - p_bc) @ r_cb.T
    print(f"pts_cam z range: {pts_cam[:, 2].min():.2f}..{pts_cam[:, 2].max():.2f}"
          f" (neg z: {(pts_cam[:, 2] < 0.1).sum()})")
    # reproject into j itself: residual vs win_uv sanity
    proj_j = pts_cam[:, :2] / pts_cam[:, 2:3]
    self_res = np.linalg.norm(proj_j - j_pkt.win_uv, axis=1)
    print(f"self-reproj residual (norm coords): median "
          f"{np.median(self_res[j_pkt.win_valid]):.4f}")

    # descriptor matching
    m = hamming.match_descriptors(
        jnp.asarray(j_pkt.win_desc), jnp.asarray(i_pkt.ext_desc),
        jnp.asarray(j_pkt.win_valid), jnp.asarray(i_pkt.ext_valid))
    mv = np.asarray(m.valid)
    midx = np.asarray(m.indices)
    mdist = np.asarray(m.distances)
    print(f"desc matches: {mv.sum()} "
          f"(dists of matched: {sorted(mdist[mv])[:10]}...)")

    # GT correctness of matches: project j's window landmark (GT camera of i)
    # vs matched ext_uv
    # first, where is the window landmark truly? use VIO lm in j's local
    # frame -> can't compare across agents directly. Instead: use GT geometry
    # of i: matched ext_uv should be the projection of the SAME world point.
    # Approximate with the GT relative pose: x_ci = R_ci_cj x_cj + t
    r_cw_j = r_cb @ r_wj.T        # world -> cam j (rotation)
    r_cw_i = r_cb @ r_wi.T
    # camera centers in world
    c_j = p_wj + r_wj @ p_bc
    c_i = p_wi + r_wi @ p_bc
    r_ci_cj = r_cw_i @ r_cw_j.T
    t_ci = r_cw_i @ (c_j - c_i)
    # scale issue: VIO scale ~ metric after bootstrap. pts_cam are VIO-scale.
    pts_ci = pts_cam @ r_ci_cj.T + t_ci
    proj_i = pts_ci[:, :2] / np.maximum(pts_ci[:, 2:3], 1e-6)
    obs = i_pkt.ext_uv[midx]
    gt_res = np.linalg.norm(proj_i - obs, axis=1)
    ok = mv & j_pkt.win_valid
    print(f"GT transfer residual of matches (norm): "
          f"{np.round(np.sort(gt_res[ok])[:15], 3)}")
    good = ok & (gt_res < 10.0 / 200.0)
    print(f"geometrically-correct matches: {good.sum()} / {ok.sum()}")

    # F-RANSAC stage
    fres = ransac.fundamental_ransac(
        jnp.asarray(j_pkt.win_uv), jnp.asarray(obs), jnp.asarray(ok),
        jax.random.PRNGKey(5))
    fi = np.asarray(fres.inliers)
    print(f"F inliers: {fi.sum()} (of which GT-correct {(fi & good).sum()})")

    # PnP on match survivors
    keep = ok & fi if ok.sum() >= 8 else ok
    res = ransac.pnp_ransac(jnp.asarray(pts_cam), jnp.asarray(obs),
                            jnp.asarray(keep), jax.random.PRNGKey(6),
                            inlier_thresh=10.0 / 460.0, min_inliers=15)
    print(f"PnP: ok={bool(res.ok)} inliers={int(res.num_inliers)}")
    # compare with GT relative pose
    print(f"  est R diag {np.round(np.diag(np.asarray(res.r)), 3)}, "
          f"t {np.round(np.asarray(res.t), 3)}")
    print(f"  GT  R diag {np.round(np.diag(r_ci_cj), 3)}, t {np.round(t_ci, 3)}")
    # PnP with GT pose: how many matches project within threshold?
    pc = pts_cam @ r_ci_cj.T + t_ci
    pr = pc[:, :2] / np.maximum(pc[:, 2:3], 1e-9)
    res_gt = np.linalg.norm(pr - obs, axis=1)
    print(f"  inliers at GT pose: {((res_gt < 10.0 / 460.0) & ok).sum()}")


# pick pairs by GT proximity
def kf_pos(seq, pkt):
    _, p = gt_pose(seq, pkt.timestamp)
    return p


best = []
for j, pj in enumerate(all_packets[0]):
    for i, pi in enumerate(all_packets[1]):
        d = np.linalg.norm(kf_pos(seqs[0], pj) - kf_pos(seqs[1], pi))
        best.append((d, j, i))
best.sort()
for d, j, i in best[:3]:
    print(f"\n##### pair a0[{j}] a1[{i}] GT dist {d:.2f} m")
    probe_pair(all_packets[0][j], all_packets[1][i], seqs[0], seqs[1])
