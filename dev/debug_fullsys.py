import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
"""Stage-by-stage debug of the full-system distorted-camera e2e — mirrors
tests/test_full_system.py (incl. the r4 photometric-nuisance world) but
prints every gated quantity instead of asserting."""

import numpy as np

from cvids_tpu.camera.pinhole import PinholeCamera
from cvids_tpu.dense import estimator
from cvids_tpu.io import euroc, euroc_synth, render, synthetic
from cvids_tpu.mapping.tsdf import TsdfConfig
from cvids_tpu.server import pipeline, posegraph, vocab
from cvids_tpu.utils.config import AgentConfig, CameraConfig
from cvids_tpu.utils.metrics import ate_rmse, umeyama

W, H = 320, 240
DIST_CAM = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                        k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4,
                        width=W, height=H)
SCENE = dict(floor_z=0.0, wall_y=3.0,
             box_lo=np.array([1.9, 0.6, 0.0]),
             box_hi=np.array([2.9, 1.6, 0.9]))

CACHE = os.environ.get("FULLSYS_CACHE", "/tmp/fullsys_world_r5")
PHOTOMETRIC = os.environ.get("FULLSYS_PHOTO", "1") == "1"


def _scene_distance(pts):
    d_floor = np.abs(pts[:, 2] - SCENE["floor_z"])
    d_wall = np.abs(pts[:, 1] - SCENE["wall_y"])
    lo, hi = SCENE["box_lo"], SCENE["box_hi"]
    q = np.maximum(lo[None] - pts, pts - hi[None])
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=1)
    inside = np.minimum(np.max(q, axis=1), 0.0)
    return np.minimum(np.minimum(d_floor, d_wall), np.abs(outside + inside))


def build():
    cfg_agent = AgentConfig(camera=DIST_CAM, fast_threshold=12.0,
                            min_feature_dist=16, equalize=PHOTOMETRIC,
                            keyframe_freq=2.5)
    pm = (dict(flicker=0.15, vignette=0.3, noise_std=1.5, shot_noise=0.3,
               exposure_time=0.008) if PHOTOMETRIC else None)
    roots = []
    for cid, phase in enumerate((0.0, 0.45)):
        traj = synthetic.Trajectory.circle(radius=1.5, omega=0.5,
                                           height_amp=0.15, phase=phase,
                                           center=(0.0, 0.0, 1.3),
                                           speed_mod=0.3, speed_mod_freq=0.9)
        root = os.path.join(CACHE, f"agent{cid}")
        if not euroc.available(root):
            euroc_synth.write_euroc_sequence(
                root, cfg=cfg_agent, trajectory=traj, duration=8.0,
                cam_rate=20.0, imu_rate=200.0, num_landmarks=1400,
                seed=21 + cid, world_seed=7, scene=SCENE,
                gyr_noise=2e-4, acc_noise=0.005, photometric=pm)
        roots.append(root)
    return roots, cfg_agent


def main():
    import pickle

    roots, _ = build()
    from cvids_tpu.vio.frontend import AgentFrontend

    seqs = [euroc.load_euroc(r) for r in roots]
    cfgs = [euroc.load_agent_config(r) for r in roots]
    print(f"photometric={PHOTOMETRIC}; equalize={cfgs[0].equalize}")
    pkt_cache = os.path.join(CACHE, "packets.pkl")
    if os.path.exists(pkt_cache):
        with open(pkt_cache, "rb") as f:
            all_packets = pickle.load(f)
        print(f"loaded cached packets: {[len(p) for p in all_packets]}")
        _run_server(roots, seqs, cfgs, all_packets)
        return
    frontends = [AgentFrontend(cfg, cid) for cid, cfg in enumerate(cfgs)]
    all_packets = [[] for _ in seqs]
    for cid, (seq, fe) in enumerate(zip(seqs, frontends)):
        prev_t = None
        for fi in range(len(seq.cam_t)):
            t = seq.cam_t[fi]
            img = seq.load_image(fi)
            if prev_t is None:
                sel = (seq.imu_t >= t - 0.1) & (seq.imu_t < t)
                pkt = fe.process_frame(t, img, np.zeros((0, 3)),
                                       seq.acc[sel], np.zeros(0))
            else:
                sel = (seq.imu_t >= prev_t) & (seq.imu_t < t)
                ts = seq.imu_t[sel]
                dts = np.diff(np.append(ts, t))
                pkt = fe.process_frame(t, img, seq.gyr[sel], seq.acc[sel],
                                       dts)
            prev_t = t
            if pkt is not None:
                all_packets[cid].append(pkt)
        ps = np.stack([p.p_wb for p in all_packets[cid]])
        ts_ = np.asarray([p.timestamp for p in all_packets[cid]])
        gt_p = np.stack([np.interp(ts_, seq.gt_t, seq.gt_p[:, k])
                         for k in range(3)], -1)
        s, r_a, t_a = umeyama(ps, gt_p, with_scale=True)
        per = np.linalg.norm(s * ps @ r_a.T + t_a - gt_p, axis=1) * 100
        print(f"agent {cid}: {len(all_packets[cid])} packets (need >= 8), "
              f"VIO ATE(sim3) {ate_rmse(ps, gt_p, 'sim3')*100:.1f} cm, "
              f"scale {s:.3f}")
        print("  per-kf err cm:", np.round(per, 1))

    with open(pkt_cache, "wb") as f:
        pickle.dump(all_packets, f)
    _run_server(roots, seqs, cfgs, all_packets)


def _run_server(roots, seqs, cfgs, all_packets):
    g = None
    voc = vocab.generic_vocabulary(k=8, levels=3)
    fx = float(cfgs[0].camera.fx)
    pcfg = pipeline.PipelineConfig(
        server=posegraph.ServerConfig(kf_capacity=256, optimize_every=20,
                                      pnp_thresh=10.0 / fx),
        dense=estimator.DenseConfig(height=H, width=W, num_depths=64,
                                    dep_sample=0.015, tau2_scale=0.5),
        tsdf=TsdfConfig(voxel_size=0.1, capacity=2048, carving=False),
        min_fused_frames=2, ref_advance=3)
    server = pipeline.CollaborativeServer(voc, pcfg)
    cams = [PinholeCamera.create(c.camera.fx, c.camera.fy, c.camera.cx,
                                 c.camera.cy,
                                 (c.camera.k1, c.camera.k2, c.camera.p1,
                                  c.camera.p2), W, H) for c in cfgs]
    for cid, cam in enumerate(cams):
        server.set_client_camera(cid, cam)
    merged = sorted([p for pkts in all_packets for p in pkts],
                    key=lambda p: p.timestamp)
    for p in merged:
        server.submit(p)
    server.process()
    server.optimize()
    g = server.graph
    print(f"loops: {g.loop_count} (need >= 1), aligned: "
          f"{[g.clients[c].aligned for c in range(2)]}")
    for cid, seq in enumerate(seqs):
        tr = server.trajectory(cid)
        gt_p = np.stack([np.interp(tr[:, 0], seq.gt_t, seq.gt_p[:, k])
                         for k in range(3)], -1)
        print(f"agent {cid}: server ATE(sim3) "
              f"{ate_rmse(tr[:, 1:4], gt_p, 'sim3')*100:.1f} cm (need < 10)")

    print(f"depth maps published: {server.depth_maps_published} (need >= 2)")
    pin_cam = PinholeCamera.create(DIST_CAM.fx, DIST_CAM.fy, DIST_CAM.cx,
                                   DIST_CAM.cy, (0, 0, 0, 0), W, H)
    r_cb = np.asarray(cfgs[0].r_cb, np.float64)
    p_bc = np.asarray(cfgs[0].p_bc, np.float64)
    from cvids_tpu.geometry.hostmath import quat_to_matrix_np
    rmses = []
    for rec in server.depth_records:
        cid = rec["client"]
        st = g.store
        t_kf = float(st.timestamp[rec["ref_index"]])
        seq = seqs[cid]
        gi = int(np.argmin(np.abs(seq.gt_t - t_kf)))
        r_wb = quat_to_matrix_np(seq.gt_q[gi])
        r_wc = r_wb @ r_cb.T
        t_wc = seq.gt_p[gi] + r_wb @ p_bc
        _, depth_gt = render.render_textured_scene(pin_cam, r_wc, t_wc, SCENE)
        est = rec["depth"]
        both = (est > 0) & (depth_gt > 0.2) & (depth_gt < 6.0)
        inv_err = 1.0 / est[both] - 1.0 / depth_gt[both]
        rms = float(np.sqrt(np.mean(inv_err ** 2)))
        # error composition: pose error vs depth error — recompute with the
        # SERVER pose instead of gt pose to see how much is pose-induced
        r_wc_s, t_wc_s = rec["r_wc"], rec["t_wc"]
        med_e = float(np.median(est[both]))
        med_g = float(np.median(depth_gt[both]))
        q = np.quantile(np.abs(inv_err), [0.5, 0.9])
        print(f"client {cid}: overlap {both.mean():.2f} (need > 0.05), "
              f"inv-depth RMS {rms:.3f} (need < 0.12), "
              f"med est {med_e:.2f} gt {med_g:.2f} m, "
              f"|inv err| p50 {q[0]:.3f} p90 {q[1]:.3f}, "
              f"est-valid {(est > 0).mean():.2f}, "
              f"pose delta |t|={np.linalg.norm(t_wc_s - t_wc):.3f} m")
        if both.mean() >= 0.02:
            rmses.append(rms)
    print(f"median per-map inv-depth RMS over {len(rmses)} maps: "
          f"{np.median(rmses) if rmses else float('nan'):.3f} (need < 0.12)")

    mesh_path = os.path.join(CACHE, "scene.ply")
    n_verts = server.save_mesh(mesh_path)
    from cvids_tpu.mapping import mesh as mesh_mod
    verts, _, _ = mesh_mod.read_ply(mesh_path)
    verts = np.asarray(verts, np.float64).reshape(-1, 3)
    tr0 = server.trajectory(0)
    gt0 = np.stack([np.interp(tr0[:, 0], seqs[0].gt_t, seqs[0].gt_p[:, k])
                    for k in range(3)], -1)
    _, r_align, t_align = umeyama(tr0[:, 1:4], gt0)
    verts_w = verts @ r_align.T + t_align
    d = _scene_distance(verts_w)
    print(f"mesh: {n_verts} tris (need > 300), median scene distance "
          f"{np.median(d):.3f} m (need < 0.15)")


if __name__ == "__main__":
    main()
