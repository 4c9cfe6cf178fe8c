import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
"""Stage-by-stage debug of the full-system distorted-camera e2e."""

import numpy as np

from cvids_tpu.io import euroc, euroc_synth, synthetic
from cvids_tpu.server import posegraph, vocab
from cvids_tpu.utils.config import AgentConfig, CameraConfig
from cvids_tpu.utils.metrics import ate_rmse

W, H = 320, 240
DIST_CAM = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                        k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4,
                        width=W, height=H)
SCENE = dict(floor_z=0.0, wall_y=3.0,
             box_lo=np.array([1.9, 0.6, 0.0]),
             box_hi=np.array([2.9, 1.6, 0.9]))

CACHE = "/tmp/fullsys_world"


def build():
    cfg_agent = AgentConfig(camera=DIST_CAM, fast_threshold=12.0,
                            min_feature_dist=16)
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
                cam_rate=2.5, imu_rate=200.0, num_landmarks=1400,
                seed=21 + cid, world_seed=7, scene=SCENE,
                gyr_noise=2e-4, acc_noise=0.005)
        roots.append(root)
    return roots


def main():
    roots = build()
    from cvids_tpu.vio.frontend import AgentFrontend
    seqs = [euroc.load_euroc(r) for r in roots]
    cfgs = [euroc.load_agent_config(r) for r in roots]
    frontends = [AgentFrontend(cfg, cid) for cid, cfg in enumerate(cfgs)]
    all_packets = [[] for _ in seqs]
    for cid, (seq, fe) in enumerate(zip(seqs, frontends)):
        prev_t = None
        for fi in range(len(seq.cam_t)):
            t = seq.cam_t[fi]
            img = seq.load_image(fi)
            if prev_t is None:
                sel = (seq.imu_t >= t - 0.1) & (seq.imu_t < t)
                pkt = fe.process_keyframe(t, img, np.zeros((0, 3)),
                                          seq.acc[sel], np.zeros(0))
            else:
                sel = (seq.imu_t >= prev_t) & (seq.imu_t < t)
                ts = seq.imu_t[sel]
                dts = np.diff(np.append(ts, t))
                pkt = fe.process_keyframe(t, img, seq.gyr[sel], seq.acc[sel],
                                          dts)
            prev_t = t
            if pkt is not None:
                all_packets[cid].append(pkt)
        # VIO health
        ps = np.stack([p.p_wb for p in all_packets[cid]])
        ts_ = np.asarray([p.timestamp for p in all_packets[cid]])
        gt_p = np.stack([np.interp(ts_, seq.gt_t, seq.gt_p[:, k])
                         for k in range(3)], -1)
        nan_pts = sum(int(np.isnan(p.win_pts3d[p.win_valid]).any())
                      for p in all_packets[cid])
        nvalid = np.mean([p.win_valid.sum() for p in all_packets[cid]])
        next_ = np.mean([p.ext_valid.sum() for p in all_packets[cid]])
        print(f"agent {cid}: {len(all_packets[cid])} packets, "
              f"VIO ATE(sim3) {ate_rmse(ps, gt_p, 'sim3')*100:.1f} cm, "
              f"se3 {ate_rmse(ps, gt_p, 'se3')*100:.1f} cm, "
              f"win_valid avg {nvalid:.0f}, ext avg {next_:.0f}, "
              f"NaN-pt packets {nan_pts}")

    descs = np.concatenate([p.ext_desc[p.ext_valid]
                            for pkts in all_packets for p in pkts])
    voc = vocab.train_vocabulary(descs[:4000], k=8, levels=3, seed=0)
    fx = float(cfgs[0].camera.fx)
    server = posegraph.CollaborativePoseGraph(
        voc, posegraph.ServerConfig(kf_capacity=256, optimize_every=20,
                                    pnp_thresh=10.0 / fx))
    merged = sorted([p for pkts in all_packets for p in pkts],
                    key=lambda p: p.timestamp)
    for p in merged:
        server._fc_fail = None
        info = server.add_keyframe(p)
        idx = info["index"]
        # report candidate scores for the cross-agent window
        desc_j = None
        tag = ""
        if info.get("loop"):
            tag = f"LOOP with {info['loop_with']}"
        elif getattr(server, "_fc_fail", None):
            tag = f"fc_fail {server._fc_fail}"
        print(f"kf {idx} (agent {p.client_id}): {tag}")
    print(f"loops: {server.loop_count}")
    server.optimize()
    for cid, seq in enumerate(seqs):
        tr = server.trajectory(cid)
        gt_p = np.stack([np.interp(tr[:, 0], seq.gt_t, seq.gt_p[:, k])
                         for k in range(3)], -1)
        print(f"agent {cid} post-optimize ATE sim3 "
              f"{ate_rmse(tr[:, 1:4], gt_p, 'sim3')*100:.1f} cm, "
              f"se3 {ate_rmse(tr[:, 1:4], gt_p, 'se3')*100:.1f} cm")
    # raw BoW score diagnostics: query each agent-1 packet against the db
    import jax.numpy as jnp
    n_rep = 0
    for p in merged:
        if p.client_id != 1 or n_rep >= 6:
            continue
        n_rep += 1
        vec = vocab.bow_vector(server.voc, jnp.asarray(p.ext_desc),
                               jnp.asarray(p.ext_valid))
        cand_idx, cand_score = server.db.query(vec, 1, 10)
        cls = [int(server.store.client[int(i)]) for i in cand_idx]
        print(f"  t={p.timestamp:.1f} top: " + ", ".join(
            f"kf{int(i)}(c{c})={s:.4f}" for i, c, s in
            zip(cand_idx, cls, cand_score)))


if __name__ == "__main__":
    main()
