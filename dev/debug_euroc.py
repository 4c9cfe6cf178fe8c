"""Instrumented repro of tests/test_euroc.py::test_run_euroc_example_end_to_end."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


from cvids_tpu.io import euroc, euroc_synth, synthetic
from cvids_tpu.utils.config import AgentConfig, CameraConfig
from cvids_tpu.utils.metrics import ate_rmse, umeyama
from cvids_tpu.vio.frontend import AgentFrontend

SMALL_CAM = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                         k1=0.0, k2=0.0, p1=0.0, p2=0.0,
                         width=320, height=240)

tmp = os.environ.get('EUROC_CACHE', '/tmp/euroc_world_r4')
cfg = AgentConfig(camera=SMALL_CAM, fast_threshold=12.0, min_feature_dist=16)
roots = []
for cid, phase in enumerate((0.0, 0.45)):
    root = os.path.join(tmp, f"agent{cid}")
    if euroc.available(root):
        roots.append(root)
        continue
    traj = synthetic.Trajectory.circle(radius=4.0, omega=0.35,
                                       height_amp=0.2, phase=phase,
                                       speed_mod=0.3, speed_mod_freq=0.9)
    euroc_synth.write_euroc_sequence(root, cfg=cfg, trajectory=traj,
                                     duration=7.0, cam_rate=2.0,
                                     imu_rate=200.0, num_landmarks=1000,
                                     seed=11 + cid, world_seed=99)
    roots.append(root)

if len(sys.argv) > 1:
    AgentFrontend.LM_MULT = int(sys.argv[1])
print(f"LM_MULT = {AgentFrontend.LM_MULT}")

seqs = [euroc.load_euroc(r) for r in roots]
cfgs = [euroc.load_agent_config(r) for r in roots]
frontends = [AgentFrontend(c, cid) for cid, c in enumerate(cfgs)]
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
            pkt = fe.process_keyframe(t, img, seq.gyr[sel], seq.acc[sel], dts)
        prev_t = t
        if cid == 0:
            slot = min(fe.n_in_window, fe.WINDOW) - 1
            bg = np.asarray(fe.state.bg[slot])
            ba = np.asarray(fe.state.ba[slot])
            nlm = int(np.asarray(fe.state.lm_valid).sum())
            print(f"  kf{fi}: cost={fe._last_solved} lm={nlm} "
                  f"trk={int(fe.feat_valid.sum())} "
                  f"bg={np.round(bg, 4)} ba={np.round(ba, 3)} "
                  f"prior={'Y' if fe._prior is not None else 'n'}")
        if pkt is not None:
            all_packets[cid].append(pkt)
    # per-packet VIO-frame accuracy: packet pose vs gt (sim3 per agent)
    est = np.asarray([p.p_wb for p in all_packets[cid]])
    ts_ = np.asarray([p.timestamp for p in all_packets[cid]])
    gt_p = np.stack([np.interp(ts_, seq.gt_t, seq.gt_p[:, k])
                     for k in range(3)], -1)
    err = ate_rmse(est, gt_p, "sim3") * 100
    s, r_a, t_a = umeyama(est, gt_p, with_scale=True)
    per = np.linalg.norm(s * est @ r_a.T + t_a - gt_p, axis=1) * 100
    print(f"agent {cid}: {len(est)} packets, VIO ATE(sim3) {err:.1f} cm, "
          f"scale {s:.3f}")
    print("  per-kf err cm:", np.round(per, 1))

# server side, mirroring examples/run_euroc.py
from cvids_tpu.server import posegraph, vocab

descs = np.concatenate([p.ext_desc[p.ext_valid]
                        for pkts in all_packets for p in pkts[:40]])
voc = vocab.tree_from_trained(
    vocab.train_vocabulary(descs[:5000], k=10, levels=4, seed=0))
fx = float(cfgs[0].camera.fx)
server = posegraph.CollaborativePoseGraph(
    voc, posegraph.ServerConfig(kf_capacity=2048, pnp_thresh=10.0 / fx,
                                async_optimize=False))
merged = sorted([p for pkts in all_packets for p in pkts],
                key=lambda p: p.timestamp)
for p in merged:
    info = server.add_keyframe(p)
    if info.get("loop"):
        print(f"loop: kf {info['index']} (client {p.client_id}) -> "
              f"{info['loop_with']}")
server.optimize()
print(f"loops: {server.loop_count}")
for cid, seq in enumerate(seqs):
    tr = server.trajectory(cid)
    gt_p = np.stack([np.interp(tr[:, 0], seq.gt_t, seq.gt_p[:, k])
                     for k in range(3)], -1)
    err = ate_rmse(tr[:, 1:4], gt_p, "sim3") * 100
    s, r_a, t_a = umeyama(tr[:, 1:4], gt_p, with_scale=True)
    per = np.linalg.norm(s * tr[:, 1:4] @ r_a.T + t_a - gt_p, axis=1) * 100
    print(f"agent {cid}: server ATE(sim3) {err:.1f} cm")
    print("  per-kf err cm:", np.round(per, 1))
