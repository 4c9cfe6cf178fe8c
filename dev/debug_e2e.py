#!/usr/bin/env python
"""Staged debugging harness for the pixels->VIO->server e2e path.

Reproduces tests/test_euroc.py::test_run_euroc_example_end_to_end but with
per-stage diagnostics so failures localize without rerunning the full test:

  stage 1: per-agent VIO quality (tracked features, packet count, VIO-frame
           ATE of the emitted packets vs ground truth)
  stage 2: BoW scores between the two agents' keyframes (are the right
           frame pairs even scoring high?)
  stage 3: server ingest with loop diagnostics (_fc_fail reasons, candidate
           selection, alignment events)
"""

import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvids_tpu.io import euroc, euroc_synth, synthetic
from cvids_tpu.server import posegraph, vocab
from cvids_tpu.utils.config import AgentConfig, CameraConfig
from cvids_tpu.utils.metrics import ate_rmse
from cvids_tpu.vio.frontend import AgentFrontend

SMALL_CAM = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                         k1=0.0, k2=0.0, p1=0.0, p2=0.0,
                         width=320, height=240)


def write_agents(base, world_seed=99):
    # quarter-scale camera -> proportionally denser tracker settings
    cfg = AgentConfig(camera=SMALL_CAM, fast_threshold=12.0,
                      min_feature_dist=16)
    roots = []
    for cid, phase in enumerate((0.0, 0.45)):
        root = os.path.join(base, f"agent{cid}")
        # speed modulation keeps metric scale observable (a constant-rate
        # circle lets an acc bias absorb the centripetal term — see
        # Trajectory.circle docstring)
        traj = synthetic.Trajectory.circle(radius=4.0, omega=0.35,
                                           height_amp=0.2, phase=phase,
                                           speed_mod=0.3, speed_mod_freq=0.9)
        euroc_synth.write_euroc_sequence(root, cfg=cfg, trajectory=traj,
                                         duration=7.0, cam_rate=2.0,
                                         imu_rate=200.0, num_landmarks=1000,
                                         seed=11 + cid, world_seed=world_seed)
        roots.append(root)
    return roots


def run_frontend(root, cid):
    seq = euroc.load_euroc(root)
    cfg = euroc.load_agent_config(root) or AgentConfig()
    fe = AgentFrontend(cfg, cid)
    packets = []
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
        ntrack = int(fe.feat_valid.sum())
        nlm = int(np.asarray(fe.state.lm_valid).sum())
        print(f"  [a{cid} f{fi:02d}] t={t:.2f} tracked={ntrack} lm={nlm} "
              f"vi_init={fe.vi_initialized} pkt={'Y' if pkt is not None else '-'}")
        if pkt is not None:
            packets.append(pkt)
    return seq, packets


def vio_ate(seq, packets):
    if not packets:
        return float("nan")
    ts = np.array([p.timestamp for p in packets])
    ps = np.stack([p.p_wb for p in packets])
    gt = np.stack([np.interp(ts, seq.gt_t, seq.gt_p[:, k]) for k in range(3)], -1)
    return ate_rmse(ps, gt, "sim3") * 100


def main():
    import pickle
    cache = "/tmp/e2e_dbg_packets.pkl"
    if os.path.exists(cache) and "--fresh" not in sys.argv:
        print(f"loading cached packets from {cache}")
        with open(cache, "rb") as f:
            payload = pickle.load(f)
        roots, all_packets = payload["roots"], payload["packets"]
        seqs = [euroc.load_euroc(r) for r in roots]
        for cid, (seq, pkts) in enumerate(zip(seqs, all_packets)):
            print(f"agent {cid}: {len(pkts)} packets, VIO ATE(sim3) "
                  f"{vio_ate(seq, pkts):.1f} cm")
    else:
        base = tempfile.mkdtemp(prefix="e2e_dbg_")
        print(f"writing to {base}")
        roots = write_agents(base)

        print("== stage 1: frontends ==")
        seqs, all_packets = [], []
        for cid, root in enumerate(roots):
            seq, pkts = run_frontend(root, cid)
            seqs.append(seq)
            all_packets.append(pkts)
            print(f"agent {cid}: {len(pkts)} packets, VIO ATE(sim3) "
                  f"{vio_ate(seq, pkts):.1f} cm")
        with open(cache, "wb") as f:
            pickle.dump({"roots": roots, "packets": all_packets}, f)

    print("== stage 2: BoW cross-scores ==")
    import jax.numpy as jnp
    descs = np.concatenate([p.ext_desc[p.ext_valid]
                            for pkts in all_packets for p in pkts[:40]])
    voc = vocab.train_vocabulary(descs[:5000], k=10, levels=3, seed=0)
    vecs = [[np.asarray(vocab.bow_vector(voc, jnp.asarray(p.ext_desc),
                                         jnp.asarray(p.ext_valid)))
             for p in pkts] for pkts in all_packets]
    # cross-agent score matrix + GT distances between keyframe positions
    if vecs[0] and vecs[1]:
        from cvids_tpu.server.vocab import score_database
        m = np.zeros((len(vecs[0]), len(vecs[1])))
        for i, v0 in enumerate(vecs[0]):
            m[i] = np.asarray(score_database(
                jnp.asarray(v0), jnp.asarray(np.stack(vecs[1])),
                jnp.ones(len(vecs[1]), bool)))
        d = np.zeros_like(m)
        for i, p0 in enumerate(all_packets[0]):
            g0 = np.stack([np.interp(p0.timestamp, seqs[0].gt_t,
                                     seqs[0].gt_p[:, k]) for k in range(3)])
            for j, p1 in enumerate(all_packets[1]):
                g1 = np.stack([np.interp(p1.timestamp, seqs[1].gt_t,
                                         seqs[1].gt_p[:, k]) for k in range(3)])
                d[i, j] = np.linalg.norm(g0 - g1)
        print("cross BoW scores (rows=a0, cols=a1), * = GT dist < 1.5 m:")
        for i in range(m.shape[0]):
            row = " ".join(f"{m[i, j]:.3f}{'*' if d[i, j] < 1.5 else ' '}"
                           for j in range(m.shape[1]))
            print(f"  {row}")

    print("== stage 3: server ==")
    server = posegraph.CollaborativePoseGraph(
        voc, posegraph.ServerConfig(kf_capacity=256,
                                    pnp_thresh=10.0 / SMALL_CAM.fx))
    merged = sorted([p for pkts in all_packets for p in pkts],
                    key=lambda p: p.timestamp)
    for p in merged:
        server._fc_fail = None
        info = server.add_keyframe(p)
        extra = ""
        if info.get("loop"):
            extra = f" LOOP with {info['loop_with']}"
        elif getattr(server, "_fc_fail", None):
            extra = f" fc_fail={server._fc_fail}"
        print(f"  kf {info['index']} (a{p.client_id})"
              f"{extra}{' ALIGNED' if info.get('aligned_event') else ''}")
    server.optimize()
    print(f"loops: {server.loop_count}, aligned: "
          f"{[server.clients[c].aligned for c in range(2)]}")
    for cid, seq in enumerate(seqs):
        tr = server.trajectory(cid)
        if len(tr):
            gt_p = np.stack([np.interp(tr[:, 0], seq.gt_t, seq.gt_p[:, k])
                             for k in range(3)], -1)
            print(f"agent {cid}: ATE (sim3) "
                  f"{ate_rmse(tr[:, 1:4], gt_p, 'sim3') * 100:.1f} cm")


if __name__ == "__main__":
    main()
