import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
"""Ablation: `bow_rel_gate` on/off (VERDICT r2 weak #5).

The reference selects the OLDEST candidate whose absolute BoW score clears
0.003/0.005 (`server_pose_graph.cpp:1021-1062`), calibrated to its fixed
million-word vocabulary. Our trained vocabularies shift the noise floor, so
`ServerConfig.bow_rel_gate` additionally requires candidates to score within
a fraction of the best qualifying one. This ablation runs the tree-vocab
multi-agent world both ways and reports loop recall, PCM-kept edges, and
ATE — the evidence that the gate preserves (or improves) reference-semantics
recall rather than silently changing behavior.
"""

import numpy as np

from cvids_tpu.io import multiagent
from cvids_tpu.io.synthetic import Trajectory
from cvids_tpu.server import posegraph, vocab


def run(gate: float, packets, gt, tree):
    cfg = posegraph.ServerConfig(
        kf_capacity=256, max_win=64, max_ext=128, max_loops=256,
        optimize_every=15, lm_iters=8, cg_iters=40,
        min_loop_matches=12, pcm_min_edges=10, bow_rel_gate=gate)
    server = posegraph.CollaborativePoseGraph(tree, cfg)
    for _, cid, ki, pkt in packets:
        server.add_keyframe(pkt)
    server.optimize()

    def ate(cid):
        st = server.store
        sel = np.nonzero(st.client[:st.count] == cid)[0]
        errs = [np.linalg.norm(st.world_p[k]
                               - gt[(cid, int(st.local_index[k]))][0])
                for k in sel]
        return float(np.sqrt(np.mean(np.square(errs))))

    kept = int((server.loop_valid & server.loop_pcm_ok)[:server.loop_count].sum())
    print(f"bow_rel_gate={gate}: loops {server.loop_count} (pcm-kept {kept}), "
          f"aligned {[server.clients[c].aligned for c in (0, 1)]}, "
          f"ATE [{ate(0)*100:.1f}, {ate(1)*100:.1f}] cm")
    return server.loop_count, kept


def main():
    rng = np.random.default_rng(1)
    n_lm = 300
    landmarks = np.stack([rng.uniform(-14, 14, n_lm),
                          rng.uniform(-14, 14, n_lm),
                          rng.uniform(0.2, 4.0, n_lm)], -1)
    descs = multiagent.landmark_descriptors(n_lm)
    big = vocab.train_vocabulary(descs, k=10, levels=4, seed=1)
    tree = vocab.tree_from_trained(big)
    print(f"vocabulary: {tree.num_words} words")
    agents = [
        multiagent.AgentSim(Trajectory.circle(radius=5.0, omega=0.45,
                                              center=(0.0, 0.0, 1.5))),
        multiagent.AgentSim(Trajectory.circle(radius=5.0, omega=0.45,
                                              phase=1.5,
                                              center=(2.0, 1.0, 1.5)),
                            yaw_offset=0.4,
                            t_offset=np.array([2.0, -1.0, 0.3]),
                            drift_yaw_rate=0.0005, drift_t_rate=0.002),
    ]
    packets, gt = multiagent.generate_packets(
        agents, landmarks, descs, duration=30.0, kf_rate=1.0, max_feats=60)
    run(0.0, packets, gt, tree)   # pure reference semantics (oldest >= abs)
    run(0.5, packets, gt, tree)   # + relative gate (our default)


if __name__ == "__main__":
    main()
