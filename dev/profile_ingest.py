#!/usr/bin/env python
"""Break down add_keyframe time by stage."""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cvids_tpu.io import multiagent
from cvids_tpu.io.synthetic import Trajectory
from cvids_tpu.server import posegraph, vocab

rng = np.random.default_rng(1)
n_lm = 600
landmarks = np.stack([rng.uniform(-16, 16, n_lm), rng.uniform(-16, 16, n_lm),
                      rng.uniform(0.2, 4.0, n_lm)], -1)
descs = multiagent.landmark_descriptors(n_lm)
voc = vocab.train_vocabulary(descs, k=10, levels=3, seed=0)
agents = [multiagent.AgentSim(
    Trajectory.circle(radius=5.0 + 0.4 * a, omega=0.45, phase=1.3 * a),
    drift_yaw_rate=0.0004, drift_t_rate=0.002) for a in range(4)]
packets, _ = multiagent.generate_packets(
    agents, landmarks, descs, duration=120.0, kf_rate=1.0, max_feats=60)
server = posegraph.CollaborativePoseGraph(
    voc, posegraph.ServerConfig(kf_capacity=2048, optimize_every=10 ** 9))

import cProfile, pstats
for _, _, _, pkt in packets[:16]:
    server.add_keyframe(pkt)
pr = cProfile.Profile()
pr.enable()
for _, _, _, pkt in packets[16:]:
    server.add_keyframe(pkt)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(22)
