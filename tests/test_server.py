import numpy as np
import pytest

from cvids_tpu.io import multiagent
from cvids_tpu.io.synthetic import Trajectory
from cvids_tpu.server import posegraph, vocab


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(1)
    # landmark shell around the working volume
    n_lm = 300
    landmarks = np.stack([
        rng.uniform(-14, 14, n_lm),
        rng.uniform(-14, 14, n_lm),
        rng.uniform(0.2, 4.0, n_lm)], -1)
    descs = multiagent.landmark_descriptors(n_lm)
    voc = vocab.train_vocabulary(descs, k=8, levels=2, seed=0)
    return landmarks, descs, voc


def small_config():
    return posegraph.ServerConfig(
        kf_capacity=256, max_win=64, max_ext=128, max_loops=256,
        optimize_every=15, lm_iters=8, cg_iters=40,
        min_loop_matches=12, pcm_min_edges=10)


def ate(server, gt, cid):
    st = server.store
    n = st.count
    sel = np.nonzero(st.client[:n] == cid)[0]
    errs = []
    for k in sel:
        p_gt, _ = gt[(cid, int(st.local_index[k]))]
        errs.append(np.linalg.norm(st.world_p[k] - p_gt))
    return np.sqrt(np.mean(np.square(errs))), len(sel)


def test_two_agent_alignment_and_ate(world):
    landmarks, descs, voc = world
    agents = [
        multiagent.AgentSim(Trajectory.circle(radius=5.0, omega=0.45,
                                              center=(0.0, 0.0, 1.5))),
        multiagent.AgentSim(Trajectory.circle(radius=5.0, omega=0.45,
                                              phase=1.5,
                                              center=(2.0, 1.0, 1.5)),
                            yaw_offset=0.4, t_offset=np.array([2.0, -1.0, 0.3]),
                            drift_yaw_rate=0.0005, drift_t_rate=0.002),
    ]
    packets, gt = multiagent.generate_packets(
        agents, landmarks, descs, duration=28.0, kf_rate=1.0, max_feats=60)

    server = posegraph.CollaborativePoseGraph(voc, small_config())
    events = []
    for _, cid, ki, pkt in packets:
        info = server.add_keyframe(pkt)
        if info.get("aligned_event"):
            events.append(info)
    assert server.clients[0].aligned
    assert server.clients[1].aligned, "client 1 never aligned to the world"
    assert len(events) >= 1
    server.optimize()

    ate0, n0 = ate(server, gt, 0)
    ate1, n1 = ate(server, gt, 1)
    assert n0 > 20 and n1 > 20
    # client 0 defines the world: should be near-exact (tiny drift only)
    assert ate0 < 0.05, ate0
    # client 1 had an unknown frame offset + drift; server must recover it
    assert ate1 < 0.25, ate1


def test_single_agent_drift_correction(world):
    landmarks, descs, voc = world
    agents = [multiagent.AgentSim(
        Trajectory.circle(radius=5.0, omega=0.5),
        drift_yaw_rate=0.001, drift_t_rate=0.004)]
    packets, gt = multiagent.generate_packets(
        agents, landmarks, descs, duration=26.0, kf_rate=1.0, max_feats=60)
    cfg = small_config()
    server = posegraph.CollaborativePoseGraph(voc, cfg)
    n_loops_before = 0
    for _, cid, ki, pkt in packets:
        server.add_keyframe(pkt)
    server.optimize()
    assert server.loop_count > 0, "no intra-agent loop closures found"
    ate0, n0 = ate(server, gt, 0)
    # raw drifted VIO error for comparison
    raw = []
    for k in range(server.store.count):
        p_gt, _ = gt[(0, int(server.store.local_index[k]))]
        raw.append(np.linalg.norm(server.store.vio_p[k] - p_gt))
    raw_ate = np.sqrt(np.mean(np.square(raw)))
    assert ate0 < raw_ate, (ate0, raw_ate)
    assert ate0 < 0.15, ate0


def test_trajectory_export(world):
    landmarks, descs, voc = world
    agents = [multiagent.AgentSim(Trajectory.circle(radius=5.0, omega=0.5))]
    packets, gt = multiagent.generate_packets(agents, landmarks, descs,
                                              duration=6.0, kf_rate=1.0,
                                              max_feats=60)
    server = posegraph.CollaborativePoseGraph(voc, small_config())
    for _, _, _, pkt in packets:
        server.add_keyframe(pkt)
    tr = server.trajectory(0)
    assert tr.shape[1] == 8
    assert tr.shape[0] == len(packets)
    # quaternions normalized
    np.testing.assert_allclose(np.linalg.norm(tr[:, 4:], axis=1), 1.0, atol=1e-5)
