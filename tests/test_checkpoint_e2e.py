"""Mid-run checkpoint -> FRESH-PROCESS restore -> identical final state
(VERDICT r4 item 8). The reference has no server persistence (SURVEY §5.4);
this is a build obligation: "resume" operationally means a server killed
mid-mission restarts in a new process from the checkpoint file and finishes
with the SAME map as an uninterrupted run.
"""

import multiprocessing as mp
import os

import numpy as np
import pytest


def _world():
    """Deterministic 2-agent drifting world (packet-level, no pixels)."""
    from cvids_tpu.io import multiagent
    from cvids_tpu.io.synthetic import Trajectory

    rng = np.random.default_rng(7)
    n_lm = 160
    landmarks = np.stack([rng.uniform(-10, 10, n_lm),
                          rng.uniform(-10, 10, n_lm),
                          rng.uniform(0.2, 3, n_lm)], -1)
    descs = multiagent.landmark_descriptors(n_lm)
    agents = [
        multiagent.AgentSim(Trajectory.circle(radius=4.0, omega=0.5),
                            drift_yaw_rate=0.002, drift_t_rate=0.004),
        multiagent.AgentSim(Trajectory.circle(radius=4.0, omega=0.5,
                                              phase=0.8),
                            yaw_offset=0.6, t_offset=np.array([1.0, -2.0, 0.0]),
                            drift_yaw_rate=-0.001, drift_t_rate=0.003),
    ]
    packets, gt = multiagent.generate_packets(agents, landmarks, descs,
                                              duration=18.0, kf_rate=1.0,
                                              max_feats=60, seed=3)
    return packets, gt, descs


def _make_server(descs):
    from cvids_tpu.server import posegraph, vocab

    voc = vocab.train_vocabulary(descs, k=5, levels=2, seed=0)
    cfg = posegraph.ServerConfig(kf_capacity=128, max_win=64, max_ext=64,
                                 max_loops=64, optimize_every=10**9)
    return posegraph.CollaborativePoseGraph(voc, cfg)


def _finish(server, packets, start):
    for _, _, _, pkt in packets[start:]:
        server.add_keyframe(pkt)
    server.optimize()
    return dict(
        count=int(server.store.count),
        loop_count=int(server.loop_count),
        world_p=np.asarray(server.store.world_p[:server.store.count]),
        world_yaw=np.asarray(server.store.world_yaw[:server.store.count]),
        aligned=[bool(server.clients[c].aligned) for c in range(2)])


def _resume_child(ckpt_path, out_path, split):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np  # noqa: F811

    from cvids_tpu.utils import checkpoint

    packets, _, descs = _world()
    server = _make_server(descs)
    checkpoint.load_server(ckpt_path, server)
    out = _finish(server, packets, split)
    np.savez(out_path, **{k: v for k, v in out.items() if k != "aligned"},
             aligned=np.asarray(out["aligned"]))
    os._exit(0)


@pytest.mark.slow
def test_midrun_checkpoint_fresh_process_resume(tmp_path):
    from cvids_tpu.utils import checkpoint
    from cvids_tpu.utils.metrics import ate_rmse

    packets, gt, descs = _world()
    split = len(packets) // 2

    # uninterrupted reference run
    ref = _finish(_make_server(descs), packets, 0)
    assert ref["loop_count"] >= 1 and all(ref["aligned"])

    # interrupted run: ingest half, checkpoint, DISCARD the server
    server_a = _make_server(descs)
    for _, _, _, pkt in packets[:split]:
        server_a.add_keyframe(pkt)
    ckpt = str(tmp_path / "mid.npz")
    checkpoint.save_server(ckpt, server_a)
    del server_a

    # fresh OS process resumes from the file and finishes the mission
    out_path = str(tmp_path / "resumed.npz")
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_resume_child, args=(ckpt, out_path, split))
    p.start()
    p.join(timeout=600)
    assert p.exitcode == 0, p.exitcode
    res = np.load(out_path)

    # identical final map: same keyframes, same accepted loops, same poses
    assert int(res["count"]) == ref["count"]
    assert int(res["loop_count"]) == ref["loop_count"], \
        (int(res["loop_count"]), ref["loop_count"])
    assert list(res["aligned"]) == ref["aligned"]
    np.testing.assert_allclose(res["world_p"], ref["world_p"], atol=1e-4)
    np.testing.assert_allclose(
        np.unwrap(res["world_yaw"]), np.unwrap(ref["world_yaw"]), atol=1e-4)

    assert np.isfinite(res["world_p"]).all()
    _ = ate_rmse  # accuracy of the reference run is covered by test_server
