import numpy as np
import pytest

from cvids_tpu.utils import checkpoint, config, metrics, tracing


# ---------- metrics ----------

def test_umeyama_recovers_transform(rng):
    src = rng.normal(size=(50, 3))
    ang = 0.7
    r = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t = np.array([1.0, -2.0, 0.5])
    dst = 1.5 * src @ r.T + t
    s, r2, t2 = metrics.umeyama(src, dst, with_scale=True)
    assert abs(s - 1.5) < 1e-6
    np.testing.assert_allclose(r2, r, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)
    assert metrics.ate_rmse(src, dst, align="sim3") < 1e-6


def test_ate_yaw_alignment(rng):
    src = rng.normal(size=(40, 3))
    ang = -1.1
    r = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    dst = src @ r.T + np.array([3.0, 1.0, -0.2])
    assert metrics.ate_rmse(src, dst, align="yaw") < 1e-6
    assert metrics.ate_rmse(src, dst, align="none") > 1.0


# ---------- tracing ----------

def test_tracer_spans():
    tr = tracing.Tracer()
    with tr.span("loop"):
        pass
    with tr.span("loop"):
        pass
    assert tr.counts["loop"] == 2
    assert "loop" in tr.report()


# ---------- config ----------

def test_load_agent_yaml_vins_keys():
    d = {
        "max_cnt": 120, "min_dist": 25, "freq": 10,
        "acc_n": 0.1, "gyr_n": 0.005,
        "projection_parameters": {"fx": 500.0, "fy": 501.0, "cx": 300.0, "cy": 200.0},
        "distortion_parameters": {"k1": -0.3, "k2": 0.09, "p1": 0.0, "p2": 0.0},
        "image_width": 640, "image_height": 480,
    }
    cfg = config.load_agent_yaml(d)
    assert cfg.max_features == 120
    assert cfg.camera.fx == 500.0
    assert cfg.camera.k1 == -0.3
    assert cfg.imu.acc_n == 0.1
    assert cfg.camera.width == 640


def test_system_config_agents_fill():
    sc = config.SystemConfig(num_agents=3)
    assert len(sc.agents) == 3


# ---------- checkpoint ----------

def test_server_checkpoint_roundtrip(tmp_path, rng):
    from cvids_tpu.io import multiagent
    from cvids_tpu.io.synthetic import Trajectory
    from cvids_tpu.server import posegraph, vocab

    n_lm = 120
    landmarks = np.stack([rng.uniform(-10, 10, n_lm), rng.uniform(-10, 10, n_lm),
                          rng.uniform(0.2, 3, n_lm)], -1)
    descs = multiagent.landmark_descriptors(n_lm)
    voc = vocab.train_vocabulary(descs, k=5, levels=2, seed=0)
    cfg = posegraph.ServerConfig(kf_capacity=64, max_win=32, max_ext=64,
                                 max_loops=32, optimize_every=10000)
    server = posegraph.CollaborativePoseGraph(voc, cfg)
    agents = [multiagent.AgentSim(Trajectory.circle(radius=4.0, omega=0.5))]
    packets, gt = multiagent.generate_packets(agents, landmarks, descs,
                                              duration=5.0, kf_rate=1.0,
                                              max_feats=30)
    for _, _, _, pkt in packets:
        server.add_keyframe(pkt)

    path = str(tmp_path / "server.npz")
    checkpoint.save_server(path, server)
    server2 = posegraph.CollaborativePoseGraph(voc, cfg)
    checkpoint.load_server(path, server2)
    assert server2.store.count == server.store.count
    np.testing.assert_array_equal(server2.store.world_p, server.store.world_p)
    assert server2.clients[0].aligned == server.clients[0].aligned
    # the restored BoW database answers queries identically (including the
    # device-resident client column behind the same-client-recent exclusion)
    import jax.numpy as jnp
    qdesc = jnp.asarray(np.asarray(descs)[:30])
    for qc in (0, 1):
        i1, s1 = server.db.query(vocab.bow_vector(voc, qdesc), qc,
                                 exclude_recent=3)
        i2, s2 = server2.db.query(vocab.bow_vector(voc, qdesc), qc,
                                  exclude_recent=3)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-6)
    # restored server continues working
    info = server2.add_keyframe(packets[-1][3])
    assert info["index"] == server.store.count


def test_tsdf_checkpoint_roundtrip(tmp_path):
    from cvids_tpu.mapping import tsdf
    cfg = tsdf.TsdfConfig(voxel_size=0.1, capacity=128)
    vol = tsdf.TsdfVolume(cfg)
    depth = np.full((40, 60), 1.5)
    k = np.array([[50.0, 0, 30], [0, 50.0, 20], [0, 0, 1]], np.float32)
    vol.integrate(depth, np.zeros((40, 60, 3)), k, np.eye(3, dtype=np.float32),
                  np.zeros(3, np.float32))
    path = str(tmp_path / "map.npz")
    checkpoint.save_tsdf(path, vol)
    vol2 = tsdf.TsdfVolume(cfg)
    checkpoint.load_tsdf(path, vol2)
    assert vol2.slot_of == vol.slot_of
    np.testing.assert_array_equal(np.asarray(vol2.pool.sdf), np.asarray(vol.pool.sdf))


# ---------- TUM io ----------

def test_tum_roundtrip(tmp_path, rng):
    rows = np.concatenate([
        rng.uniform(0, 100, (5, 4)),
        rng.normal(size=(5, 4)) / np.linalg.norm(rng.normal(size=(5, 4)), axis=1, keepdims=True),
    ], axis=1)
    from cvids_tpu.io import tum
    p = str(tmp_path / "traj.txt")
    tum.write_tum(p, rows)
    back = tum.read_tum(p)
    np.testing.assert_allclose(back, rows, atol=1e-8)
