"""Fisheye (equidistant/Kannala-Brandt) rig end-to-end — the live-pipeline
camera polymorphism the reference gets from camodocal's virtual `Camera`
(`camera_model/include/camodocal/camera_models/Camera.h:72-90`,
`CameraFactory.cc:64-120`; the mynteye/tum fisheye configs run through it).
VERDICT r4 item 5: KB/MEI calibrate but the live pipeline was pinhole-only.

Two agents carry an equidistant camera through a rendered world; the full
path (fisheye lift in the front-end -> window BA -> packets -> loop
cascade -> submap alignment -> 4-DoF) must close loops and meet an ATE
bound — proving the polymorphic lift/project interface end to end.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_fisheye_equidistant_two_agent_e2e(tmp_path):
    from cvids_tpu.io import euroc, euroc_synth, synthetic
    from cvids_tpu.server import posegraph, vocab
    from cvids_tpu.utils.config import AgentConfig, CameraConfig
    from cvids_tpu.utils.metrics import ate_rmse
    from cvids_tpu.vio.frontend import AgentFrontend

    # a mild KB fisheye (the coefficients ride the 4 distortion fields)
    cam = CameraConfig(fx=150.0, fy=150.0, cx=160.0, cy=120.0,
                       k1=-0.01, k2=0.02, p1=-0.005, p2=0.001,
                       width=320, height=240, model="equidistant")
    cfg = AgentConfig(camera=cam, fast_threshold=12.0, min_feature_dist=16,
                      keyframe_freq=2.5)
    roots = []
    for cid, phase in enumerate((0.0, 0.45)):
        root = str(tmp_path / f"agent{cid}")
        traj = synthetic.Trajectory.circle(radius=4.0, omega=0.35,
                                           height_amp=0.2, phase=phase,
                                           speed_mod=0.3, speed_mod_freq=0.9)
        euroc_synth.write_euroc_sequence(root, cfg=cfg, trajectory=traj,
                                         duration=7.0, cam_rate=10.0,
                                         imu_rate=200.0, num_landmarks=1000,
                                         seed=31 + cid, world_seed=77)
        roots.append(root)

    seqs = [euroc.load_euroc(r) for r in roots]
    cfgs = [euroc.load_agent_config(r) for r in roots]
    # the model survives the sensor.yaml round trip and the factory builds
    # an EquidistantCamera for the live front-end
    assert cfgs[0].camera.model == "equidistant"
    frontends = [AgentFrontend(c, cid) for cid, c in enumerate(cfgs)]
    assert type(frontends[0].cam).__name__ == "EquidistantCamera"

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
        assert len(all_packets[cid]) >= 6, \
            f"agent {cid}: too few packets on the fisheye rig"

    voc = vocab.generic_vocabulary(k=8, levels=3)
    fx = float(cfgs[0].camera.fx)
    server = posegraph.CollaborativePoseGraph(
        voc, posegraph.ServerConfig(kf_capacity=128, optimize_every=20,
                                    pnp_thresh=10.0 / fx))
    merged = sorted([p for pkts in all_packets for p in pkts],
                    key=lambda p: p.timestamp)
    for p in merged:
        server.add_keyframe(p)
    server.optimize()

    assert server.loop_count >= 1, "no loop closures on the fisheye rig"
    assert server.clients[0].aligned and server.clients[1].aligned
    for cid, seq in enumerate(seqs):
        tr = server.trajectory(cid)
        gt_p = np.stack([np.interp(tr[:, 0], seq.gt_t, seq.gt_p[:, k])
                         for k in range(3)], -1)
        ate_cm = ate_rmse(tr[:, 1:4], gt_p, "sim3") * 100
        # the fisheye rig carries 0.75x the pixel information of the
        # pinhole rig (fx 150 vs 200 at the same resolution), so the
        # pinhole world's 10 cm scales to ~13; 15 gives deterministic
        # margin (measured 9.8-12.6 per agent). The test's job is the
        # POLYMORPHIC pipeline: lift/project through EquidistantCamera end
        # to end with loops closing and submaps aligning.
        assert ate_cm < 15.0, f"agent {cid} fisheye ATE {ate_cm:.1f} cm"
