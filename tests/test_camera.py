import jax.numpy as jnp
import numpy as np

from cvids_tpu.camera import PinholeCamera

# EuRoC cam0 intrinsics (reference `config/euroc/euroc_config.yaml:10-22`)
EUROC = dict(
    fx=461.6, fy=460.3, cx=363.0, cy=248.1,
    dist=(-0.2917, 0.08228, 5.333e-05, -1.578e-04),
    width=752, height=480,
)


def make_cam():
    return PinholeCamera.create(**EUROC)


def test_project_lift_roundtrip(rng):
    cam = make_cam()
    # points well in front of the camera, inside the FOV
    n = rng.uniform(-0.5, 0.5, size=(200, 2)).astype(np.float32)
    depth = rng.uniform(1.0, 10.0, size=(200, 1)).astype(np.float32)
    pts = np.concatenate([n * depth, depth], axis=-1)
    px = cam.project(jnp.asarray(pts))
    lifted = cam.lift(px)
    np.testing.assert_allclose(np.asarray(lifted), n, atol=2e-4)


def test_project_center():
    cam = make_cam()
    px = cam.project(jnp.asarray([0.0, 0.0, 2.0]))
    np.testing.assert_allclose(px, [EUROC["cx"], EUROC["cy"]], atol=1e-4)


def test_no_distortion_is_linear(rng):
    cam = PinholeCamera.create(400.0, 400.0, 320.0, 240.0, (0, 0, 0, 0), 640, 480)
    pts = jnp.asarray([[0.1, -0.2, 1.0], [0.0, 0.0, 3.0]])
    px = cam.project(pts)
    np.testing.assert_allclose(px, [[360.0, 160.0], [320.0, 240.0]], atol=1e-4)


def test_in_view():
    cam = make_cam()
    px = jnp.asarray([[0.0, 0.0], [751.0, 479.0], [-1.0, 5.0], [400.0, 480.0]])
    np.testing.assert_array_equal(
        np.asarray(cam.in_view(px)), [True, True, False, False]
    )


def test_lift_to_ray():
    cam = make_cam()
    rays = cam.lift_to_ray(jnp.asarray([[363.0, 248.1]]))
    assert rays.shape == (1, 3)
    np.testing.assert_allclose(rays[0, 2], 1.0)


def test_mei_live_pipeline_smoke(tmp_path):
    """The Mei/unified model through the LIVE path: factory build, world
    render (numpy project + ray grid), sensor.yaml round trip with the
    mirror parameter, and the front-end tracking real rendered frames."""
    import numpy as np

    from cvids_tpu.camera import MeiCamera, make_camera
    from cvids_tpu.io import euroc, euroc_synth, synthetic
    from cvids_tpu.utils.config import AgentConfig, CameraConfig
    from cvids_tpu.vio.frontend import AgentFrontend

    cam_cfg = CameraConfig(fx=190.0, fy=190.0, cx=160.0, cy=120.0,
                           k1=-0.05, k2=0.01, p1=0.0, p2=0.0,
                           width=320, height=240, model="mei", xi=0.9)
    cam = make_camera(cam_cfg)
    assert isinstance(cam, MeiCamera)
    cfg = AgentConfig(camera=cam_cfg, fast_threshold=12.0,
                      min_feature_dist=16)
    root = str(tmp_path / "mei")
    traj = synthetic.Trajectory.circle(radius=4.0, omega=0.35)
    euroc_synth.write_euroc_sequence(root, cfg=cfg, trajectory=traj,
                                     duration=1.5, cam_rate=4.0,
                                     imu_rate=100.0, num_landmarks=600,
                                     seed=5, world_seed=6)
    lcfg = euroc.load_agent_config(root)
    assert lcfg.camera.model == "mei" and abs(lcfg.camera.xi - 0.9) < 1e-9
    seq = euroc.load_euroc(root)
    fe = AgentFrontend(lcfg, 0)
    prev_t = None
    for fi in range(len(seq.cam_t)):
        t = seq.cam_t[fi]
        img = seq.load_image(fi)
        if prev_t is None:
            sel = (seq.imu_t >= t - 0.1) & (seq.imu_t < t)
            fe.process_keyframe(t, img, np.zeros((0, 3)), seq.acc[sel],
                                np.zeros(0))
        else:
            sel = (seq.imu_t >= prev_t) & (seq.imu_t < t)
            ts = seq.imu_t[sel]
            fe.process_keyframe(t, img, seq.gyr[sel], seq.acc[sel],
                                np.diff(np.append(ts, t)))
        prev_t = t
    # the Mei lift/project interface carried real tracks through the window
    assert int(fe.feat_valid.sum()) >= 40
    assert int(np.asarray(fe.state.lm_valid).sum()) >= 10
