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
