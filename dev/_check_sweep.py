import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from cvids_tpu.ops import costvolume

rng = np.random.default_rng(0)
H, W, D = 48, 64, 16
f = 60.0
k = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)


def ang(ax, a):
    c, s = np.cos(a), np.sin(a)
    if ax == 0:
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


for trial, (r21, t21) in enumerate([
    (np.eye(3, dtype=np.float32), np.array([-0.11, 0.02, 0.01], np.float32)),
    (ang(0, 0.05) @ ang(1, -0.08), np.array([0.2, -0.1, 0.05], np.float32)),
    (ang(1, 0.12), np.array([0.0, 0.0, 0.15], np.float32)),  # forward motion
]):
    ref = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    meas = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    a_mat = jnp.asarray(k @ r21 @ np.linalg.inv(k))
    b_vec = jnp.asarray(k @ t21)
    inv_depths = jnp.asarray((np.arange(D, dtype=np.float32) + 1) * 0.02)

    c1, v1 = costvolume.plane_sweep_cost_gather(ref, meas, a_mat, b_vec, inv_depths)
    c2, v2 = costvolume.plane_sweep_cost(ref, meas, a_mat, b_vec, inv_depths)
    c1, v1, c2, v2 = map(np.asarray, (c1, v1, c2, v2))
    both = v1 & v2
    err = np.abs(c1 - c2)[both]
    agree = (v1 == v2).mean()
    print(f"trial {trial}: valid agree {agree:.4f}  "
          f"max|dc| on both-valid {err.max() if err.size else 0:.4f}  "
          f"mean {err.mean() if err.size else 0:.5f}  "
          f"v1 {v1.mean():.3f} v2 {v2.mean():.3f}")
