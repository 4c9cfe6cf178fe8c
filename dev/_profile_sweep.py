import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Time the plane-sweep's internal stages on the real TPU: the alignment
warp, the interpolation-matrix build, the two banded einsums, and the
validity/AD/box3 epilogue — each as cumulative prefixes in one jitted scan."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cvids_tpu.dense import estimator
from cvids_tpu.ops import costvolume
from cvids_tpu.ops.image import projective_warp_mxu
from cvids_tpu.ops.costvolume import _interp_matrix, _box3

cfg = estimator.DenseConfig()
H, W, D = cfg.height, cfg.width, cfg.num_depths
rng = np.random.default_rng(0)
f = 461.0
k = np.array([[f, 0, 320], [0, f, 240], [0, 0, 1]], np.float32)
pad = 80
tex = rng.uniform(0, 255, (H, W + 2 * pad)).astype(np.float32)
ref = jnp.asarray(tex[:, pad:pad + W])
meas = jnp.asarray(tex[:, pad + 16:pad + 16 + W])
a_mat = jnp.asarray(k @ np.linalg.inv(k) + rng.normal(0, 1e-4, (3, 3)).astype(np.float32))
b_vec = jnp.asarray(k @ np.array([-0.11, 0, 0], np.float32))
inv_depths = jnp.asarray(cfg.inv_depths)

N = 20
f32 = jnp.float32
cdt = cfg.jdtype


def timeit(name, step):
    g = jax.jit(lambda c: lax.scan(lambda s, _: (step(s), None), c, None,
                                   length=N)[0])
    c0 = jnp.float32(0.0)
    out = g(c0)
    _ = float(out)
    best = None
    for _ in range(3):
        t0 = time.time()
        out = g(c0)
        _ = float(out)
        dt = (time.time() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best * 1000:.2f} ms/frame", flush=True)
    return best


def warp_part(s):
    meas_cov, cov_pw = projective_warp_mxu(meas + s * 1e-9, a_mat)
    return meas_cov / jnp.maximum(cov_pw, 1e-3)


def pos_part(s):
    c = jnp.linalg.solve(a_mat.astype(f32), b_vec.astype(f32))
    rho = inv_depths.astype(f32)
    den = 1.0 + c[2] * rho
    sc = jnp.where(jnp.abs(den) > 1e-3, 1.0 / den, 0.0)
    u = jnp.arange(W, dtype=f32)
    v = jnp.arange(H, dtype=f32)
    pos_x = (u[None, :] + (c[0] * rho)[:, None] + s * 1e-9) * sc[:, None]
    pos_y = (v[None, :] + (c[1] * rho)[:, None]) * sc[:, None]
    return pos_x, pos_y


def mat_part(s):
    pos_x, pos_y = pos_part(s)
    wx = _interp_matrix(pos_x, W, cdt)
    wy = _interp_matrix(pos_y, H, cdt)
    return wx, wy


def sweep_part(s):
    img = warp_part(s).astype(cdt)
    wx, wy = mat_part(s)
    rowp = jnp.einsum("hw,dpw->dhp", img, wx, preferred_element_type=cdt)
    warped = jnp.einsum("dhp,dqh->dqp", rowp, wy, preferred_element_type=cdt)
    return warped


def full_part(s):
    c, v = costvolume.plane_sweep_cost(ref + s * 1e-9, meas, a_mat, b_vec,
                                       inv_depths, out_dtype=cdt)
    return c, v


t1 = timeit("1 warp only", lambda s: jnp.sum(warp_part(s)))
t2 = timeit("2 matrices only", lambda s: sum(jnp.sum(x.astype(f32)) for x in mat_part(s)))
t3 = timeit("3 warp+mat+einsums", lambda s: jnp.sum(sweep_part(s).astype(f32)))
t4 = timeit("4 full sweep", lambda s: jnp.sum(full_part(s)[0].astype(f32)))
print(f"epilogue (4-3): {(t4 - t3) * 1000:.2f} ms")
