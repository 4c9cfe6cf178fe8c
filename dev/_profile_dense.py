import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cvids_tpu.dense import estimator
from cvids_tpu.ops import costvolume, sgm, depth_filter

cfg = estimator.DenseConfig()
rng = np.random.default_rng(0)
H, W, D = cfg.height, cfg.width, cfg.num_depths
f = 461.0
k = np.array([[f, 0, 320], [0, f, 240], [0, 0, 1]], np.float32)
ref = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
meas = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
a_mat = jnp.asarray(k @ np.linalg.inv(k))
b_vec = jnp.asarray(k @ np.array([-0.11, 0, 0], np.float32))
inv_depths = jnp.asarray(cfg.inv_depths)
grad = jnp.asarray(rng.uniform(0, 20, (H, W)), jnp.float32)
cost0 = jnp.asarray(rng.uniform(0, 50, (H, W, D)), jnp.bfloat16)

N = 10

def bench(name, step_fn, carry0):
    """step_fn: carry -> carry (same shape). Times N chained reps in one jit."""
    g = jax.jit(lambda c0: lax.scan(lambda c, _: (step_fn(c), None), c0, None, length=N)[0])
    out = g(carry0)
    _ = float(jnp.sum(out))
    best = None
    for _ in range(2):
        t0 = time.time()
        out = g(carry0)
        _ = float(jnp.sum(out))
        dt = (time.time() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best*1000:.1f} ms", flush=True)

# 1. full cost slice (warp + sample + AD + box)
def cost_step(c):
    cc, vv = costvolume.plane_sweep_cost(ref + c[0, 0, 0].astype(jnp.float32), meas, a_mat, b_vec, inv_depths, out_dtype=jnp.bfloat16)
    return cc
bench("plane_sweep_cost", cost_step, cost0)

# 2. accumulate
def acc_step(c):
    m, n = costvolume.accumulate_cost(c, jnp.ones_like(c), c, c > 10)
    return m
bench("accumulate_cost", acc_step, cost0)

# 3. SGM aggregate (4 scans)
def sgm_step(c):
    return (sgm.sgm_aggregate(c, grad.astype(c.dtype)) * 0.25).astype(c.dtype)
bench("sgm_aggregate", sgm_step, cost0)

# 4. WTA
def wta_step(c):
    idx, conf = sgm.wta_depth(c.astype(jnp.float32))
    return c + (idx[..., None] * 1e-6).astype(c.dtype)
bench("wta_depth", wta_step, cost0)

# 5. filter update
filt0 = depth_filter.init_state(H, W)
def filt_step(c):
    fs = depth_filter.FilterState(mu=c[..., 0], sigma2=c[..., 1] + 1.0,
                                  a=c[..., 2] + 1.0, b=c[..., 3] + 1.0)
    fs2 = depth_filter.update(fs, c[..., 4] * 0.01, c[..., 5] * 1e-4 + 1e-5, c[..., 6] > 25)
    return c.at[..., 0].set(fs2.mu)
bench("filter_update", filt_step, jnp.asarray(rng.uniform(1, 50, (H, W, 8)), jnp.float32))

# 6. pre-warp alone (the single gather)
from cvids_tpu.ops.image import bilinear_sample
u = jnp.arange(W, dtype=jnp.float32)
v = jnp.arange(H, dtype=jnp.float32)
uu, vv = jnp.meshgrid(u, v)
pp = jnp.einsum("ij,jhw->ihw", a_mat, jnp.stack([uu, vv, jnp.ones_like(uu)]))
zz = jnp.where(jnp.abs(pp[2]) > 1e-6, pp[2], 1e-6)
coords2 = jnp.stack([pp[0] / zz, pp[1] / zz], axis=-1)

def prewarp_step(c):
    return c + bilinear_sample(meas + c[0, 0], coords2, fill=0.0)
bench("prewarp_gather", prewarp_step, jnp.zeros((H, W)))

# 7. sweep matmuls alone
from cvids_tpu.ops.costvolume import _interp_matrix
rho = inv_depths
cc = jnp.linalg.solve(a_mat, b_vec)
den = 1.0 + cc[2] * rho
s = 1.0 / den
pos_x = (u[None, :] + (cc[0] * rho)[:, None]) * s[:, None]
pos_y = (v[None, :] + (cc[1] * rho)[:, None]) * s[:, None]

def matmul_step(c):
    wx = _interp_matrix(pos_x + c[0, 0, 0].astype(jnp.float32) * 1e-9, W)
    wy = _interp_matrix(pos_y, H)
    stack = jnp.stack([meas, jnp.ones_like(meas)])
    rowp = jnp.einsum("chw,dpw->cdhp", stack, wx, preferred_element_type=jnp.float32)
    swept = jnp.einsum("cdhp,dqh->cdqp", rowp, wy, preferred_element_type=jnp.float32)
    return jnp.moveaxis(swept[0], 0, -1).astype(c.dtype)
bench("sweep_matmuls_f32", matmul_step, cost0)

def matmul_step_bf16(c):
    wx = _interp_matrix(pos_x + c[0, 0, 0].astype(jnp.float32) * 1e-9, W).astype(jnp.bfloat16)
    wy = _interp_matrix(pos_y, H).astype(jnp.bfloat16)
    stack = jnp.stack([meas, jnp.ones_like(meas)]).astype(jnp.bfloat16)
    rowp = jnp.einsum("chw,dpw->cdhp", stack, wx, preferred_element_type=jnp.bfloat16)
    swept = jnp.einsum("cdhp,dqh->cdqp", rowp, wy, preferred_element_type=jnp.bfloat16)
    return jnp.moveaxis(swept[0], 0, -1)
bench("sweep_matmuls_bf16", matmul_step_bf16, cost0)

# interp-matrix build alone (two (D, N, N) hat-weight tensors = 92 MB bf16)
def interp_step(c):
    wx = _interp_matrix(pos_x + c[0, 0, 0].astype(jnp.float32) * 1e-9, W)
    wy = _interp_matrix(pos_y, H)
    return c + (jnp.sum(wx) + jnp.sum(wy)).astype(c.dtype) * 1e-12
bench("interp_matrix_build", interp_step, cost0)
