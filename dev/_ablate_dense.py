import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Ablation profile of the fused dense step on the real TPU: time cumulative
prefixes of the pipeline (sweep -> +accumulate -> +sgm -> +wta -> +filter)
inside one jitted scan each, so stage costs are measured in their fused
context rather than standalone."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cvids_tpu.dense import estimator
from cvids_tpu.ops import costvolume, depth_filter, sgm

cfg = estimator.DenseConfig()
H, W, D = cfg.height, cfg.width, cfg.num_depths
rng = np.random.default_rng(0)
f = 461.0
k = np.array([[f, 0, 320], [0, f, 240], [0, 0, 1]], np.float32)
pad = 80
tex = rng.uniform(0, 255, (H, W + 2 * pad)).astype(np.float32)
ref = jnp.asarray(tex[:, pad:pad + W])
meas = jnp.asarray(tex[:, pad + 16:pad + 16 + W])
a_mat = jnp.asarray(k @ np.linalg.inv(k))
b_vec = jnp.asarray(k @ np.array([-0.11, 0, 0], np.float32))
inv_depths = jnp.asarray(cfg.inv_depths)
grad = jnp.asarray(rng.uniform(0, 20, (H, W)), jnp.float32)

N = 20


def timeit(name, step, carry0):
    # CAVEAT: the step closures capture meas/a_mat as jit constants, which
    # the AOT runtime re-materializes once per scan iteration (~0.45 ms of
    # phantom per-frame cost, measured via a no-op body). Stage DELTAS are
    # unaffected (every stage pays it equally); absolute ms are inflated —
    # bench.py passes everything as arguments and is the honest headline.
    g = jax.jit(lambda c: lax.scan(lambda s, _: (step(s), None), c, None,
                                   length=N)[0])
    out = g(carry0)
    fence = lambda o: float(sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(o)))
    _ = fence(out)
    best = None
    for _ in range(3):
        t0 = time.time()
        out = g(carry0)
        _ = fence(out)
        dt = (time.time() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best * 1000:.2f} ms/frame", flush=True)
    return best


state0 = estimator.init_reference(cfg, ref)

# A: plane-sweep only
def step_a(st):
    c, v = costvolume.plane_sweep_cost(
        ref + st.num_frames.astype(jnp.float32) * 1e-9, meas, a_mat, b_vec,
        inv_depths, out_dtype=cfg.jdtype)
    return st._replace(mean_cost=c, count=v.astype(c.dtype),
                       num_frames=st.num_frames + 1)

# B: + accumulate
def step_b(st):
    c, v = costvolume.plane_sweep_cost(
        ref + st.num_frames.astype(jnp.float32) * 1e-9, meas, a_mat, b_vec,
        inv_depths, out_dtype=cfg.jdtype)
    m, n = costvolume.accumulate_cost(st.mean_cost, st.count, c, v)
    return st._replace(mean_cost=m, count=n, num_frames=st.num_frames + 1)

# C: + total + sgm aggregate (no wta)
def step_c(st):
    st = step_b(st)
    observed = st.count > 0
    total = jnp.where(observed, st.mean_cost,
                      jnp.asarray(50.0, st.mean_cost.dtype))
    if st.sparse_bias is not None:
        total = total + st.sparse_bias
    agg = sgm.sgm_aggregate(total, st.grad.astype(total.dtype))
    # fold a cheap reduction of agg into the carry to keep it live
    return st._replace(filt=st.filt._replace(
        mu=st.filt.mu + jnp.mean(agg, -1) * 1e-9))

# D: + wta
def step_d(st):
    st = step_b(st)
    observed = st.count > 0
    total = jnp.where(observed, st.mean_cost,
                      jnp.asarray(50.0, st.mean_cost.dtype))
    if st.sparse_bias is not None:
        total = total + st.sparse_bias
    inv_d, conf = sgm.sgm_depth(total, st.grad.astype(total.dtype), inv_depths,
                                valid_count=jnp.sum(observed, -1),
                                min_count=cfg.num_depths * 0.25)
    return st._replace(filt=st.filt._replace(
        mu=st.filt.mu + inv_d * 1e-9 + conf * 1e-9))

# E: full
def step_e(st):
    return estimator.fuse_measurement(cfg, st, meas, a_mat, b_vec)


ta = timeit("A sweep", step_a, state0)
tb = timeit("B +accumulate", step_b, state0)
tc = timeit("C +sgm_agg", step_c, state0)
td = timeit("D +wta", step_d, state0)
te = timeit("E full(+filter)", step_e, state0)
print(f"deltas: acc {1000*(tb-ta):.2f}  sgm {1000*(tc-tb):.2f}  "
      f"wta {1000*(td-tc):.2f}  filter {1000*(te-td):.2f} ms")
