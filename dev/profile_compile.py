"""Per-stage compile-time profile of the dense fusion program on the real
TPU (VERDICT r3 weak #2: compile+first-20-frames regressed 123 s -> 801 s).

Times `jax.jit(...).lower().compile()` for each kernel in isolation, then the
full fuse_measurement step, then the 20-frame scan. Run on the axon TPU:
    python dev/profile_compile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cvids_tpu.dense import estimator
from cvids_tpu.ops import costvolume, pallas_kernels as pk, sgm

print(f"devices: {jax.devices()}", file=sys.stderr)

cfg = estimator.DenseConfig()
H, W, D = cfg.height, cfg.width, cfg.num_depths
rng = np.random.default_rng(0)
f = 461.0
k = np.array([[f, 0, 320], [0, f, 240], [0, 0, 1]], np.float32)
ref = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
meas = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
a_mat = jnp.asarray(k @ np.linalg.inv(k))
b_vec = jnp.asarray(k @ np.array([-0.11, 0, 0], np.float32))


def clock(name, fn, *args, **kw):
    t0 = time.time()
    c = jax.jit(fn, **kw).lower(*args).compile()
    dt = time.time() - t0
    print(f"{name:45s} compile {dt:7.1f}s", file=sys.stderr)
    return c


# individual kernels
pos_x = jnp.zeros((D, W))
pos_y = jnp.zeros((D, H))
mx = jnp.zeros((D, 3, W))
my = jnp.zeros((D, 3, H))
clock("plane_sweep_pallas", lambda *a: pk.plane_sweep_pallas(*a),
      ref, meas, pos_x, pos_y, mx, my)

clock("projective_warp_banded", lambda i, m: pk.projective_warp_banded(i, m),
      ref, jnp.eye(3))

cost = jnp.zeros((H, W, D), jnp.bfloat16)
p2 = jnp.zeros((H, W))
clock("sgm_scan_bidir_axis1", lambda c, p: pk.sgm_scan_bidir_axis1(c, p, 16.0),
      cost, p2)
costT = jnp.zeros((W, H, D), jnp.bfloat16)
clock("sgm_scan_bidir(vert)", lambda c, p: pk.sgm_scan_bidir(c, p, 16.0),
      costT, p2.T)
clock("wta_pallas x4", lambda *v: pk.wta_pallas(*v),
      cost, cost, cost, cost)

# the composed single-frame step
state = estimator.init_reference(cfg, ref)
t0 = time.time()
c1 = jax.jit(lambda s, m, a, b: estimator.fuse_measurement(cfg, s, m, a, b)) \
    .lower(state, meas, a_mat, b_vec).compile()
print(f"{'fuse_measurement (1 frame)':45s} compile {time.time() - t0:7.1f}s",
      file=sys.stderr)

# the 20-frame scan (bench.py's program)
from jax import lax
from functools import partial


@partial(jax.jit, static_argnums=0)
def fuse_n(cfg_, st, m, a, b_):
    def body(s, _):
        return estimator.fuse_measurement(cfg_, s, m, a, b_), None
    st, _ = lax.scan(body, st, None, length=20)
    return st, jnp.sum(st.filt.mu) + jnp.sum(st.mean_cost)


t0 = time.time()
c2 = fuse_n.lower(cfg, state, meas, a_mat, b_vec).compile()
print(f"{'fuse_n scan(20)':45s} compile {time.time() - t0:7.1f}s",
      file=sys.stderr)
