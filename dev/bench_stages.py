"""Stage breakdown of fuse_measurement on the real chip (r4 perf work)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cvids_tpu.dense import estimator
from cvids_tpu.ops import costvolume, depth_filter, sgm

print(f"devices: {jax.devices()}", file=sys.stderr)

cfg = estimator.DenseConfig()
H, W, D = cfg.height, cfg.width, cfg.num_depths
rng = np.random.default_rng(0)
ref = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
meas = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
k = np.array([[461.0, 0, 320], [0, 461.0, 240], [0, 0, 1]], np.float32)
a_mat = jnp.asarray(k @ np.linalg.inv(k))
b_vec = jnp.asarray(k @ np.array([-0.11, 0, 0], np.float32))
inv_depths = jnp.asarray(cfg.inv_depths)
grad = jnp.asarray(rng.uniform(0, 20, (H, W)), jnp.float32)
state0 = estimator.init_reference(cfg, ref)
N = 40


def bench(name, body):
    @jax.jit
    def run(c0):
        def step(s, _):
            y = body(s)
            return y.reshape(-1)[0].astype(jnp.float32) * 1e-6, None
        s, _ = lax.scan(step, c0, None, length=N)
        return s

    _ = float(run(jnp.float32(0.0)))
    best = None
    for _ in range(3):
        t0 = time.time()
        _ = float(run(jnp.float32(0.0)))
        dt = (time.time() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best * 1000:.2f} ms/iter", flush=True)


base_cost = jnp.asarray(rng.uniform(0, 50, (H, W, D)), jnp.bfloat16)

bench("base", lambda s: meas + s)
bench("sweep (cost slice only)",
      lambda s: costvolume.plane_sweep_cost(ref, meas + s, a_mat, b_vec,
                                            inv_depths, out_dtype=jnp.bfloat16,
                                            banded_warp=True)[0])
bench("accumulate_cost",
      lambda s: costvolume.accumulate_cost(base_cost + s.astype(jnp.bfloat16),
                                           base_cost, base_cost,
                                           base_cost > 10)[0])
bench("total-construct + sgm_depth",
      lambda s: sgm.sgm_depth(base_cost + s.astype(jnp.bfloat16), grad,
                              inv_depths, pi1=cfg.pi1, pi2=cfg.pi2,
                              tau_so=cfg.tau_so)[0])
bench("filter update",
      lambda s: depth_filter.update(
          state0.filt, state0.filt.mu + s, jnp.full((H, W), 0.01),
          jnp.ones((H, W), bool)).mu)
bench("FULL fuse_measurement",
      lambda s: estimator.fuse_measurement(cfg, state0, meas + s, a_mat,
                                           b_vec, banded_warp=True).filt.mu)

# --- sweep internals ---
from cvids_tpu.ops import pallas_kernels as pk
from cvids_tpu.ops.costvolume import _sweep_positions

pos_x, pos_y, mx, my = _sweep_positions(a_mat, b_vec, inv_depths, H, W)
dhw = jnp.asarray(rng.uniform(0, 50, (D, H, W)), jnp.bfloat16)

bench("warp banded", lambda s: pk.projective_warp_banded(meas + s, a_mat)[0])
bench("plane_sweep_pallas kernel",
      lambda s: pk.plane_sweep_pallas(ref, meas + s, pos_x, pos_y, mx, my))
bench("transpose DHW->HWD",
      lambda s: jnp.transpose(dhw + s.astype(jnp.bfloat16), (1, 2, 0)))
bench("max+cmp epilogue",
      lambda s: jnp.maximum(base_cost + s.astype(jnp.bfloat16),
                            jnp.bfloat16(0.0)))
