"""Isolated SGM / WTA kernel timings on the real chip (VERDICT r4 item 3).

Methodology for the axon tunnel: one fenced call pays a ~20 ms relay round
trip, so each measurement chains N=60 kernel invocations inside ONE jitted
lax.scan with a SCALAR carry (the input is perturbed by the carry so the
body can't be hoisted), and reports (variant - base) / N + one add-pass.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cvids_tpu.ops import pallas_kernels as pk

print(f"devices: {jax.devices()}", file=sys.stderr)

H, W, D = 480, 640, 128
rng = np.random.default_rng(0)
cost = jnp.asarray(rng.uniform(0, 50, (H, W, D)).astype(np.float32),
                   jnp.bfloat16)
p2 = jnp.asarray(rng.uniform(40, 70, (H, W)).astype(np.float32))
N = 60



# numeric parity of the tiled-u16 axis1 kernel vs the XLA scan formulation
from cvids_tpu.ops import sgm as _sgm
_small = cost[:, :, :]
_f, _b = pk.sgm_scan_bidir_axis1(_small, p2, 16.0, summed=False)
_ref = _sgm._scan_bidir(jnp.moveaxis(_small, 1, 0).astype(jnp.float32),
                        jnp.float32(16.0), p2.T)
_got = jnp.moveaxis((_f + _b).astype(jnp.float32), 1, 0)
_err = float(jnp.max(jnp.abs(_got - _ref)))
print(f"axis1 kernel max err vs XLA scan: {_err:.3f}", flush=True)
assert _err < 2.0, _err   # bf16 storage quantization at ~300-scale values


def bench(name, body):
    """body(x (H,W,D) bf16) -> array whose [0,...,0] feeds the carry."""

    @jax.jit
    def run(c0):
        def step(s, _):
            x = cost + s
            y = body(x)
            return y.reshape(-1)[0].astype(jnp.bfloat16) * jnp.bfloat16(1e-6), None
        s, _ = lax.scan(step, c0, None, length=N)
        return s

    _ = float(run(jnp.bfloat16(0.0)))
    best = None
    for _ in range(3):
        t0 = time.time()
        _ = float(run(jnp.bfloat16(0.0)))
        dt = (time.time() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best * 1000:.2f} ms/iter", flush=True)
    return best


def _xla_wta(x):
    from cvids_tpu.ops import sgm as sgm_mod
    agg = (x.astype(jnp.float32) * 4)
    idx, conf = sgm_mod.wta_depth(agg)
    return idx


base = bench("base (add pass only)", lambda x: x)
bench("sgm_axis1 H-orient", lambda x: pk.sgm_scan_bidir_axis1(x, p2, 16.0,
                                                             summed=False)[0])
bench("sgm_axis0 V-orient", lambda x: pk.sgm_scan_bidir(x, p2, 16.0,
                                                        summed=False)[0])
bench("wta x4", lambda x: pk.wta_pallas(x, x, x, x)[0])
bench("wta x2", lambda x: pk.wta_pallas(x, x)[0])
bench("xla sum4 + wta-math", _xla_wta)

# post-change check: axis1 with u=16 + the XLA wta as used by sgm_depth
from cvids_tpu.ops import sgm as sgm_mod
grad = jnp.asarray(rng.uniform(0, 20, (H, W)).astype(np.float32))
bench("sgm_axis1 u16", lambda x: pk.sgm_scan_bidir_axis1(x, p2, 16.0,
                                                         summed=False)[0])
bench("sgm_depth full (agg+wta)",
      lambda x: sgm_mod.sgm_depth(x, grad, jnp.linspace(0.02, 2.5, D))[0])
