"""Raw HBM streaming bandwidth probe on the attached chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print(f"devices: {jax.devices()}", file=sys.stderr)

for mb, dtype in [(256, jnp.bfloat16), (256, jnp.float32), (1024, jnp.bfloat16)]:
    n = mb * 2 ** 20 // np.dtype(dtype).itemsize
    x = jnp.arange(n, dtype=jnp.uint32).astype(dtype).reshape(-1, 1024)

    @jax.jit
    def chain(x):
        y = x
        for i in range(8):
            y = jax.lax.optimization_barrier(y + dtype(1))
        # scalar fence: lazy tunnel runtimes only force on a fetched value
        return jnp.sum(y[:1, :128].astype(jnp.float32))

    _ = float(chain(x))
    best = None
    for _ in range(4):
        t0 = time.time()
        _ = float(chain(x))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    per_pass = best / 8
    bw = 2 * x.nbytes / per_pass / 1e9
    print(f"{mb} MiB {np.dtype(dtype).name}: {per_pass*1000:.2f} ms/pass, "
          f"{bw:.0f} GB/s (r+w)", flush=True)
