"""Production-shape kernel compile/run on a real TPU chip.

Regression guard for the round-1 failure class where Pallas kernels passed
interpret-mode tests at toy shapes but OOM'd scoped VMEM at the production
geometry (480, 640, 128) — the exact shape the reference's CUDA pipeline
compiles for (`/root/reference/server_pose_graph/include/dense_mapping/
dense_mapping_parameters.h:19-35`).

The tests/ conftest forces JAX_PLATFORMS=cpu in-process (unit tests must not
ride the TPU tunnel), so the payload runs in a subprocess with the session's
real backend; the whole module skips unless that backend is a TPU.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = "import jax; print(jax.default_backend())"

_PAYLOAD = r"""
import numpy as np, jax, jax.numpy as jnp
from cvids_tpu.dense import estimator
from cvids_tpu.ops.pallas_kernels import _wta_tiles
assert jax.default_backend() == "tpu", jax.default_backend()
cfg = estimator.DenseConfig()   # 480 x 640 x 128 production geometry
# the WTA tile chooser must find a VMEM-safe tiling at production shape
tiles = _wta_tiles(cfg.height, cfg.width, cfg.num_depths,
                   jnp.dtype(cfg.jdtype).itemsize, n_vols=4)
assert tiles is not None
rng = np.random.default_rng(0)
ref = jnp.asarray(rng.uniform(0, 255, (cfg.height, cfg.width)).astype(np.float32))
meas = jnp.asarray(rng.uniform(0, 255, (cfg.height, cfg.width)).astype(np.float32))
k = jnp.asarray([[461.0, 0, 320], [0, 461.0, 240], [0, 0, 1]], jnp.float32)
a = k @ jnp.linalg.inv(k)
b = k @ jnp.asarray([-0.11, 0.0, 0.0], jnp.float32)
st = estimator.init_reference(cfg, ref)
st = estimator.fuse_measurement(cfg, st, meas, a, b)   # compiles ALL kernels
jax.block_until_ready(st.filt.mu)
assert np.isfinite(np.asarray(st.filt.mu)).all()
print("FUSE_OK")
"""


def _real_backend_env():
    """Environment without the conftest's CPU forcing, so the subprocess sees
    the session's real JAX backend (TPU tunnel, if present)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(f for f in flags.split()
                                if "host_platform_device_count" not in f)
    return env


def test_fuse_measurement_production_shape_on_tpu():
    env = _real_backend_env()
    probe = subprocess.run([sys.executable, "-c", _PROBE], env=env, cwd=_REPO,
                           capture_output=True, text=True, timeout=300)
    backend = probe.stdout.strip().splitlines()[-1] if probe.stdout.strip() else ""
    if probe.returncode != 0 or backend != "tpu":
        pytest.skip(f"no TPU backend available (got {backend!r})")
    res = subprocess.run([sys.executable, "-c", _PAYLOAD], env=env, cwd=_REPO,
                         capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "FUSE_OK" in res.stdout
