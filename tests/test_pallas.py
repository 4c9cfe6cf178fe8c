"""Pallas kernels vs their XLA references (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from cvids_tpu.ops import depth_filter, hamming, pallas_kernels as pk


def test_pallas_hamming_matches_xla(rng):
    a = jnp.asarray(rng.integers(0, 2 ** 32, (37, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2 ** 32, (211, 8), dtype=np.uint32))
    ref = hamming.hamming_distance_matrix(a, b)
    out = pk.hamming_matrix(a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_hamming_exact_tile_sizes(rng):
    a = jnp.asarray(rng.integers(0, 2 ** 32, (128, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2 ** 32, (256, 8), dtype=np.uint32))
    ref = hamming.hamming_distance_matrix(a, b)
    out = pk.hamming_matrix(a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_depth_filter_matches_xla(rng):
    h, w = 13, 150  # deliberately unaligned
    st = depth_filter.FilterState(
        mu=jnp.asarray(rng.uniform(0.2, 1.0, (h, w)).astype(np.float32)),
        sigma2=jnp.asarray(rng.uniform(0.01, 1.0, (h, w)).astype(np.float32)),
        a=jnp.full((h, w), 15.0), b=jnp.full((h, w), 15.0))
    x = jnp.asarray(rng.uniform(0.1, 1.5, (h, w)).astype(np.float32))
    # some out-of-range + invalid measurements
    x = x.at[0, 0].set(500.0)
    tau2 = jnp.full((h, w), 0.01)
    valid = jnp.ones((h, w), bool).at[1, 1].set(False)
    ref = depth_filter.update(st, x, tau2, valid)
    out = pk.depth_filter_update(st, x, tau2, valid, interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-5,
                                   atol=1e-6)


def test_dispatch_wrapper_falls_back_on_cpu(rng):
    # on the CPU test backend the wrapper must route to XLA
    a = jnp.asarray(rng.integers(0, 2 ** 32, (5, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2 ** 32, (6, 8), dtype=np.uint32))
    assert not pk.pallas_supported()
    d = pk.hamming_distance_matrix(a, b)
    np.testing.assert_array_equal(np.asarray(d),
                                  np.asarray(hamming.hamming_distance_matrix(a, b)))
