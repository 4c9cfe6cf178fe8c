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


def test_sgm_scan_bidir_matches_lax_scan(rng):
    """Pallas grid-as-scan SGM kernel == the lax.scan reference, both
    directions, unrolled and u=1 fallback paths (interpret mode)."""
    from cvids_tpu.ops import sgm
    from cvids_tpu.ops.pallas_kernels import sgm_scan_bidir

    p1 = jnp.asarray(16.0)
    for s in (48, 45):  # 48 hits the unrolled path, 45 the u=1 fallback
        cost = jnp.asarray(rng.uniform(0, 50, (s, 32, 128)), jnp.float32)
        p2 = jnp.asarray(rng.uniform(30, 70, (s, 32)), jnp.float32)
        ref = sgm._scan_bidir(cost, p1, p2)
        out = sgm_scan_bidir(cost, p2, p1, interpret=True)
        assert np.abs(np.asarray(ref) - np.asarray(out)).max() < 1e-4


def test_wta_pallas_matches_xla(rng):
    """Fused Pallas WTA == sgm.wta_depth on the summed volume, including
    tie-at-minimum and boundary-index cases (interpret mode)."""
    from cvids_tpu.ops import sgm
    from cvids_tpu.ops.pallas_kernels import wta_pallas

    h, w, d = 16, 32, 128
    a = rng.uniform(0, 50, (h, w, d)).astype(np.float32)
    b = rng.uniform(0, 50, (h, w, d)).astype(np.float32)
    # exact ties at two depths (argmin must take the first)
    a[0, 0, :] = 10.0
    b[0, 0, :] = 5.0
    a[1, 1, 3] = a[1, 1, 90] = -60.0
    # minimum at the boundary indices -> conf must be False there
    a[2, 2, 0] = -100.0
    a[3, 3, d - 1] = -100.0
    av, bv = jnp.asarray(a), jnp.asarray(b)
    ref_idx, ref_conf = sgm.wta_depth((av + bv).astype(jnp.float32))
    idx, conf = wta_pallas(av, bv, interpret=True)
    np.testing.assert_allclose(np.asarray(idx), np.asarray(ref_idx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(conf), np.asarray(ref_conf))


def test_wta_pallas_bf16_inputs(rng):
    """bf16 part-volumes are summed in fp32 in-kernel; results track the
    XLA path run on the same bf16 data."""
    from cvids_tpu.ops import sgm
    from cvids_tpu.ops.pallas_kernels import wta_pallas

    h, w, d = 8, 16, 128
    a = jnp.asarray(rng.uniform(0, 50, (h, w, d)), jnp.bfloat16)
    b = jnp.asarray(rng.uniform(0, 50, (h, w, d)), jnp.bfloat16)
    ref_idx, ref_conf = sgm.wta_depth(
        (a.astype(jnp.float32) + b.astype(jnp.float32)))
    idx, conf = wta_pallas(a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(idx), np.asarray(ref_idx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(conf), np.asarray(ref_conf))


def test_sgm_axis1_and_variadic_wta(rng):
    """The transpose-free axis-1 SGM kernel == the lax.scan horizontal
    orientation, and the 4-volume WTA == XLA WTA on the full sum — the
    production TPU path (`sgm_depth` with unsummed directional parts)."""
    from cvids_tpu.ops import sgm
    from cvids_tpu.ops.pallas_kernels import (sgm_scan_bidir,
                                              sgm_scan_bidir_axis1,
                                              wta_pallas)

    h, w, d = 16, 32, 128
    cost = jnp.asarray(rng.uniform(0, 50, (h, w, d)), jnp.float32)
    p2 = jnp.asarray(rng.uniform(30, 90, (h, w)), jnp.float32)
    p1 = jnp.asarray(16.0)
    ref_h = jnp.moveaxis(sgm._scan_bidir(jnp.moveaxis(cost, 1, 0), p1, p2.T),
                         0, 1)
    hf, hb = sgm_scan_bidir_axis1(cost, p2, p1, interpret=True, summed=False)
    np.testing.assert_allclose(np.asarray(hf + hb), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-4)
    vf, vb = sgm_scan_bidir(cost, p2, p1, interpret=True, summed=False)
    ref_v = sgm._scan_bidir(cost, p1, p2)
    np.testing.assert_allclose(np.asarray(vf + vb), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-4)
    ref_idx, ref_conf = sgm.wta_depth((hf + hb + vf + vb).astype(jnp.float32))
    idx, conf = wta_pallas(hf, hb, vf, vb, interpret=True)
    np.testing.assert_allclose(np.asarray(idx), np.asarray(ref_idx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(conf), np.asarray(ref_conf))


def test_plane_sweep_pallas_matches_xla(rng):
    """Fused per-depth sweep kernel vs the XLA formulation: identical
    validity and bf16-quantization-level cost agreement (interpret mode)."""
    import jax.numpy as jnp_
    from cvids_tpu.ops import costvolume
    from cvids_tpu.ops.image import projective_warp_mxu
    from cvids_tpu.ops.pallas_kernels import plane_sweep_pallas

    H, W, D = 16, 128, 8
    ref = jnp_.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    meas = jnp_.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    k = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32)
    r = np.eye(3, dtype=np.float32)
    r[0, 1], r[1, 0] = 0.01, -0.01
    a_mat = jnp_.asarray(k @ r @ np.linalg.inv(k))
    b_vec = jnp_.asarray(k @ np.array([-0.1, 0.02, 0.01], np.float32))
    inv_depths = jnp_.asarray((np.arange(D) + 1) * 0.05, jnp_.float32)

    c_x, v_x = costvolume.plane_sweep_cost(ref, meas, a_mat, b_vec,
                                           inv_depths, use_pallas=False)
    pos_x, pos_y, mx, my = costvolume._sweep_positions(a_mat, b_vec,
                                                       inv_depths, H, W)
    mc, cov = projective_warp_mxu(meas, a_mat)
    meas_al = mc / jnp_.maximum(cov, 1e-3)
    cd = plane_sweep_pallas(ref, meas_al, pos_x, pos_y, mx, my,
                            out_dtype=jnp_.float32, interpret=True)
    c_hwd = jnp_.transpose(cd, (1, 2, 0))
    v_p = np.asarray(c_hwd >= 0)
    c_p = np.asarray(jnp_.maximum(c_hwd, 0.0))
    assert (v_p == np.asarray(v_x)).all()
    both = v_p & np.asarray(v_x)
    err = np.abs(c_p - np.asarray(c_x))[both]
    # kernel matmuls run bf16 (production config); ~0.4% of intensity scale
    assert err.max() < 1.5, err.max()
    assert err.mean() < 0.2, err.mean()
