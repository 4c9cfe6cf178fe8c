"""Pallas TPU kernels for the framework's hot inner ops.

These are the hand-scheduled versions of ops whose XLA formulations already
work everywhere (`ops.hamming`, `ops.depth_filter`): the Pallas path keeps
operand tiles resident in VMEM and fuses the full update into one pass —
no HBM round-trips between the XOR/popcount/reduce (matcher) or the
mixture-posterior algebra (filter). On non-TPU backends the public wrappers
fall back to the XLA implementations (bit-identical semantics, tested
against each other; the kernels themselves run under `interpret=True` in CI).

Kernels:
- `hamming_matrix`: (N, 8) x (M, 8) uint32 -> (N, M) int32 popcount
  distances, tiled 128x128 over the VPU.
- `depth_filter_update`: fused Gaussian×Beta inverse-depth filter step over
  (H, W) tiles (the reference's `FusionFilterKernel`, `calc_cost.cu:552-683`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import depth_filter as df_xla
from . import hamming as hamming_xla

__all__ = ["hamming_matrix", "depth_filter_update", "pallas_supported",
           "sgm_scan_bidir", "wta_pallas"]


def pallas_supported() -> bool:
    return jax.default_backend() in ("tpu",)


# ---------------------------------------------------------------------------
# Hamming distance matrix
# ---------------------------------------------------------------------------

_TILE_N = 128
_TILE_M = 128


def _hamming_kernel(a_ref, b_ref, out_ref):
    # a: (TILE_N, 8) uint32; b: (TILE_M, 8) uint32; out: (TILE_N, TILE_M)
    a = a_ref[:]          # (TN, 8)
    b = b_ref[:]          # (TM, 8)
    x = a[:, None, :] ^ b[None, :, :]          # (TN, TM, 8)
    pc = jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = jnp.sum(pc, axis=-1)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix(a: jax.Array, b: jax.Array, interpret: bool = False) -> jax.Array:
    """Pallas pairwise Hamming distances; same contract as
    `ops.hamming.hamming_distance_matrix` without validity masking."""
    n, m = a.shape[0], b.shape[0]
    tn = -(-n // _TILE_N) * _TILE_N
    tm = -(-m // _TILE_M) * _TILE_M
    a_p = _pad_to(a, tn, 0)
    b_p = _pad_to(b, tm, 0)
    grid = (tn // _TILE_N, tm // _TILE_M)
    out = pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((tn, tm), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_M, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_N, _TILE_M), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_p, b_p)
    return out[:n, :m]


def hamming_distance_matrix(a, b, a_valid=None, b_valid=None):
    """Drop-in for `ops.hamming.hamming_distance_matrix`: Pallas on TPU,
    XLA elsewhere."""
    if pallas_supported():
        d = hamming_matrix(a, b)
        if a_valid is not None:
            d = jnp.where(a_valid[:, None], d, 512)
        if b_valid is not None:
            d = jnp.where(b_valid[None, :], d, 512)
        return d
    return hamming_xla.hamming_distance_matrix(a, b, a_valid, b_valid)


# ---------------------------------------------------------------------------
# Gaussian × Beta depth-filter update
# ---------------------------------------------------------------------------

_TILE_H = 8
_TILE_W = 128


def _filter_kernel(mu_ref, s2_ref, a_ref, b_ref, x_ref, tau2_ref, valid_ref,
                   mu_o, s2_o, a_o, b_o, *, mu_lo, mu_hi):
    mu, s2 = mu_ref[:], s2_ref[:]
    a, b = a_ref[:], b_ref[:]
    x, tau2 = x_ref[:], tau2_ref[:]
    meas_valid = valid_ref[:] != 0

    norm_scale2 = s2 + tau2
    s = 1.0 / (1.0 / jnp.maximum(s2, 1e-12) + 1.0 / jnp.maximum(tau2, 1e-12))
    m = s * (mu / jnp.maximum(s2, 1e-12) + x / jnp.maximum(tau2, 1e-12))
    pdf = jnp.exp(-0.5 * (x - mu) ** 2 / jnp.maximum(norm_scale2, 1e-12)) \
        * jax.lax.rsqrt(2 * jnp.pi * jnp.maximum(norm_scale2, 1e-12))
    uniform = 1.0 / (mu_hi - mu_lo)
    c1 = a / (a + b) * pdf
    c2 = b / (a + b) * uniform
    denom = jnp.maximum(c1 + c2, 1e-12)
    c1, c2 = c1 / denom, c2 / denom
    f = c1 * (a + 1.0) / (a + b + 1.0) + c2 * a / (a + b + 1.0)
    e = c1 * (a + 1.0) * (a + 2.0) / ((a + b + 1.0) * (a + b + 2.0)) \
        + c2 * a * (a + 1.0) / ((a + b + 1.0) * (a + b + 2.0))
    mu_new = c1 * m + c2 * mu
    s2_new = c1 * (s + m * m) + c2 * (s2 + mu * mu) - mu_new * mu_new
    a_new = (e - f) / (f - e / jnp.maximum(f, 1e-12))
    b_new = a_new * (1.0 - f) / jnp.maximum(f, 1e-12)

    hard_out = (x < mu_lo) | (x > mu_hi) | ~meas_valid
    keep = lambda new, old: jnp.where(hard_out, old, new)
    mu_o[:] = keep(mu_new, mu)
    s2_o[:] = jnp.maximum(keep(s2_new, s2), 1e-10)
    a_o[:] = keep(a_new, a)
    b_o[:] = keep(b_new, jnp.where(meas_valid, b + 1.0, b))


@partial(jax.jit, static_argnames=("mu_lo", "mu_hi", "interpret"))
def depth_filter_update(state: df_xla.FilterState, x: jax.Array,
                        tau2: jax.Array, meas_valid: jax.Array,
                        mu_lo: float = 0.01, mu_hi: float = 100.0,
                        interpret: bool = False) -> df_xla.FilterState:
    """Pallas fused filter update; contract of `ops.depth_filter.update`."""
    h, w = state.mu.shape
    th = -(-h // _TILE_H) * _TILE_H
    tw = -(-w // _TILE_W) * _TILE_W
    pad2 = lambda arr: _pad_to(_pad_to(arr, th, 0), tw, 1)
    args = [pad2(state.mu), pad2(state.sigma2), pad2(state.a), pad2(state.b),
            pad2(x), pad2(jnp.broadcast_to(tau2, (h, w))),
            pad2(meas_valid.astype(jnp.int32))]
    grid = (th // _TILE_H, tw // _TILE_W)
    spec = pl.BlockSpec((_TILE_H, _TILE_W), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((th, tw), jnp.float32)
    mu, s2, a, b = pl.pallas_call(
        partial(_filter_kernel, mu_lo=mu_lo, mu_hi=mu_hi),
        out_shape=(shape, shape, shape, shape),
        grid=grid,
        in_specs=[spec] * 7,
        out_specs=(spec, spec, spec, spec),
        interpret=interpret,
    )(*args)
    crop = lambda arr: arr[:h, :w]
    return df_xla.FilterState(crop(mu), crop(s2), crop(a), crop(b))


# ---------------------------------------------------------------------------
# Bidirectional SGM directional scan
# ---------------------------------------------------------------------------
#
# The SGM recurrence L(p) = C(p) + min(L, shift(L)±1 + P1, min L + P2) − min L
# is strictly sequential along the scan axis, so the XLA `lax.scan`
# formulation pays per-step dispatch overhead and round-trips the carry
# through HBM-adjacent buffers. Here the grid IS the scan axis (TPU grids
# execute sequentially with pipelined block DMAs), the two direction carries
# live in fp32 VMEM scratch across grid steps, and the backward direction
# reads/writes mirrored rows of the same arrays via index maps — one pass
# produces both directions' aggregations (`ops.sgm._scan_bidir` twin).


_SGM_UNROLL = 8


def _sgm_bidir_kernel(p1_ref, cf_ref, cb_ref, pf_ref, pb_ref,
                      of_ref, ob_ref, carry_f, carry_b):
    i = pl.program_id(0)
    p1 = p1_ref[0, 0]
    big = jnp.float32(3.0e38)
    u = cf_ref.shape[0]

    def update(carry_ref, c_ref, p2_ref, out_ref, rev):
        for k in range(u):
            kk = u - 1 - k if rev else k
            c = c_ref[kk].astype(jnp.float32)                 # (X, D)
            p2 = p2_ref[0, kk].astype(jnp.float32)[:, None]   # (X, 1)

            def _step():
                l_prev = carry_ref[:]
                x = l_prev.shape[0]
                pad = jnp.full((x, 1), big, jnp.float32)
                sp = jnp.concatenate([pad, l_prev[:, :-1]], axis=1)
                sm = jnp.concatenate([l_prev[:, 1:], pad], axis=1)
                min_prev = jnp.min(l_prev, axis=-1, keepdims=True)
                cand = jnp.minimum(
                    l_prev,
                    jnp.minimum(jnp.minimum(sp, sm) + p1, min_prev + p2))
                l_new = c + cand - min_prev
                carry_ref[:] = l_new
                out_ref[kk] = l_new.astype(out_ref.dtype)

            if k == 0:
                # only the very first scan element initializes the carry;
                # every other unrolled step is branch-free
                first = i == 0

                @pl.when(first)
                def _init():
                    carry_ref[:] = c
                    out_ref[kk] = c.astype(out_ref.dtype)

                pl.when(~first)(_step)
            else:
                _step()

    update(carry_f, cf_ref, pf_ref, of_ref, rev=False)
    update(carry_b, cb_ref, pb_ref, ob_ref, rev=True)


@partial(jax.jit, static_argnames=("interpret", "summed"))
def sgm_scan_bidir(cost: jax.Array, p2_eff: jax.Array, p1: jax.Array,
                   interpret: bool = False, summed: bool = True):
    """Forward+backward SGM aggregation along axis 0 of (S, X, D) cost.

    Returns out_f + out_b when `summed` (the `ops.sgm._scan_bidir` contract),
    else the (out_f, out_b) pair unsummed — a fused consumer (the WTA kernel)
    can then do the add in registers, saving a full-volume HBM pass.

    p2_eff: (S, X); p1: scalar. D must be a multiple of 128 and X a multiple
    of the dtype tile (8 fp32 / 16 bf16) for clean lane/sublane tiling.
    """
    s, x, d = cost.shape
    u = _SGM_UNROLL if s % _SGM_UNROLL == 0 else 1
    nb = s // u
    p1_arr = jnp.asarray(p1, jnp.float32).reshape(1, 1)
    p2_blk = p2_eff.reshape(nb, u, x)

    out_f, out_b = pl.pallas_call(
        _sgm_bidir_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((u, x, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((u, x, d), lambda i: (nb - 1 - i, 0, 0)),
            pl.BlockSpec((1, u, x), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, u, x), lambda i: (nb - 1 - i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((u, x, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((u, x, d), lambda i: (nb - 1 - i, 0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((s, x, d), cost.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((x, d), jnp.float32)] * 2,
        interpret=interpret,
    )(p1_arr, cost, cost, p2_blk, p2_blk)
    return out_f + out_b if summed else (out_f, out_b)


def _sgm_bidir_axis1_kernel(p1_ref, cf_ref, cb_ref, pf_ref, pb_ref,
                            of_ref, ob_ref, carry_f, carry_b):
    """Twin of `_sgm_bidir_kernel` scanning axis 1 of an (H, W, D) volume:
    the block is (th, u, D) and the carry (th, D), so the horizontal SGM
    orientation runs directly on the row-major volume — no (H, W, D) ->
    (W, H, D) transpose in or out (two full-volume HBM passes saved). The
    grid is (H/th, W/u): the minor axis is the sequential scan, the major
    axis tiles the parallel row dimension so the per-step block stays inside
    scoped VMEM at u=16 (u=8 wastes half of every bf16 (16, 128) sublane
    tile; u=16 at full H overflowed scoped VMEM by 1.7 MB)."""
    i = pl.program_id(1)
    p1 = p1_ref[0, 0]
    big = jnp.float32(3.0e38)
    u = cf_ref.shape[1]

    def update(carry_ref, c_ref, p2_ref, out_ref, rev):
        for k in range(u):
            kk = u - 1 - k if rev else k
            c = c_ref[:, kk].astype(jnp.float32)                # (th, D)
            p2 = p2_ref[0, kk].astype(jnp.float32)[:, None]     # (th, 1)

            def _step():
                l_prev = carry_ref[:]
                h = l_prev.shape[0]
                pad = jnp.full((h, 1), big, jnp.float32)
                sp = jnp.concatenate([pad, l_prev[:, :-1]], axis=1)
                sm = jnp.concatenate([l_prev[:, 1:], pad], axis=1)
                min_prev = jnp.min(l_prev, axis=-1, keepdims=True)
                cand = jnp.minimum(
                    l_prev,
                    jnp.minimum(jnp.minimum(sp, sm) + p1, min_prev + p2))
                l_new = c + cand - min_prev
                carry_ref[:] = l_new
                out_ref[:, kk] = l_new.astype(out_ref.dtype)

            if k == 0:
                first = i == 0

                @pl.when(first)
                def _init():
                    carry_ref[:] = c
                    out_ref[:, kk] = c.astype(out_ref.dtype)

                pl.when(~first)(_step)
            else:
                _step()

    update(carry_f, cf_ref, pf_ref, of_ref, rev=False)
    update(carry_b, cb_ref, pb_ref, ob_ref, rev=True)


@partial(jax.jit, static_argnames=("interpret", "summed"))
def sgm_scan_bidir_axis1(cost: jax.Array, p2_eff: jax.Array, p1: jax.Array,
                         interpret: bool = False, summed: bool = True):
    """Forward+backward SGM aggregation along axis 1 of (H, W, D) cost
    (left->right + right->left on the natural layout). p2_eff: (H, W)."""
    h, w, d = cost.shape
    u_target = 2 * _SGM_UNROLL
    u = u_target if w % u_target == 0 else (
        _SGM_UNROLL if w % _SGM_UNROLL == 0 else 1)
    nb = w // u
    # row tiling: keep the per-step working set (2 in + 2 out blocks of
    # (th, u, D) + 2 (th, D) carries, double-buffered) under scoped VMEM
    th = h
    while th > 64 and 6 * th * u * d * cost.dtype.itemsize > 6 * 2 ** 20:
        th //= 2
    while h % th != 0:
        th //= 2
    gh = h // th
    p1_arr = jnp.asarray(p1, jnp.float32).reshape(1, 1)
    # p2 rides as (gh, W, th): its (1, u, th) blocks satisfy the tiling rule
    # (u % 8 == 0, th == array's last dim); the reshuffle is image-sized
    p2_t = p2_eff.reshape(gh, th, w).transpose(0, 2, 1)

    out_f, out_b = pl.pallas_call(
        _sgm_bidir_axis1_kernel,
        grid=(gh, nb),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((th, u, d), lambda j, i: (j, i, 0)),
            pl.BlockSpec((th, u, d), lambda j, i: (j, nb - 1 - i, 0)),
            pl.BlockSpec((1, u, th), lambda j, i: (j, i, 0)),
            pl.BlockSpec((1, u, th), lambda j, i: (j, nb - 1 - i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((th, u, d), lambda j, i: (j, i, 0)),
            pl.BlockSpec((th, u, d), lambda j, i: (j, nb - 1 - i, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((h, w, d), cost.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((th, d), jnp.float32)] * 2,
        interpret=interpret,
    )(p1_arr, cost, cost, p2_t, p2_t)
    return out_f + out_b if summed else (out_f, out_b)


# ---------------------------------------------------------------------------
# Banded-shift projective warp (the alignment warp of the plane sweep)
# ---------------------------------------------------------------------------
#
# The two-pass projective warp's exact MXU formulation materializes ~1 GB of
# hat-weight tensors per frame ((H, W, W) + (W, H, H)). In the dense mapper's
# operating regime (consecutive keyframes of one client) the warp positions
# deviate from identity by a BOUNDED shift, so each 1-D resampling pass is a
# static fan of 2*band+1 shifted taps with VMEM-resident weights — no weight
# tensor ever exists. Samples whose shift exceeds the band lose coverage
# (cov = 0) instead of going wrong, so correctness never depends on the
# bound; extreme rotations just fall back to the exact matmul path
# (`ops.image.projective_warp_mxu`) chosen by the caller.


def _warp_rows_kernel(imgp_ref, pos_ref, out_ref, cov_ref, *, band):
    # imgp: (th, W + 2*band) zero-padded rows; pos: (th, W) absolute source x
    pos = pos_ref[:]
    th, w = pos.shape
    f32 = jnp.float32
    uio = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1).astype(f32)
    delta = pos - uio

    # static tap unroll, accumulating IN the output refs: carrying the
    # accumulators as values makes Mosaic keep every unrolled temporary
    # live (193 taps x (th, W) f32 = scoped-VMEM OOM), and dynamic lane
    # slices (fori_loop + pl.ds) are not lowerable
    out_ref[:] = jnp.zeros((th, w), f32)
    cov_ref[:] = jnp.zeros((th, w), f32)
    for k in range(2 * band + 1):
        off = k - band
        wk = jnp.maximum(0.0, 1.0 - jnp.abs(delta - off))
        out_ref[:] = out_ref[:] + wk * imgp_ref[:, k:k + w]
        xin = (uio >= -off) & (uio <= w - 1 - off)   # tap inside [0, W-1]
        cov_ref[:] = cov_ref[:] + jnp.where(xin, wk, 0.0)


def _warp_cols_kernel(tmpp_ref, covp_ref, pos_ref, out_ref, cov_ref, *, band):
    # tmpp/covp: (H + 2*band, tw) zero-padded columns; pos: (H, tw) source y
    pos = pos_ref[:]
    h, tw = pos.shape
    f32 = jnp.float32
    vio = jax.lax.broadcasted_iota(jnp.int32, (h, tw), 0).astype(f32)
    delta = pos - vio

    out_ref[:] = jnp.zeros((h, tw), f32)
    cov_ref[:] = jnp.zeros((h, tw), f32)
    for k in range(2 * band + 1):
        off = k - band
        wk = jnp.maximum(0.0, 1.0 - jnp.abs(delta - off))
        out_ref[:] = out_ref[:] + wk * tmpp_ref[k:k + h, :]
        cov_ref[:] = cov_ref[:] + wk * covp_ref[k:k + h, :]


@partial(jax.jit, static_argnames=("band_x", "band_y", "interpret"))
def projective_warp_banded(img: jax.Array, m: jax.Array,
                           band_x: int = 96, band_y: int = 48,
                           interpret: bool = False):
    """Banded-shift twin of `ops.image.projective_warp_mxu`: identical
    contract — returns (warped·coverage, coverage) — wherever the per-pass
    shifts stay within (band_x, band_y); larger shifts yield coverage 0."""
    from .image import warp_pass_positions

    h, w = img.shape
    f32 = jnp.float32
    img = img.astype(f32)
    g, y_in = warp_pass_positions(m, h, w)

    th = 32
    while h % th != 0:
        th //= 2
    imgp = jnp.pad(img, ((0, 0), (band_x, band_x)))
    tmp, cov1 = pl.pallas_call(
        partial(_warp_rows_kernel, band=band_x),
        grid=(h // th,),
        in_specs=[
            pl.BlockSpec((th, w + 2 * band_x), lambda i: (i, 0)),
            pl.BlockSpec((th, w), lambda i: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((th, w), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((h, w), f32)] * 2,
        interpret=interpret,
    )(imgp, g)

    tw = 128
    while w % tw != 0:
        tw //= 2
    tmpp = jnp.pad(tmp, ((band_y, band_y), (0, 0)))
    covp = jnp.pad(cov1, ((band_y, band_y), (0, 0)))
    out, cov = pl.pallas_call(
        partial(_warp_cols_kernel, band=band_y),
        grid=(w // tw,),
        in_specs=[
            pl.BlockSpec((h + 2 * band_y, tw), lambda i: (0, i)),
            pl.BlockSpec((h + 2 * band_y, tw), lambda i: (0, i)),
            pl.BlockSpec((h, tw), lambda i: (0, i)),
        ],
        out_specs=[pl.BlockSpec((h, tw), lambda i: (0, i))] * 2,
        out_shape=[jax.ShapeDtypeStruct((h, w), f32)] * 2,
        interpret=interpret,
    )(tmpp, covp, y_in)
    return out, cov


# ---------------------------------------------------------------------------
# Fused plane-sweep cost kernel
# ---------------------------------------------------------------------------
#
# One grid step per inverse-depth hypothesis: generate the banded hat-function
# interpolation matrices for this depth IN VMEM, run the two resampling
# matmuls on the MXU, then do validity, the absolute-difference against the
# reference, and the 3x3 box aggregation on the VMEM-resident (H, W) plane —
# and write a single bf16 plane with the reference CUDA kernel's -1
# out-of-view sentinel (`calc_cost.cu:96-233`). The XLA formulation of the
# same math materializes the (D, W, W)/(D, H, H) interpolation tensors and
# ~10 (D, H, W) intermediates in HBM; here nothing but the output plane ever
# leaves VMEM.


def _box3_edge(x: jax.Array) -> jax.Array:
    """Separable 3x3 box filter (sum, not mean) with edge replication on an
    (H, W) VMEM tile — 4 adds instead of 8 (the sweep kernel is VPU-epilogue
    bound; measured 1.94 ms/frame with the dense 8-add form)."""
    h, w = x.shape
    xp = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
    row = xp[:, 0:w] + xp[:, 1:w + 1] + xp[:, 2:w + 2]
    rp = jnp.concatenate([row[:1], row, row[-1:]], axis=0)
    return rp[0:h] + rp[1:h + 1] + rp[2:h + 2]


def _sweep_kernel(meas_ref, refimg_ref, posx_ref, posy_ref, mx_ref, my_ref,
                  out_ref):
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    meas = meas_ref[:]                      # (H, W) f32, aligned image
    h, w = meas.shape
    db = out_ref.shape[0]                   # depths per grid step
    xio = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0).astype(f32)
    hio = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1).astype(f32)

    for s in range(db):
        px = posx_ref[s]                    # (1, W) — stay 2-D throughout
        py = posy_ref[s]                    # (H, 1)   (Mosaic has no 1-D ops)

        # row resample: rowp[h, p] = sum_x meas[h, x] * hat(px[p] - x)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(px - xio)).astype(bf16)
        rowp = jnp.dot(meas.astype(bf16), wx, preferred_element_type=f32)
        # column resample: warped[q, p] = sum_h hat(py[q] - h) * rowp[h, p]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - hio)).astype(bf16)
        warped = jnp.dot(wy, rowp.astype(bf16), preferred_element_type=f32)

        # validity: hat support in-bounds + aligned-image quad membership
        # (behind-camera depths carry px = py = -1e9, failing every test)
        inb_x = (px >= 0.0) & (px <= w - 1.0)               # (1, W)
        inb_y = (py >= 0.0) & (py <= h - 1.0)               # (H, 1)
        mx = mx_ref[s]                      # (3, W)
        my = my_ref[s]                      # (H, 3)
        m0 = mx[0:1, :] + my[:, 0:1]                        # (H, W)
        m1 = mx[1:2, :] + my[:, 1:2]
        m2 = mx[2:3, :] + my[:, 2:3]
        quad = ((m2 > 1e-6)
                & (m0 >= 0.0) & (m0 <= (w - 1.0) * m2)
                & (m1 >= 0.0) & (m1 <= (h - 1.0) * m2))
        valid = quad & inb_x & inb_y

        # patch cost: 9-tap average in bf16 (invalid taps contribute 0),
        # validity = CENTER sample only — the reference kernel's semantics
        # (`calc_cost.cu:96-233`: clamped texture taps, -1 sentinel when the
        # warped center leaves the view). The separable bf16 box halves the
        # VPU epilogue that dominated the per-step time.
        ad = jnp.where(valid, jnp.abs(warped - refimg_ref[:]), 0.0)
        num = _box3_edge(ad.astype(bf16)).astype(f32)
        out_ref[s] = jnp.where(valid, jnp.maximum(num * (1.0 / 9.0), 0.0),
                               -1.0).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def plane_sweep_pallas(ref: jax.Array, meas_al: jax.Array,
                       pos_x: jax.Array, pos_y: jax.Array,
                       mx: jax.Array, my: jax.Array,
                       out_dtype=jnp.bfloat16,
                       interpret: bool = False) -> jax.Array:
    """Fused plane-sweep AD cost over all depths. Returns (D, H, W) cost with
    -1 marking out-of-view samples (the CUDA sentinel); the caller transposes
    to the (H, W, D) volume layout and splits cost/valid.

    ref, meas_al: (H, W) f32 (meas_al = measurement pre-warped by A and
    coverage-renormalized); pos_x (D, W), pos_y (D, H), mx (D, 3, W),
    my (D, 3, H) from `ops.costvolume._sweep_positions`.
    """
    h, w = ref.shape
    d = pos_x.shape[0]
    db = 1   # 2 depths/step overflows scoped VMEM by ~0.7 MB (measured r4)
    img_spec = pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _sweep_kernel,
        grid=(d // db,),
        in_specs=[
            img_spec,                                            # meas_al
            img_spec,                                            # ref
            pl.BlockSpec((db, 1, w), lambda i: (i, 0, 0)),       # pos_x (1, W)
            pl.BlockSpec((db, h, 1), lambda i: (i, 0, 0)),       # pos_y (H, 1)
            pl.BlockSpec((db, 3, w), lambda i: (i, 0, 0)),       # mx (3, W)
            pl.BlockSpec((db, h, 3), lambda i: (i, 0, 0)),       # my (H, 3)
        ],
        out_specs=pl.BlockSpec((db, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((d, h, w), out_dtype),
        interpret=interpret,
    )(meas_al.astype(jnp.float32), ref.astype(jnp.float32),
      pos_x[:, None, :], pos_y[:, :, None],
      mx, jnp.swapaxes(my, 1, 2))
    return out


# ---------------------------------------------------------------------------
# Fused WTA (winner-take-all + subpixel + peak rejection)
# ---------------------------------------------------------------------------
#
# The XLA formulation of `ops.sgm.wta_depth` performs ~5 separate reductions
# over the aggregated (H, W, D) volume (argmin, min, two one-hot neighbor
# contractions, masked second-best) after an fp32 cast — several full-volume
# HBM passes. Here the two part-volumes (horizontal and vertical SGM
# aggregates, still unsummed) are read ONCE as bf16 tiles, summed in
# registers, and every per-pixel statistic comes out of that single pass
# (the reference's `filterCostKernel`, `calc_cost.cu:235-283`).


def _wta_kernel(*refs, d, peak_ratio):
    *in_refs, idx_ref, conf_ref = refs
    x = in_refs[0][:].astype(jnp.float32)
    for r in in_refs[1:]:
        x = x + r[:].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    c0 = jnp.min(x, axis=-1)
    is_min = x == c0[..., None]
    idx = jnp.min(jnp.where(is_min, lane, d), axis=-1)  # first-min argmin
    im = jnp.maximum(idx - 1, 0)
    ip = jnp.minimum(idx + 1, d - 1)
    cm = jnp.sum(jnp.where(lane == im[..., None], x, 0.0), axis=-1)
    cp = jnp.sum(jnp.where(lane == ip[..., None], x, 0.0), axis=-1)
    denom = cm + cp - 2.0 * c0
    delta = jnp.where(denom > 1e-6,
                      0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0)
    idx_ref[:] = idx.astype(jnp.float32) + jnp.clip(delta, -1.0, 1.0)
    masked = jnp.where(jnp.abs(lane - idx[..., None]) <= 1,
                       jnp.float32(3.0e38), x)
    c2 = jnp.min(masked, axis=-1)
    conf = (c0 < peak_ratio * c2) & (idx > 0) & (idx < d - 1)
    conf_ref[:] = conf.astype(jnp.int32)


def _wta_tiles(h: int, w: int, d: int, itemsize: int,
               n_vols: int = 4) -> tuple[int, int] | None:
    """Pick (th, tw) tiles for the WTA grid; None if shapes don't divide.

    The kernel body materializes roughly `8 + n_vols` tile-shaped fp32/int32
    intermediates (the n_vols input tiles plus x = sum, the lane iota, the
    one-hot neighbor masks, the peak-rejection mask, ...), so the budget is
    the fp32 *working set*, not the input storage — budgeting only the inputs
    is exactly how round 1's 34 MB scoped-VMEM OOM at (480, 640, 128)
    escaped the toy-shape tests.
    """
    if d % 128 != 0:
        return None
    sub = 16 if itemsize == 2 else 8
    budget = 6 * 2 ** 20        # working-set tiles must fit well under 16 MB
    ntiles = 8 + n_vols
    best = None
    for tw in (512, 256, 128, 64, 32, 16, 8):
        if tw % sub != 0 or w % tw != 0:
            continue
        for th in (32, 16, 8, 4, 2, 1):
            if h % th != 0 or ntiles * th * tw * d * 4 > budget:
                continue
            if best is None or th * tw > best[0] * best[1]:
                best = (th, tw)
            break
    return best


@partial(jax.jit, static_argnames=("peak_ratio", "interpret"))
def wta_pallas(*vols: jax.Array, peak_ratio: float = 0.98,
               interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """WTA over the summed volume `sum(vols)` (each (H, W, D)) in one pass
    — the directional SGM aggregates are added in registers here, never
    materialized summed in HBM. Returns (idx_f (H, W) float32, conf (H, W)
    bool) with the same semantics as `ops.sgm.wta_depth` (minus the
    valid_count gate, applied by the caller on (H, W) maps)."""
    h, w, d = vols[0].shape
    tiles = _wta_tiles(h, w, d, vols[0].dtype.itemsize, n_vols=len(vols))
    assert tiles is not None, f"unsupported WTA shape {(h, w, d)}"
    th, tw = tiles
    grid = (h // th, w // tw)
    in_spec = pl.BlockSpec((th, tw, d), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    idx_f, conf = pl.pallas_call(
        partial(_wta_kernel, d=d, peak_ratio=peak_ratio),
        grid=grid,
        in_specs=[in_spec] * len(vols),
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((h, w), jnp.float32),
                   jax.ShapeDtypeStruct((h, w), jnp.int32)),
        interpret=interpret,
    )(*vols)
    return idx_f, conf != 0
