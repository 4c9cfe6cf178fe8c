import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

H, W, D = 480, 640, 128
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
# realistic smooth coords: epipolar-ish shifts
x = jnp.asarray(rng.uniform(0, W - 2, (D, H, W)), jnp.float32)
y = jnp.asarray(rng.uniform(0, H - 2, (D, H, W)), jnp.float32)

N = 5

def bench(name, fn, *args):
    g = jax.jit(fn)
    out = g(*args)
    _ = float(jnp.sum(out))
    best = None
    for _ in range(2):
        t0 = time.time()
        for _ in range(N):
            out = g(*args)
        _ = float(jnp.sum(out))
        dt = (time.time() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best*1000:.1f} ms", flush=True)

def v_fancy(img, x, y):
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    return img[y0, x0]

def v_take_flat(img, x, y):
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    flat = img.reshape(-1)
    return jnp.take(flat, y0 * W + x0, mode="clip")

def v_take4(img, x, y):
    x0f = jnp.floor(x); y0f = jnp.floor(y)
    fx = x - x0f; fy = y - y0f
    x0 = x0f.astype(jnp.int32); y0 = y0f.astype(jnp.int32)
    flat = img.reshape(-1)
    i00 = y0 * W + x0
    v00 = jnp.take(flat, i00, mode="clip")
    v01 = jnp.take(flat, i00 + 1, mode="clip")
    v10 = jnp.take(flat, i00 + W, mode="clip")
    v11 = jnp.take(flat, i00 + W + 1, mode="clip")
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy

def v_gather22(img, x, y):
    """one lax.gather fetching a (2,2) patch per index"""
    x0f = jnp.floor(x); y0f = jnp.floor(y)
    fx = (x - x0f)[..., None, None]; fy = (y - y0f)[..., None, None]
    idx = jnp.stack([y0f.astype(jnp.int32).reshape(-1),
                     x0f.astype(jnp.int32).reshape(-1)], axis=-1)
    dn = lax.GatherDimensionNumbers(offset_dims=(1, 2), collapsed_slice_dims=(),
                                    start_index_map=(0, 1))
    patches = lax.gather(img, idx, dn, slice_sizes=(2, 2),
                         mode=lax.GatherScatterMode.CLIP)
    patches = patches.reshape(x.shape + (2, 2))
    wgt = jnp.concatenate([(1 - fy) * (1 - fx), (1 - fy) * fx], -1)
    w2 = jnp.concatenate([fy * (1 - fx), fy * fx], -1)
    wall = jnp.concatenate([wgt, w2], -2)
    return jnp.sum(patches * wall, axis=(-2, -1))

#bench("fancy2d_nearest", v_fancy, img, x, y)
#bench("take_flat_nearest", v_take_flat, img, x, y)
#bench("take4_bilinear", v_take4, img, x, y)
#bench("gather22_bilinear", v_gather22, img, x, y)


def v_row_gather(vol, x, y):
    """unwarp pattern: gather whole D-rows (D contiguous) at (H,W) coords"""
    x0 = jnp.floor(x[0]).astype(jnp.int32)
    y0 = jnp.floor(y[0]).astype(jnp.int32)
    flat = vol.reshape(H * W, D)
    return jnp.take(flat, y0 * W + x0, axis=0, mode="clip")

def v_single_image_warp(img, x, y):
    """one (H,W) bilinear warp (rectification cost)"""
    x1 = x[0]; y1 = y[0]
    x0f = jnp.floor(x1); y0f = jnp.floor(y1)
    fx = x1 - x0f; fy = y1 - y0f
    x0 = x0f.astype(jnp.int32); y0 = y0f.astype(jnp.int32)
    flat = img.reshape(-1)
    i00 = y0 * W + x0
    v00 = jnp.take(flat, i00, mode="clip")
    v01 = jnp.take(flat, i00 + 1, mode="clip")
    v10 = jnp.take(flat, i00 + W, mode="clip")
    v11 = jnp.take(flat, i00 + W + 1, mode="clip")
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy

vol = jnp.asarray(rng.uniform(0, 50, (H, W, D)), jnp.float32)
bench("row_gather_Dcontig", v_row_gather, vol, x, y)
bench("single_image_warp", v_single_image_warp, img, x, y)
