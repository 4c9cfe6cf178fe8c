import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from cvids_tpu.camera.models import EquidistantCamera, MeiCamera
from cvids_tpu.camera.chessboard import (calibrate_chessboards,
                                         find_chessboard, render_chessboard)

w, h = 320, 240
rows, cols, sq = 5, 6, 0.04


def pose(yaw, pitch, tz, tx, ty):
    cy_, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    r = (np.array([[cy_, -sy, 0], [sy, cy_, 0], [0, 0, 1]])
         @ np.array([[1, 0, 0], [0, cp, -sp],
                     [0, sp, cp]])).astype(np.float32)
    return r, np.array([tx, ty, tz], np.float32)


POSES = [
    (0.1, 0.15, 0.42, -0.12, -0.10),
    (-0.2, 0.1, 0.5, -0.10, -0.08),
    (0.15, -0.2, 0.38, -0.05, -0.05),
    (0.05, 0.05, 0.3, -0.12, -0.10),
    # strong tilts: break the planar-target f-z ambiguity
    (0.45, 0.1, 0.42, -0.14, -0.10),
    (-0.1, 0.45, 0.45, -0.12, -0.12),
    (-0.4, -0.35, 0.45, -0.10, -0.06),
    # four diagonal placements: board pushed into each image corner but
    # fully in view — they pin the wide-angle distortion terms
    (0.25, 0.0, 0.5, -0.34, -0.27),
    (0.0, 0.3, 0.5, 0.06, -0.27),
    (-0.3, 0.0, 0.5, -0.34, 0.03),
    (0.0, -0.25, 0.5, 0.06, 0.03)]


def views_for(cam_true):
    views = []
    for yaw, pitch, tz, tx, ty in POSES:
        r, t = pose(yaw, pitch, tz, tx, ty)
        img, uv = render_chessboard(rows, cols, 0, cam_true, r, t, sq)
        inview = ((uv[:, 0] > 5) & (uv[:, 0] < w - 5)
                  & (uv[:, 1] > 5) & (uv[:, 1] < h - 5)).mean()
        det = find_chessboard(img, rows, cols)
        print(f"  view yaw={yaw} tz={tz}: corners in view {inview:.2f}, "
              f"detected={det is not None} "
              f"uv range x[{uv[:,0].min():.0f},{uv[:,0].max():.0f}] "
              f"y[{uv[:,1].min():.0f},{uv[:,1].max():.0f}]")
        views.append(img)
    return views


def agreement(cam_true, cam_est):
    rng = np.random.default_rng(3)
    pts = rng.normal(0, 0.45, (512, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 0.8
    uv_t = np.asarray(cam_true.project(jnp.asarray(pts)))
    r_px = np.hypot(uv_t[:, 0] - w / 2, uv_t[:, 1] - h / 2)
    inview = ((uv_t[:, 0] > 10) & (uv_t[:, 0] < w - 10)
              & (uv_t[:, 1] > 10) & (uv_t[:, 1] < h - 10)
              & (r_px < 170.0))   # within the board-covered cone
    uv_e = np.asarray(cam_est.project(jnp.asarray(pts)))
    return float(np.quantile(np.linalg.norm((uv_e - uv_t)[inview], axis=1),
                             0.95))


print("== equidistant")
cam_eq = EquidistantCamera.create(250.0, 250.0, 160.0, 120.0,
                                  (-0.03, 0.006, 0.0, 0.0), w, h)
vs = views_for(cam_eq)
params, poses_, rms, used = calibrate_chessboards(
    vs, rows, cols, sq, w, h, iters=40, model="equidistant")
print(f"  used={used} rms={float(rms):.3f} params={np.asarray(params)}")
p = np.asarray(params)
est = EquidistantCamera.create(p[0], p[1], p[2], p[3], p[4:8], w, h)
print(f"  agreement p95: {agreement(cam_eq, est):.2f} px")

print("== mei")
cam_mei = MeiCamera.create(0.9, 420.0, 420.0, 160.0, 120.0,
                           (-0.05, 0.01, 0.0, 0.0), w, h)
vs = views_for(cam_mei)
params, poses_, rms, used = calibrate_chessboards(
    vs, rows, cols, sq, w, h, iters=50, model="mei")
print(f"  used={used} rms={float(rms):.3f} params={np.asarray(params)}")
p = np.asarray(params)
est = MeiCamera.create(p[0], p[1], p[2], p[3], p[4], p[5:9], w, h)
print(f"  agreement p95: {agreement(cam_mei, est):.2f} px")
