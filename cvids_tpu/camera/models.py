"""Additional camera models: equidistant (Kannala-Brandt fisheye) and MEI
(unified/catadioptric), plus intrinsic calibration.

Parity with the reference's camodocal library
(`/root/reference/camera_model/include/camodocal/camera_models/
EquidistantCamera.h`, `CataCamera.h`, `intrinsic_calib.cc`): same projection
models, re-designed as batched functional ops; calibration is a masked
Gauss-Newton on reprojection residuals instead of a Ceres problem.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["EquidistantCamera", "MeiCamera", "ScaramuzzaCamera",
           "calibrate_pinhole", "calibrate_equidistant", "calibrate_mei",
           "calibrate_scaramuzza", "fit_forward_poly"]


class EquidistantCamera(NamedTuple):
    """Kannala-Brandt: r(θ) = θ + k2 θ³ + k3 θ⁵ + k4 θ⁷ + k5 θ⁹."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k: jax.Array  # (4,) = (k2, k3, k4, k5)
    width: int = 752
    height: int = 480

    @staticmethod
    def create(fx, fy, cx, cy, k=(0.0, 0.0, 0.0, 0.0), width=752, height=480,
               dtype=jnp.float32):
        return EquidistantCamera(jnp.asarray(fx, dtype), jnp.asarray(fy, dtype),
                                 jnp.asarray(cx, dtype), jnp.asarray(cy, dtype),
                                 jnp.asarray(k, dtype), int(width), int(height))

    def _theta_d(self, theta):
        t2 = theta * theta
        return theta * (1.0 + self.k[0] * t2 + self.k[1] * t2 ** 2
                        + self.k[2] * t2 ** 3 + self.k[3] * t2 ** 4)

    def project(self, pts_cam: jax.Array) -> jax.Array:
        """(..., 3) camera points -> (..., 2) pixels."""
        x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(r, z)
        td = self._theta_d(theta)
        scale = jnp.where(r > 1e-9, td / jnp.maximum(r, 1e-9), 1.0)
        u = self.fx * x * scale + self.cx
        v = self.fy * y * scale + self.cy
        return jnp.stack([u, v], axis=-1)

    def lift(self, px: jax.Array, iters: int = 10) -> jax.Array:
        """Pixels -> normalized coords (x/z, y/z) by Newton-inverting r(θ)."""
        mx = (px[..., 0] - self.cx) / self.fx
        my = (px[..., 1] - self.cy) / self.fy
        td = jnp.sqrt(mx * mx + my * my)
        theta = td  # init

        def body(_, th):
            t2 = th * th
            f = th * (1 + self.k[0] * t2 + self.k[1] * t2 ** 2
                      + self.k[2] * t2 ** 3 + self.k[3] * t2 ** 4) - td
            df = (1 + 3 * self.k[0] * t2 + 5 * self.k[1] * t2 ** 2
                  + 7 * self.k[2] * t2 ** 3 + 9 * self.k[3] * t2 ** 4)
            return th - f / jnp.maximum(df, 1e-9)

        theta = jax.lax.fori_loop(0, iters, body, theta)
        scale = jnp.where(td > 1e-9, jnp.tan(theta) / jnp.maximum(td, 1e-9), 1.0)
        return jnp.stack([mx * scale, my * scale], axis=-1)


class MeiCamera(NamedTuple):
    """Unified (Mei) model: project via unit sphere with mirror offset xi,
    then pinhole + radtan distortion."""

    xi: jax.Array
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    dist: jax.Array  # (4,) k1 k2 p1 p2
    width: int = 752
    height: int = 480

    @staticmethod
    def create(xi, fx, fy, cx, cy, dist=(0, 0, 0, 0), width=752, height=480,
               dtype=jnp.float32):
        return MeiCamera(jnp.asarray(xi, dtype), jnp.asarray(fx, dtype),
                         jnp.asarray(fy, dtype), jnp.asarray(cx, dtype),
                         jnp.asarray(cy, dtype), jnp.asarray(dist, dtype),
                         int(width), int(height))

    def project(self, pts_cam: jax.Array) -> jax.Array:
        from .pinhole import distort
        p = pts_cam / jnp.linalg.norm(pts_cam, axis=-1, keepdims=True)
        z = p[..., 2] + self.xi
        m = p[..., :2] / jnp.maximum(z, 1e-9)[..., None]
        md = m + distort(m, self.dist)
        return jnp.stack([self.fx * md[..., 0] + self.cx,
                          self.fy * md[..., 1] + self.cy], axis=-1)

    def lift(self, px: jax.Array, iters: int = 8) -> jax.Array:
        """Pixels -> normalized coords on the z=1 plane."""
        from .pinhole import undistort_iterative
        mx = (px[..., 0] - self.cx) / self.fx
        my = (px[..., 1] - self.cy) / self.fy
        m = undistort_iterative(jnp.stack([mx, my], -1), self.dist, iters)
        mx, my = m[..., 0], m[..., 1]
        r2 = mx * mx + my * my
        # invert the sphere projection (camodocal CataCamera::liftProjective)
        xi = self.xi
        disc = 1.0 + (1.0 - xi * xi) * r2
        zs = (xi + jnp.sqrt(jnp.maximum(disc, 0.0))) / (1.0 + r2)
        x = zs * mx
        y = zs * my
        z = zs - xi
        return jnp.stack([x / jnp.maximum(z, 1e-9), y / jnp.maximum(z, 1e-9)],
                         axis=-1)


class ScaramuzzaCamera(NamedTuple):
    """Scaramuzza omnidirectional (OCamCalib) model.

    Behavior matches camodocal's `OCAMCamera`
    (`/root/reference/camera_model/src/camera_models/ScaramuzzaCamera.cc:
    599-654`): lift applies the inverse affine [[C,D],[E,1]] to the centered
    pixel, evaluates the forward polynomial at the sensor radius φ and
    returns (xc_x, xc_y, −poly(φ)) — centered coordinates, NOT affine-
    corrected, reproducing the reference's convention; project maps
    θ = atan2(−z, ‖xy‖) through the inverse polynomial to a sensor radius.
    """

    poly: jax.Array      # (P,) forward polynomial coefficients (a0, a1, ...)
    inv_poly: jax.Array  # (Q,) inverse polynomial (ρ(θ))
    c: jax.Array         # affine C
    d: jax.Array         # affine D
    e: jax.Array         # affine E
    cx: jax.Array
    cy: jax.Array
    width: int = 752
    height: int = 480

    @staticmethod
    def create(poly, inv_poly=None, c=1.0, d=0.0, e=0.0, cx=376.0, cy=240.0,
               width=752, height=480, dtype=jnp.float32):
        poly = jnp.asarray(poly, dtype)
        if inv_poly is None:
            inv_poly = ScaramuzzaCamera.fit_inverse_poly(
                poly, max_radius=0.6 * float(np.hypot(width, height)))
        return ScaramuzzaCamera(poly, jnp.asarray(inv_poly, dtype),
                                jnp.asarray(c, dtype), jnp.asarray(d, dtype),
                                jnp.asarray(e, dtype), jnp.asarray(cx, dtype),
                                jnp.asarray(cy, dtype), int(width), int(height))

    @staticmethod
    def fit_inverse_poly(poly, max_radius: float, degree: int = 12,
                         samples: int = 256):
        """Least-squares fit of ρ(θ) from the forward polynomial (the role of
        camodocal's inverse-poly estimation during calibration)."""
        phi = jnp.linspace(0.0, max_radius, samples)
        z = jnp.polyval(poly[::-1], phi)        # poly is (a0, a1, ...)
        theta = jnp.arctan2(z, phi)
        vand = theta[:, None] ** jnp.arange(degree + 1)[None, :]
        coef, *_ = jnp.linalg.lstsq(vand, phi)
        return coef

    def project(self, pts_cam: jax.Array) -> jax.Array:
        x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
        nrm = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(-z, nrm)
        rho = jnp.polyval(self.inv_poly[::-1], theta)
        inv_n = 1.0 / jnp.maximum(nrm, 1e-9)
        xn = x * inv_n * rho
        yn = y * inv_n * rho
        u = xn * self.c + yn * self.d + self.cx
        v = xn * self.e + yn + self.cy
        return jnp.stack([u, v], axis=-1)

    def lift(self, px: jax.Array) -> jax.Array:
        """Pixels -> projective ray (..., 3) (reference convention: centered
        pixel coords for xy, −poly(φ) for z; NOT normalized)."""
        xc = px[..., 0] - self.cx
        yc = px[..., 1] - self.cy
        inv_scale = 1.0 / (self.c - self.d * self.e)
        xa = inv_scale * (xc - self.d * yc)
        ya = inv_scale * (-self.e * xc + self.c * yc)
        phi = jnp.sqrt(xa * xa + ya * ya)
        z = jnp.polyval(self.poly[::-1], phi)
        return jnp.stack([xc, yc, -z], axis=-1)


def _calibrate_gn(project_fn, n_params: int, obj_pts: jax.Array,
                  img_pts: jax.Array, valid: jax.Array,
                  init_params: jax.Array, poses0: jax.Array,
                  iters: int = 20, prior=None):
    """Joint intrinsics+poses Gauss-Newton over V planar-target views.

    `project_fn(params (n_params,), pts_cam (..., 3)) -> pixels (..., 2)` is
    the camera model; obj_pts (V, N, 3), img_pts (V, N, 2), valid (V, N),
    poses0 (V, 6) [rvec, tvec] board->camera. Levenberg-damped (relative
    1e-4 diag) with Jacobi preconditioning — the reference runs the same
    joint problem through Ceres (`intrinsic_calib.cc:1-247`, per-model
    `estimateIntrinsics` + `CostFunctionFactory`).

    prior: optional (param_indices, targets, weights) soft prior appended to
    the residual vector — pins gauge-like parameter valleys (e.g. the OCAM
    affine) without meaningfully biasing well-constrained solutions.
    Returns (params, poses, rms over data residuals only)."""
    from ..geometry import quat_to_matrix, so3_exp

    v_count = obj_pts.shape[0]

    def residuals(flat):
        params = flat[:n_params]
        poses = flat[n_params:].reshape(v_count, 6)

        def one(pose, op, ip, vd):
            r = quat_to_matrix(so3_exp(pose[:3]))
            pc = op @ r.T + pose[3:]
            res = project_fn(params, pc) - ip
            return jnp.where(vd[..., None], res, 0.0)

        res = jax.vmap(one)(poses, obj_pts, img_pts, valid).reshape(-1)
        if prior is not None:
            idx, tgt, wgt = prior
            res = jnp.concatenate([
                res, (params[jnp.asarray(idx)] - jnp.asarray(tgt))
                * jnp.asarray(wgt)])
        return res

    n_data = 2 * obj_pts.shape[0] * obj_pts.shape[1]
    res_j = jax.jit(residuals)
    jac_j = jax.jit(jax.jacfwd(residuals))

    flat = jnp.concatenate([jnp.asarray(init_params, jnp.float32),
                            poses0.reshape(-1)])
    lam = 1e-3
    cost_prev = float(jnp.sum(res_j(flat) ** 2))
    for _ in range(iters):
        r = res_j(flat)
        j = jac_j(flat)
        h = j.T @ j
        g = j.T @ r
        accepted = False
        for _try in range(8):       # adaptive damping: reject uphill steps
            hd = (h + lam * jnp.diag(jnp.diag(h))
                  + 1e-8 * jnp.eye(flat.shape[0]))
            d = 1.0 / jnp.sqrt(jnp.diag(hd) + 1e-12)
            step = d * jnp.linalg.solve(hd * d[:, None] * d[None, :], -g * d)
            cand = flat + step
            cost_new = float(jnp.sum(res_j(cand) ** 2))
            if np.isfinite(cost_new) and cost_new < cost_prev:
                flat, cost_prev = cand, cost_new
                lam = max(lam * 0.3, 1e-8)
                accepted = True
                break
            lam = min(lam * 10.0, 1e8)
        if not accepted:
            break
    r = res_j(flat)[:n_data]
    n_obs = jnp.maximum(jnp.sum(valid), 1)
    rms = jnp.sqrt(jnp.sum(r ** 2) / n_obs)
    return flat[:n_params], flat[n_params:].reshape(v_count, 6), rms


def calibrate_pinhole(obj_pts: jax.Array, img_pts: jax.Array,
                      valid: jax.Array, init_params: jax.Array,
                      poses0: jax.Array, iters: int = 20):
    """Pinhole+radtan intrinsic calibration from V views of a planar target.

    init_params (8,) = [fx, fy, cx, cy, k1, k2, p1, p2]. Returns
    (params (8,), poses (V, 6), rms)."""
    from .pinhole import distort

    def project(params, pc):
        fx, fy, cx, cy = params[0], params[1], params[2], params[3]
        z = jnp.maximum(pc[..., 2], 1e-6)
        n = pc[..., :2] / z[..., None]
        nd = n + distort(n, params[4:8])
        return jnp.stack([fx * nd[..., 0] + cx, fy * nd[..., 1] + cy], -1)

    return _calibrate_gn(project, 8, obj_pts, img_pts, valid, init_params,
                         poses0, iters)


def calibrate_equidistant(obj_pts: jax.Array, img_pts: jax.Array,
                          valid: jax.Array, init_params: jax.Array,
                          poses0: jax.Array, iters: int = 25):
    """Kannala-Brandt fisheye calibration (camodocal
    `EquidistantCamera::estimateIntrinsics` + Ceres refinement role).

    init_params (8,) = [fx, fy, cx, cy, k2, k3, k4, k5]. Returns
    (params (8,), poses (V, 6), rms)."""

    def project(params, pc):
        cam = EquidistantCamera(params[0], params[1], params[2], params[3],
                                params[4:8])
        return cam.project(pc)

    return _calibrate_gn(project, 8, obj_pts, img_pts, valid, init_params,
                         poses0, iters)


def fit_forward_poly(inv_poly: jax.Array, theta_min: float = -np.pi / 2 + 0.02,
                     theta_max: float = -0.45, degree: int = 4,
                     samples: int = 256) -> jax.Array:
    """Forward polynomial z = poly(φ) from a calibrated inverse polynomial
    ρ(θ) (the Scaramuzza convention pair: θ = atan2(poly(φ), φ) at sensor
    radius φ = ρ(θ)). On the optical axis poly(0) = lim φ·tanθ = −f, which is
    the OCamCalib a0 < 0 convention."""
    theta = jnp.linspace(theta_min, theta_max, samples)
    phi = jnp.polyval(inv_poly[::-1], theta)
    z = phi * jnp.tan(theta)
    vand = phi[:, None] ** jnp.arange(degree + 1)[None, :]
    coef, *_ = jnp.linalg.lstsq(vand, z)
    return coef


def calibrate_scaramuzza(obj_pts: jax.Array, img_pts: jax.Array,
                         valid: jax.Array, init_params: jax.Array,
                         poses0: jax.Array, iters: int = 30):
    """Scaramuzza omnidirectional calibration (camodocal
    `ScaramuzzaCamera.cc` estimateIntrinsics + Ceres refinement role,
    `intrinsic_calib.cc --camera-model scaramuzza`).

    Parameterized directly in projection space — the inverse polynomial
    ρ(θ) plus the affine [[C,D],[E,1]] and center — so the joint GN is the
    plain reprojection problem; the forward polynomial the model stores is
    recovered afterwards with `fit_forward_poly`.

    init_params (Q+5,) = [b0..b_{Q-1} inverse-poly coefficients (ρ(θ) =
    Σ b_i θ^i), C, D, E, cx, cy]. Returns (params (Q+5,), poses (V, 6),
    rms)."""
    nb = int(init_params.shape[0]) - 5

    def project(params, pc):
        b = params[:nb]
        c, d, e = params[nb], params[nb + 1], params[nb + 2]
        cx, cy = params[nb + 3], params[nb + 4]
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        nrm = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(-z, jnp.maximum(nrm, 1e-9))
        rho = jnp.polyval(b[::-1], theta)
        inv_n = 1.0 / jnp.maximum(nrm, 1e-9)
        xn = x * inv_n * rho
        yn = y * inv_n * rho
        return jnp.stack([xn * c + yn * d + cx, xn * e + yn + cy], axis=-1)

    # the affine [[C,D],[E,1]] is near-degenerate with the polynomial and
    # the center over bounded board coverage; a weak identity prior pins
    # the valley (real OCAM affines are within ~1e-2 of identity) without
    # biasing well-constrained data
    prior = (np.array([nb, nb + 1, nb + 2]),
             np.array([1.0, 0.0, 0.0], np.float32),
             np.array([1000.0, 1000.0, 1000.0], np.float32))
    return _calibrate_gn(project, nb + 5, obj_pts, img_pts, valid,
                         init_params, poses0, iters, prior=prior)


def calibrate_mei(obj_pts: jax.Array, img_pts: jax.Array,
                  valid: jax.Array, init_params: jax.Array,
                  poses0: jax.Array, iters: int = 30):
    """Unified (Mei) catadioptric calibration (camodocal
    `CataCamera::estimateIntrinsics` + Ceres refinement role).

    init_params (9,) = [xi, fx, fy, cx, cy, k1, k2, p1, p2]. Returns
    (params (9,), poses (V, 6), rms)."""

    def project(params, pc):
        cam = MeiCamera(params[0], params[1], params[2], params[3],
                        params[4], params[5:9])
        return cam.project(pc)

    return _calibrate_gn(project, 9, obj_pts, img_pts, valid, init_params,
                         poses0, iters)
