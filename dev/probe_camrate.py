"""Probe: camera-rate tracking + keyframe selection (process_frame) vs the
old keyframe-rate path (process_keyframe) on the same rendered world.

Usage: python dev/probe_camrate.py [--rate 20] [--duration 7] [--full]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from cvids_tpu.io import euroc, euroc_synth, synthetic
from cvids_tpu.utils.config import AgentConfig, CameraConfig
from cvids_tpu.utils.metrics import ate_rmse, umeyama
from cvids_tpu.vio.frontend import AgentFrontend


def run_frontend(root, cfg, mode, kf_stride=1):
    seq = euroc.load_euroc(root)
    fe = AgentFrontend(cfg, 0)
    packets = []
    t0 = time.time()
    prev_t = None
    for fi in range(len(seq.cam_t)):
        if mode == "kf" and fi % kf_stride:
            continue
        t = seq.cam_t[fi]
        img = seq.load_image(fi)
        if prev_t is None:
            sel = (seq.imu_t >= t - 0.1) & (seq.imu_t < t)
            args = (t, img, np.zeros((0, 3)), seq.acc[sel], np.zeros(0))
        else:
            sel = (seq.imu_t >= prev_t) & (seq.imu_t < t)
            ts = seq.imu_t[sel]
            dts = np.diff(np.append(ts, t))
            args = (t, img, seq.gyr[sel], seq.acc[sel], dts)
        prev_t = t
        pkt = (fe.process_frame(*args) if mode == "cam"
               else fe.process_keyframe(*args))
        if pkt is not None:
            packets.append(pkt)
    wall = time.time() - t0
    if len(packets) < 3:
        print(f"  {mode}: only {len(packets)} packets!")
        return None
    ps = np.stack([p.p_wb for p in packets])
    ts_ = np.asarray([p.timestamp for p in packets])
    gt_p = np.stack([np.interp(ts_, seq.gt_t, seq.gt_p[:, k])
                     for k in range(3)], -1)
    s, r_a, t_a = umeyama(ps, gt_p, with_scale=True)
    per = np.linalg.norm(s * ps @ r_a.T + t_a - gt_p, axis=1) * 100
    ate_sim3 = ate_rmse(ps, gt_p, "sim3") * 100
    ate_se3 = ate_rmse(ps, gt_p, "se3") * 100
    print(f"  {mode}: {len(packets)} packets, ATE sim3 {ate_sim3:.1f} cm, "
          f"se3 {ate_se3:.1f} cm, scale {s:.3f}, wall {wall:.0f}s "
          f"({wall/len(seq.cam_t)*1000:.0f} ms/frame)")
    print(f"    per-kf cm: {np.round(per, 1)}")
    return ate_sim3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=20.0)
    ap.add_argument("--duration", type=float, default=7.0)
    ap.add_argument("--world", default="euroc")   # euroc | fullsys
    ap.add_argument("--cache", default="/tmp/camrate_probe")
    args = ap.parse_args()

    if args.world == "euroc":
        cam = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                           width=320, height=240)
        cfg = AgentConfig(camera=cam, fast_threshold=12.0,
                          min_feature_dist=16)
        traj = synthetic.Trajectory.circle(radius=4.0, omega=0.35,
                                           height_amp=0.2, phase=0.0,
                                           speed_mod=0.3, speed_mod_freq=0.9)
        world = dict(num_landmarks=1000, seed=11, world_seed=99)
        extra = {}
    else:
        SCENE = dict(floor_z=0.0, wall_y=3.0,
                     box_lo=np.array([1.9, 0.6, 0.0]),
                     box_hi=np.array([2.9, 1.6, 0.9]))
        cam = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                           k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4,
                           width=320, height=240)
        cfg = AgentConfig(camera=cam, fast_threshold=12.0,
                          min_feature_dist=16, equalize=True)
        traj = synthetic.Trajectory.circle(radius=1.5, omega=0.5,
                                           height_amp=0.15, phase=0.0,
                                           center=(0.0, 0.0, 1.3),
                                           speed_mod=0.3, speed_mod_freq=0.9)
        world = dict(num_landmarks=1400, seed=21, world_seed=7)
        extra = dict(scene=SCENE, gyr_noise=2e-4, acc_noise=0.005,
                     photometric=dict(flicker=0.15, vignette=0.3,
                                      noise_std=1.5, shot_noise=0.3,
                                      exposure_time=0.008))

    root = os.path.join(args.cache,
                        f"{args.world}_r{args.rate:g}_d{args.duration:g}")
    if not euroc.available(root):
        t0 = time.time()
        euroc_synth.write_euroc_sequence(root, cfg=cfg, trajectory=traj,
                                         duration=args.duration,
                                         cam_rate=args.rate, imu_rate=200.0,
                                         **world, **extra)
        print(f"world rendered in {time.time()-t0:.0f}s")
    stride = max(1, int(round(args.rate / 2.0)))
    print(f"[old] keyframe-rate path, stride {stride} "
          f"(~{args.rate/stride:.1f} Hz keyframes):")
    run_frontend(root, cfg, "kf", kf_stride=stride)
    print(f"[new] camera-rate path at {args.rate:g} Hz:")
    run_frontend(root, cfg, "cam")


if __name__ == "__main__":
    main()
