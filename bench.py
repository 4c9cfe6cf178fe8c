"""Headline benchmark: dense depth fusion throughput at the reference's
production geometry (640x480, 128 inverse-depth hypotheses — `/root/reference/
server_pose_graph/include/dense_mapping/dense_mapping_parameters.h:19-35`).

One fused-frame step = plane-sweep cost volume + running-mean accumulation +
4-direction SGM + WTA/subpixel + Gaussian×Beta filter update — the entire
per-frame GPU pipeline of the reference (`calc_cost.cu` kernels +
`DepthFilter::Update`) as a single XLA program.

Baseline: the reference's real-time operating point is 4 agents × 10 Hz
keyframes = 40 fused frames/s (BASELINE.md: agent keyframe rate, agents
supported). vs_baseline = measured_fps / 40.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cvids_tpu.dense import estimator

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = estimator.DenseConfig()  # 480 x 640 x 128, reference DEP_SAMPLE
    rng = np.random.default_rng(0)

    # synthetic textured plane at 3 m with the EuRoC-like focal/baseline
    f = 461.0
    k = np.array([[f, 0, 320], [0, f, 240], [0, 0, 1]], np.float32)
    pad = 80
    tex = rng.uniform(0, 255, (cfg.height, cfg.width + 2 * pad)).astype(np.float32)
    ref = tex[:, pad:pad + cfg.width]
    depth = 3.0
    b = 0.11
    disp = int(round(f * b / depth))
    meas = tex[:, pad + disp:pad + disp + cfg.width]
    a_mat = jnp.asarray(k @ np.linalg.inv(k))
    b_vec = jnp.asarray(k @ np.array([-b, 0, 0], np.float32))
    meas_j = jnp.asarray(meas)

    state = estimator.init_reference(cfg, jnp.asarray(ref))

    # Timing discipline for remote-TPU tunnels: every dispatch pays a relay
    # round-trip (~seconds), so per-call host loops measure the network, not
    # the chip. Production dispatches pipeline asynchronously; the honest
    # equivalent here is chaining N fused frames inside ONE jitted scan and
    # fencing on a reduction of the heavy outputs (scalar bookkeeping fetches
    # don't force the dense compute on lazy runtimes).
    from functools import partial

    import jax.numpy as jnp_
    from jax import lax

    n = 20

    @partial(jax.jit, static_argnums=0)
    def fuse_n(cfg_, st, meas, a, b_):
        def body(s, _):
            return estimator.fuse_measurement(cfg_, s, meas, a, b_), None

        st, _ = lax.scan(body, st, None, length=n)
        return st, jnp_.sum(st.filt.mu) + jnp_.sum(st.mean_cost)

    t0 = time.time()
    state, csum = fuse_n(cfg, state, meas_j, a_mat, b_vec)
    _ = float(np.asarray(csum))
    print(f"compile+first {n} frames: {time.time() - t0:.1f}s", file=sys.stderr)

    best_dt = None
    for _ in range(3):
        t0 = time.time()
        state, csum = fuse_n(cfg, state, meas_j, a_mat, b_vec)
        _ = float(np.asarray(csum))  # forces the whole chain
        dt = (time.time() - t0) / n
        best_dt = dt if best_dt is None else min(best_dt, dt)
    fps = 1.0 / best_dt

    # correctness guard: the benched computation must actually estimate depth
    inv_d, ok = estimator.finalize(cfg, state)
    crop = (slice(40, -40), slice(40, -40))
    okn = np.asarray(ok)[crop]
    med = float(np.median(1.0 / np.maximum(np.asarray(inv_d)[crop][okn], 1e-6)))
    assert abs(med - depth) < 0.4, f"depth sanity failed: {med} vs {depth}"
    print(f"median depth {med:.2f} (true {depth}), converged {okn.mean():.2f}",
          file=sys.stderr)

    baseline_fps = 40.0  # 4 agents x 10 Hz keyframes (reference operating point)
    print(json.dumps({
        "metric": "dense_fusion_frames_per_s_640x480x128",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
    }))


if __name__ == "__main__":
    main()
