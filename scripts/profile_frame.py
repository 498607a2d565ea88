"""Device-time profile of the per-frame fast path on the real chip.

Decomposes the tracked-fps number into (a) pure device compute of the two
per-frame programs (`extract_only`, `track_only` — the pair the pipelined
tracker dispatches each frame, system.py:169/200) and (b) host<->device
dispatch/transfer overhead of the shared relay tunnel. The amortized
back-to-back time bounds the achievable steady-state throughput on a
locally attached chip; the blocking p50 minus the amortized time is the
per-dispatch tunnel tax (reference: the CPU pipeline has no such tax —
SURVEY §3 hot-loop ranking).

    python scripts/profile_frame.py [--n-features 1024] [--reps 40]

Prints one JSON line with the decomposition.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _p50(samples):
    return float(np.median(np.asarray(samples)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-features", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=40)
    args = ap.parse_args()

    import jax
    from orb_slam3_comments_ghr_tpu.utils.cache import setup_compile_cache
    setup_compile_cache(jax, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), min_compile_secs=1.0)
    import jax.numpy as jnp
    from orb_slam3_comments_ghr_tpu.ops import cameras
    from orb_slam3_comments_ghr_tpu.pipeline import programs
    from orb_slam3_comments_ghr_tpu.utils import synthetic

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _synth_track_inputs

    cam = cameras.euroc_cam0()
    scene = synthetic.make_textured_scene(7)
    R, t = synthetic.circular_trajectory(8)[1]
    img = jnp.asarray(synthetic.render_image(scene, cam, R, t))
    _, feats0, lp, R0, t0 = _synth_track_inputs(n_feat=args.n_features,
                                                n_pts=4096)

    # --- tunnel RTT: a trivial dispatch round-trip ----------------------
    tiny = jax.jit(lambda x: x + 1)
    x = jnp.zeros((), jnp.float32)
    tiny(x).block_until_ready()
    rtts = []
    for _ in range(args.reps):
        t0_ = time.perf_counter()
        tiny(x).block_until_ready()
        rtts.append(time.perf_counter() - t0_)
    rtt = _p50(rtts)

    def run_extract():
        return programs.extract_only(cam, img, n_features=args.n_features)

    def run_track(f):
        return programs.track_only(cam, f, lp, R0, t0)

    feats = run_extract()
    jax.block_until_ready(feats)
    res = run_track(feats)
    jax.block_until_ready(res)

    # --- blocking per-call latency (includes one tunnel round trip) -----
    bl_e, bl_t = [], []
    for _ in range(args.reps):
        t0_ = time.perf_counter()
        f = run_extract()
        jax.block_until_ready(f)
        bl_e.append(time.perf_counter() - t0_)
        t0_ = time.perf_counter()
        r = run_track(f)
        jax.block_until_ready(r)
        bl_t.append(time.perf_counter() - t0_)

    # --- amortized back-to-back: device queue stays full, one final sync;
    # this is the steady-state per-frame device time (what a local chip
    # would sustain) ----------------------------------------------------
    chain = args.reps
    t0_ = time.perf_counter()
    outs = []
    for _ in range(chain):
        f = run_extract()
        outs.append(run_track(f))
    jax.block_until_ready(outs[-1])
    amortized = (time.perf_counter() - t0_) / chain

    dev_ms = amortized * 1e3
    out = {
        "metric": "per_frame_device_profile",
        "platform": jax.devices()[0].platform,
        "n_features": args.n_features,
        "tunnel_rtt_ms_p50": round(rtt * 1e3, 2),
        "extract_blocking_ms_p50": round(_p50(bl_e) * 1e3, 2),
        "track_blocking_ms_p50": round(_p50(bl_t) * 1e3, 2),
        "frame_amortized_ms": round(dev_ms, 2),
        "fps_device_capability": round(1e3 / max(dev_ms, 1e-6), 1),
        "fps_blocking": round(1.0 / max(_p50(bl_e) + _p50(bl_t), 1e-9), 1),
        "tunnel_tax_ms_per_frame": round(
            (_p50(bl_e) + _p50(bl_t)) * 1e3 - dev_ms, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
