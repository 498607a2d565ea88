"""Segment-wise trajectory error analysis for GT-replay triage.

Aligns an estimated TUM trajectory to the EuRoC ground truth with Horn
(optionally scale), then reports per-segment RMSE/max over fixed time
windows — pinpoints WHERE a sequence's error concentrates (drift vs one bad
segment vs uniform noise). Reference workflow: evaluate_ate_scale.py gives
one scalar; the reference authors eyeball the aligned plot for the same
purpose (evaluation/evaluate_ate_scale.py:118 plot code).

    python scripts/analyze_trajectory.py --seq V202 --tum out.tum [--segments 20]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", required=True)
    ap.add_argument("--tum", required=True)
    ap.add_argument("--segments", type=int, default=20)
    ap.add_argument("--scale", action="store_true")
    args = ap.parse_args()

    from orb_slam3_comments_ghr_tpu.utils import gt_replay, evaluation

    times, R_cw, t_cw, p_wc, q_wc = gt_replay.load_euroc_gt(args.seq)
    gt = {}
    for i in range(len(times)):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R_cw[i]
        T[:3, 3] = t_cw[i]
        gt[round(float(times[i]), 4)] = T

    est = []
    for line in open(args.tum):
        if line.startswith("#") or not line.strip():
            continue
        v = [float(x) for x in line.split()]
        t, p, q = v[0], np.array(v[1:4]), np.array(v[4:8])  # x y z qx qy qz qw
        # TUM stores T_wc; convert to T_cw
        Rwc = _quat_to_R(q)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rwc.T
        T[:3, 3] = -Rwc.T @ p
        est.append((t, T))

    # associate + aligned per-frame errors (same Horn math as ate_rmse)
    pairs = []
    for t, T in est:
        k = round(t, 4)
        if k in gt:
            pairs.append((t, T, gt[k]))
    if len(pairs) < 10:
        # fall back to nearest-neighbour association (0.02 s tolerance)
        gtt = np.array(sorted(gt.keys()))
        pairs = []
        for t, T in est:
            j = np.searchsorted(gtt, t)
            for c in (j - 1, j):
                if 0 <= c < len(gtt) and abs(gtt[c] - t) <= 0.02:
                    pairs.append((t, T, gt[gtt[c]]))
                    break
    print(f"matched {len(pairs)} / {len(est)} est frames to GT")
    P_est = np.array([np.linalg.inv(T)[ :3, 3] for _, T, _ in pairs])
    P_gt = np.array([np.linalg.inv(G)[:3, 3] for _, _, G in pairs])
    ts = np.array([t for t, _, _ in pairs])

    s, R, t0 = _horn(P_est, P_gt, with_scale=args.scale)
    P_al = s * (P_est @ R.T) + t0
    err = np.linalg.norm(P_al - P_gt, axis=1)
    print(f"overall RMSE {np.sqrt((err**2).mean())*100:.2f} cm  "
          f"median {np.median(err)*100:.2f}  max {err.max()*100:.2f}")
    edges = np.linspace(ts[0], ts[-1], args.segments + 1)
    for i in range(args.segments):
        m = (ts >= edges[i]) & (ts < edges[i + 1])
        if m.sum() < 2:
            continue
        e = err[m]
        print(f"  [{edges[i]-ts[0]:6.1f}-{edges[i+1]-ts[0]:6.1f}s] "
              f"rmse {np.sqrt((e**2).mean())*100:6.2f} cm  "
              f"max {e.max()*100:6.2f}  n={m.sum()}")


def _quat_to_R(q):
    x, y, z, w = q
    n = np.sqrt(x*x + y*y + z*z + w*w)
    x, y, z, w = x/n, y/n, z/n, w/n
    return np.array([
        [1-2*(y*y+z*z), 2*(x*y-z*w), 2*(x*z+y*w)],
        [2*(x*y+z*w), 1-2*(x*x+z*z), 2*(y*z-x*w)],
        [2*(x*z-y*w), 2*(y*z+x*w), 1-2*(x*x+y*y)],
    ])


def _horn(A, B, with_scale=False):
    ca, cb = A.mean(0), B.mean(0)
    A0, B0 = A - ca, B - cb
    H = A0.T @ B0
    U, S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    s = (S * np.diag(D)).sum() / (A0**2).sum() if with_scale else 1.0
    t = cb - s * R @ ca
    return s, R, t


if __name__ == "__main__":
    main()
