#!/usr/bin/env python
"""Bound the keyframe-selection divergence from the overlap-frame fix.

Documented divergence #1 (PARITY.md): the reference's ``compute_overlap``
transforms the WRONG cloud (reference pose_utils.py:353) — ``T_12`` maps
current-frame coordinates into the last keyframe's frame, but the
reference applies it to the last keyframe's cloud, offsetting the two
clouds by ~2x the actual motion and deflating the IoU. This experiment
measures how often that changes SELECTION DECISIONS on a stream where the
IoU criterion is the deciding one (slow creep: distance / rotation /
temporal thresholds all out of reach), by running three selectors on the
same stream:

  * ours          — frame-corrected overlap (this framework's behavior)
  * ours+refconv  — our selector but overlap evaluated with the
                    reference's (buggy) frame convention
  * reference     — the actual reference KeyframeSelector imported from
                    /root/reference/src

It also reports raw IoU under both conventions at fixed motion offsets,
which pins the mechanism (reference IoU decays ~2x faster with motion).

Run:  python experiments/selection_divergence.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
_REF = Path("/root/reference/src")
if _REF.exists():
    sys.path.insert(0, str(_REF))

from neural_spectral_codec_tpu.data.pose_utils import (
    compute_overlap, relative_pose)
from neural_spectral_codec_tpu.data.synthetic import SyntheticWorld
from neural_spectral_codec_tpu.keyframe.criteria import (
    KeyframeSelectionCriteria)
from neural_spectral_codec_tpu.keyframe.selector import KeyframeSelector


class _RefConventionCriteria(KeyframeSelectionCriteria):
    """Our criteria, but the IoU evaluated exactly the reference way:
    IoU(voxels(T_rel @ last), voxels(current)) — achieved by swapping the
    cloud arguments of the frame-corrected implementation."""

    def check_geometric_novelty(self, points_current, points_last,
                                pose_current, pose_last):
        T_rel = relative_pose(pose_last, pose_current)
        overlap = compute_overlap(points_current[:, :3], points_last[:, :3],
                                  T_rel, voxel_size=self.voxel_size,
                                  rng=self._rng)
        return overlap < self.overlap_threshold, overlap


def make_stream(n_frames=300, step=0.25, n_points=16384, seed=3):
    """Slow straight creep through a deterministic cylinder world: per-
    frame motion far below the distance threshold, no rotation, 10 Hz
    timestamps — only the IoU criterion can decide selection."""
    world = SyntheticWorld(seed=seed)
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n_frames):
        pose = np.eye(4, dtype=np.float64)
        pose[0, 3] = i * step
        pts = world.scan(pose, n_points=n_points, rng=rng)
        frames.append((i, pts, pose, i * 0.1))
    return frames


def run_selector(frames, selector):
    for scan_id, pts, pose, ts in frames:
        selector.process_scan(scan_id, pts, pose, ts)
    return [kf.scan_id for kf in selector.keyframes]


def main():
    # voxel 2.0 m puts the same-place IoU (~0.82) comfortably above the
    # 0.7 threshold, so the criterion measures scene change rather than
    # sampling noise; all other criteria are out of reach by construction
    thresholds = dict(distance_threshold=1e6, rotation_threshold=361.0,
                      overlap_threshold=0.7, temporal_threshold=1e9,
                      voxel_size=2.0)
    frames = make_stream()

    # --- mechanism: IoU vs motion offset under both conventions --------
    world = SyntheticWorld(seed=3)
    rng = np.random.default_rng(0)
    p0 = np.eye(4)
    pts0 = world.scan(p0, n_points=16384, rng=rng)
    print("IoU vs motion (voxel 2.0 m):")
    print("  offset   ours(corrected)   reference-convention")
    for off in (0.0, 0.5, 1.0, 2.0, 4.0, 8.0):
        p1 = np.eye(4)
        p1[0, 3] = off
        pts1 = world.scan(p1, n_points=16384, rng=rng)
        T = relative_pose(p0, p1)
        ours = compute_overlap(pts0[:, :3], pts1[:, :3], T, voxel_size=2.0,
                               rng=np.random.default_rng(1))
        refc = compute_overlap(pts1[:, :3], pts0[:, :3], T, voxel_size=2.0,
                               rng=np.random.default_rng(1))
        print(f"  {off:5.1f} m      {ours:.4f}            {refc:.4f}")

    # --- selection decisions on the IoU-decided stream -----------------
    results = {}
    sel = KeyframeSelector(**thresholds)
    results["ours"] = run_selector(frames, sel)

    sel_rc = KeyframeSelector(**thresholds)
    sel_rc.criteria = _RefConventionCriteria(
        **{k: v for k, v in thresholds.items()})
    results["ours+refconv"] = run_selector(frames, sel_rc)

    if _REF.exists():
        np.random.seed(0)
        from keyframe.selector import KeyframeSelector as RefSelector
        ref_sel = RefSelector(**thresholds)
        results["reference"] = run_selector(frames, ref_sel)

    n = len(frames)
    print(f"\nSelection on {n}-frame slow-creep stream "
          f"(step 0.25 m, overlap_threshold={thresholds['overlap_threshold']}, "
          "all other criteria unreachable):")
    for name, ids in results.items():
        print(f"  {name:14s}: {len(ids):3d} keyframes "
              f"(rate {len(ids)/n:.3f})  first 10: {ids[:10]}")

    def jaccard(a, b):
        a, b = set(a), set(b)
        return len(a & b) / max(len(a | b), 1)

    if "reference" in results:
        print("\nSet agreement (Jaccard over selected scan ids):")
        print(f"  ours         vs reference : "
              f"{jaccard(results['ours'], results['reference']):.3f}")
        print(f"  ours+refconv vs reference : "
              f"{jaccard(results['ours+refconv'], results['reference']):.3f}")
        print(f"  ours         vs ours+refconv: "
              f"{jaccard(results['ours'], results['ours+refconv']):.3f}")
    return results


if __name__ == "__main__":
    main()
