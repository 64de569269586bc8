"""Incremental keyframe selector.

Behavioral match to /root/reference/src/keyframe/selector.py: first scan
forced (:122-135), OR-logic criteria, FIFO cap at ``max_keyframes``
(:157-159), per-criterion statistics and compression ratio (:243-298).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

from neural_spectral_codec_tpu.keyframe.criteria import KeyframeSelectionCriteria


@dataclass
class Keyframe:
    """Keyframe record (reference selector.py:20-36)."""

    keyframe_id: int
    scan_id: int
    points: np.ndarray          # (N, 3|4)
    pose: np.ndarray            # (4, 4)
    timestamp: float
    descriptor: Optional[np.ndarray] = None   # spectral histogram
    embedding: Optional[np.ndarray] = None    # GNN embedding
    sequence_id: int = 0        # which sequence (for per-sequence mining)


class KeyframeSelector:
    def __init__(
        self,
        distance_threshold: float = 0.5,
        rotation_threshold: float = 15.0,
        overlap_threshold: float = 0.7,
        temporal_threshold: float = 5.0,
        voxel_size: float = 0.2,
        max_keyframes: int = 10000,
    ):
        self.criteria = KeyframeSelectionCriteria(
            distance_threshold=distance_threshold,
            rotation_threshold=rotation_threshold,
            overlap_threshold=overlap_threshold,
            temporal_threshold=temporal_threshold,
            voxel_size=voxel_size,
        )
        self.max_keyframes = max_keyframes
        self.keyframes: List[Keyframe] = []
        self.keyframe_id_counter = 0
        self.last_keyframe: Optional[Keyframe] = None
        self.total_scans_processed = 0
        self.selection_details_history: List[dict] = []

    def reset(self):
        self.keyframes.clear()
        self.keyframe_id_counter = 0
        self.last_keyframe = None
        self.total_scans_processed = 0
        self.selection_details_history.clear()

    def process_scan(self, scan_id: int, points: np.ndarray, pose: np.ndarray,
                     timestamp: float, force_first: bool = True,
                     sequence_id: int = 0) -> Tuple[bool, Optional[Keyframe], dict]:
        self.total_scans_processed += 1

        if self.last_keyframe is None:
            if not force_first:
                return False, None, {"selected": False, "reason": "Not forcing first"}
            kf = self._create(scan_id, points, pose, timestamp, sequence_id)
            details = {"selected": True, "reason": "First keyframe",
                       "keyframe_id": kf.keyframe_id}
            self.selection_details_history.append(details)
            return True, kf, details

        selected, details = self.criteria.should_select_keyframe(
            pose_current=pose,
            timestamp_current=timestamp,
            points_current=points,
            pose_last=self.last_keyframe.pose,
            timestamp_last=self.last_keyframe.timestamp,
            points_last=self.last_keyframe.points,
            require_all=False,
        )
        if selected:
            kf = self._create(scan_id, points, pose, timestamp, sequence_id)
            if len(self.keyframes) > self.max_keyframes:
                self.keyframes.pop(0)  # FIFO cap (selector.py:157-159)
            details["keyframe_id"] = kf.keyframe_id
            self.selection_details_history.append(details)
            return True, kf, details
        self.selection_details_history.append(details)
        return False, None, details

    def _create(self, scan_id, points, pose, timestamp, sequence_id) -> Keyframe:
        kf = Keyframe(
            keyframe_id=self.keyframe_id_counter,
            scan_id=scan_id,
            points=points,
            pose=pose,
            timestamp=timestamp,
            sequence_id=sequence_id,
        )
        self.keyframe_id_counter += 1
        self.last_keyframe = kf
        self.keyframes.append(kf)
        return kf

    def process_sequence(self, points_list, poses, timestamps) -> List[Keyframe]:
        """Offline pass over a whole sequence (reference selector.py:200-227)."""
        self.reset()
        for scan_id in range(len(points_list)):
            self.process_scan(scan_id, points_list[scan_id], poses[scan_id],
                              timestamps[scan_id])
        return self.keyframes

    def get_keyframe_by_id(self, keyframe_id: int) -> Optional[Keyframe]:
        for kf in self.keyframes:
            if kf.keyframe_id == keyframe_id:
                return kf
        return None

    def get_keyframe_by_scan_id(self, scan_id: int) -> Optional[Keyframe]:
        for kf in self.keyframes:
            if kf.scan_id == scan_id:
                return kf
        return None

    def get_statistics(self) -> dict:
        """Compression ratio, rate, per-criterion counts
        (reference selector.py:243-298)."""
        if not self.keyframes:
            return {"num_keyframes": 0, "num_scans": self.total_scans_processed,
                    "compression_ratio": 0.0}
        compression = self.total_scans_processed / len(self.keyframes)
        if len(self.keyframes) > 1:
            dur = self.keyframes[-1].timestamp - self.keyframes[0].timestamp
            rate = (len(self.keyframes) - 1) / dur if dur > 0 else 0.0
        else:
            rate = 0.0
        counts = {"distance": 0, "rotation": 0, "temporal": 0, "geometric": 0}
        for d in self.selection_details_history:
            if d.get("selected", False):
                for k in counts:
                    entry = d.get(k)
                    if isinstance(entry, dict) and entry.get("satisfied"):
                        counts[k] += 1
        return {
            "num_keyframes": len(self.keyframes),
            "num_scans": self.total_scans_processed,
            "compression_ratio": compression,
            "avg_keyframe_rate_hz": rate,
            "criteria_counts": counts,
        }

    # --- batched exports (selector.py:300-360) ---

    def export_keyframe_poses(self) -> np.ndarray:
        return np.array([kf.pose for kf in self.keyframes])

    def export_keyframe_timestamps(self) -> np.ndarray:
        return np.array([kf.timestamp for kf in self.keyframes])

    def export_keyframe_descriptors(self) -> Optional[np.ndarray]:
        if not self.keyframes or self.keyframes[0].descriptor is None:
            return None
        return np.array([kf.descriptor for kf in self.keyframes])

    def attach_descriptors(self, descriptors: np.ndarray):
        assert len(descriptors) == len(self.keyframes)
        for kf, d in zip(self.keyframes, descriptors):
            kf.descriptor = d

    def attach_embeddings(self, embeddings: np.ndarray):
        assert len(embeddings) == len(self.keyframes)
        for kf, e in zip(self.keyframes, embeddings):
            kf.embedding = e


def select_keyframes_from_kitti(
    kitti_loader,
    distance_threshold: float = 0.5,
    rotation_threshold: float = 15.0,
    overlap_threshold: float = 0.7,
    temporal_threshold: float = 5.0,
) -> List[Keyframe]:
    """Run keyframe selection over a whole loader and log summary stats
    (reference selector.py:363-407; logs instead of printing). Works with
    any loader exposing ``__len__``/``__getitem__`` → frame dicts, not
    just KITTI — the name matches the reference surface."""
    selector = KeyframeSelector(
        distance_threshold=distance_threshold,
        rotation_threshold=rotation_threshold,
        overlap_threshold=overlap_threshold,
        temporal_threshold=temporal_threshold,
    )
    for scan_id in range(len(kitti_loader)):
        frame = kitti_loader[scan_id]
        selector.process_scan(scan_id, frame["points"], frame["pose"],
                              frame["timestamp"])
    stats = selector.get_statistics()
    logger.info("Selected %d keyframes from %d scans",
                stats["num_keyframes"], stats["num_scans"])
    logger.info("Compression ratio: %.1fx", stats["compression_ratio"])
    if "avg_keyframe_rate_hz" in stats:
        logger.info("Avg keyframe rate: %.2f Hz",
                    stats["avg_keyframe_rate_hz"])
    return selector.keyframes
