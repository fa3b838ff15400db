"""Semantic-KITTI label mappings (public dataset specification).

Parity target: reference utils/semantic_kitti_utils.py:43-126 — the raw
label -> 20-class learning map (with classes 52/99 mapped to the extra
"others" class 20 as the reference does), class names and the reference's
color palette.
"""

from __future__ import annotations

import numpy as np

# raw semantic-kitti label id -> reduced learning class (0..20)
SEM_KITTI_LEARNING_MAP = {
    0: 0, 1: 0,
    10: 1, 11: 2, 13: 5, 15: 3, 16: 5, 18: 4, 20: 5,
    30: 6, 31: 7, 32: 8,
    40: 9, 44: 10, 48: 11, 49: 12, 50: 13, 51: 14, 52: 20,
    60: 9, 70: 15, 71: 16, 72: 17, 80: 18, 81: 19, 99: 20,
    252: 1, 253: 7, 254: 6, 255: 8, 256: 5, 257: 5, 258: 4, 259: 5,
}

SEM_KITTI_CLASS_NAMES = {
    0: "unlabeled",
    1: "car", 2: "bicycle", 3: "motorcycle", 4: "truck", 5: "other-vehicle",
    6: "person", 7: "bicyclist", 8: "motorcyclist",
    9: "road", 10: "parking", 11: "sidewalk", 12: "other-ground",
    13: "building", 14: "fence", 15: "vegetation", 16: "trunk", 17: "terrain",
    18: "pole", 19: "traffic-sign", 20: "others",
}

# class id -> rgb (0-255), reference utils/semantic_kitti_utils.py:104-126
SEM_KITTI_COLOR_MAP = {
    0: (255, 255, 255),
    1: (100, 150, 245), 2: (100, 230, 245), 3: (30, 60, 150),
    4: (80, 30, 180), 5: (0, 0, 255), 6: (255, 30, 30),
    7: (255, 40, 200), 8: (150, 30, 90), 9: (255, 0, 255),
    10: (255, 150, 255), 11: (75, 0, 75), 12: (175, 0, 75),
    13: (255, 200, 0), 14: (255, 120, 50), 15: (0, 175, 0),
    16: (135, 60, 0), 17: (150, 240, 80), 18: (255, 240, 150),
    19: (255, 0, 0), 20: (30, 30, 30),
}

_LEARNING_LUT = np.zeros(260, dtype=np.int32)
for raw, cls in SEM_KITTI_LEARNING_MAP.items():
    _LEARNING_LUT[raw] = cls

_COLOR_LUT = np.zeros((21, 3), dtype=np.float64)
for cls, rgb in SEM_KITTI_COLOR_MAP.items():
    _COLOR_LUT[cls] = rgb


def map_labels(raw_labels: np.ndarray) -> np.ndarray:
    """Raw .label values (lower 16 bits) -> reduced class ids, vectorized."""
    sem = (raw_labels & 0xFFFF).astype(np.int64)
    sem = np.clip(sem, 0, _LEARNING_LUT.shape[0] - 1)
    return _LEARNING_LUT[sem]


def labels_to_colors(labels: np.ndarray) -> np.ndarray:
    """Class ids -> float rgb in [0,1] using the reference palette."""
    lab = np.clip(labels.astype(np.int64), 0, 20)
    return _COLOR_LUT[lab] / 255.0


def preprocess_sem_kitti(
    points: np.ndarray,
    labels: np.ndarray,
    min_range: float = 2.75,
    filter_outlier: bool = True,
    filter_moving: bool = True,
):
    """Range/moving/outlier filtering + learning-map reduction.

    Parity: reference ``preprocess_sem_kitti``
    (dataset/lidar_dataset.py:341-362).
    """
    sem = (labels & 0xFFFF).astype(np.int64)
    keep = np.linalg.norm(points, axis=1) >= min_range
    points, sem = points[keep], sem[keep]
    if filter_moving:
        keep = sem < 100
        points, sem = points[keep], sem[keep]
    if filter_outlier:
        keep = sem != 1
        points, sem = points[keep], sem[keep]
    sem = np.clip(sem, 0, _LEARNING_LUT.shape[0] - 1)
    return points, _LEARNING_LUT[sem]
