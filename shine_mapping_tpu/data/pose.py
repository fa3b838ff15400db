"""Pose / calibration file readers.

Parity target: reference utils/pose.py — KITTI calibration files
(utils/pose.py:7-30), KITTI pose files with the Tr^-1 * P * Tr sensor-frame
transform (utils/pose.py:33-58), and CSV xyz+quaternion odometry
(utils/pose.py:61-87, without the pyquaternion dependency).
"""

from __future__ import annotations

import csv
from typing import Dict, List

import numpy as np
from numpy.linalg import inv


def read_calib_file(filename: str) -> Dict[str, np.ndarray]:
    """KITTI calib: 'KEY: 12 floats' lines -> 4x4 matrices."""
    calib: Dict[str, np.ndarray] = {}
    with open(filename) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            key, content = line.split(":", 1)
            values = [float(v) for v in content.strip().split()]
            pose = np.zeros((4, 4))
            pose[0, :4] = values[0:4]
            pose[1, :4] = values[4:8]
            pose[2, :4] = values[8:12]
            pose[3, 3] = 1.0
            calib[key] = pose
    return calib


def read_poses_file(filename: str, calibration: Dict[str, np.ndarray]) -> List[np.ndarray]:
    """KITTI poses (camera frame) -> LiDAR-frame poses via Tr^-1 P Tr."""
    Tr = calibration["Tr"]
    Tr_inv = inv(Tr)
    poses = []
    with open(filename) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            values = [float(v) for v in line.split()]
            pose = np.zeros((4, 4))
            pose[0, :4] = values[0:4]
            pose[1, :4] = values[4:8]
            pose[2, :4] = values[8:12]
            pose[3, 3] = 1.0
            poses.append(Tr_inv @ pose @ Tr)
    return poses


def quat_to_rotation(qx: float, qy: float, qz: float, qw: float) -> np.ndarray:
    """Unit quaternion -> 3x3 rotation matrix (replaces pyquaternion)."""
    n = np.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
    qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
    return np.array(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
            [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
            [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
        ]
    )


def csv_odom_to_transforms(path: str) -> List[np.ndarray]:
    """CSV with header ts,tx,ty,tz,qx,qy,qz,qw (reference utils/pose.py:61-87)."""
    poses = []
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        header[0] = "ts"
        for row in reader:
            odom = {label: row[i] for i, label in enumerate(header)}
            trans = np.array([float(odom[k]) for k in ("tx", "ty", "tz")])
            R = quat_to_rotation(
                float(odom["qx"]), float(odom["qy"]), float(odom["qz"]), float(odom["qw"])
            )
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = trans
            poses.append(T)
    return poses
