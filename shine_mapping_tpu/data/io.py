"""Point-cloud and mesh file I/O (PLY / PCD / KITTI .bin / .label).

Replaces the reference's Open3D-based I/O (dataset/lidar_dataset.py:283-332,
utils/mesher.py:361-366) with self-contained numpy readers/writers:

* KITTI ``.bin``: float32 Nx4 (x, y, z, intensity).
* ``.ply``: ascii and binary_little_endian, points / normals / colors /
  intensity properties, and triangle meshes (vertex + face elements).
* ``.pcd``: ascii and binary, xyz(+intensity).
* semantic ``.label``: uint32 per-point labels (lower 16 bits = class).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

_PLY_DTYPES = {
    "float": "<f4",
    "float32": "<f4",
    "float64": "<f8",
    "double": "<f8",
    "uchar": "<u1",
    "uint8": "<u1",
    "char": "<i1",
    "int8": "<i1",
    "short": "<i2",
    "int16": "<i2",
    "ushort": "<u2",
    "uint16": "<u2",
    "int": "<i4",
    "int32": "<i4",
    "uint": "<u4",
    "uint32": "<u4",
}


@dataclass
class PointCloud:
    """Simple host-side point cloud container (numpy)."""

    points: np.ndarray  # (N, 3) float64
    normals: Optional[np.ndarray] = None  # (N, 3)
    colors: Optional[np.ndarray] = None  # (N, 3) in [0, 1]
    intensity: Optional[np.ndarray] = None  # (N,)

    def __len__(self) -> int:
        return self.points.shape[0]

    def select(self, mask_or_idx) -> "PointCloud":
        return PointCloud(
            points=self.points[mask_or_idx],
            normals=None if self.normals is None else self.normals[mask_or_idx],
            colors=None if self.colors is None else self.colors[mask_or_idx],
            intensity=None
            if self.intensity is None
            else self.intensity[mask_or_idx],
        )

    def transform(self, T: np.ndarray) -> "PointCloud":
        R, t = T[:3, :3], T[:3, 3]
        pts = self.points @ R.T + t
        nrm = None if self.normals is None else self.normals @ R.T
        return PointCloud(pts, nrm, self.colors, self.intensity)

    def concat(self, other: "PointCloud") -> "PointCloud":
        def cat(a, b):
            if a is None or b is None:
                return None
            return np.concatenate([a, b], axis=0)

        return PointCloud(
            points=np.concatenate([self.points, other.points], axis=0),
            normals=cat(self.normals, other.normals),
            colors=cat(self.colors, other.colors),
            intensity=cat(self.intensity, other.intensity),
        )


@dataclass
class TriangleMesh:
    """Host-side triangle mesh (numpy)."""

    vertices: np.ndarray  # (V, 3) float64
    triangles: np.ndarray  # (F, 3) int32
    vertex_normals: Optional[np.ndarray] = None
    vertex_colors: Optional[np.ndarray] = None

    def transform(self, T: np.ndarray) -> "TriangleMesh":
        R, t = T[:3, :3], T[:3, 3]
        v = self.vertices @ R.T + t
        n = None if self.vertex_normals is None else self.vertex_normals @ R.T
        return TriangleMesh(v, self.triangles, n, self.vertex_colors)


# --------------------------------------------------------------------------
# KITTI formats


def read_kitti_bin(path: str) -> PointCloud:
    """KITTI velodyne scan: float32 (N, 4) xyzi — dataset/lidar_dataset.py:286."""
    raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return PointCloud(
        points=raw[:, :3].astype(np.float64), intensity=raw[:, 3].astype(np.float64)
    )


def read_kitti_label(path: str) -> np.ndarray:
    """Semantic-KITTI .label: uint32 per point (dataset/lidar_dataset.py:313)."""
    return np.fromfile(path, dtype=np.uint32).reshape(-1)


# --------------------------------------------------------------------------
# PLY


def _ply_parse_header(f) -> Tuple[str, List[Tuple[str, int, List[Tuple[str, str]]]], int]:
    line = f.readline().decode("ascii").strip()
    if line != "ply":
        raise ValueError("not a ply file")
    fmt = None
    elements = []  # (name, count, [(dtype, prop_name), ...])
    while True:
        line = f.readline().decode("ascii").strip()
        if line.startswith("comment") or line == "":
            continue
        if line.startswith("format"):
            fmt = line.split()[1]
        elif line.startswith("element"):
            _, name, count = line.split()
            elements.append((name, int(count), []))
        elif line.startswith("property"):
            parts = line.split()
            if parts[1] == "list":
                elements[-1][2].append(("list:" + parts[2] + ":" + parts[3], parts[4]))
            else:
                elements[-1][2].append((parts[1], parts[2]))
        elif line == "end_header":
            break
    return fmt, elements, f.tell()


def read_ply(path: str):
    """Read a .ply as PointCloud (no faces) or TriangleMesh (with faces)."""
    with open(path, "rb") as f:
        fmt, elements, _ = _ply_parse_header(f)
        data: Dict[str, Dict[str, np.ndarray]] = {}
        for name, count, props in elements:
            has_list = any(p[0].startswith("list:") for p in props)
            if fmt == "ascii":
                rows = [f.readline().decode("ascii").split() for _ in range(count)]
                if has_list:
                    # assume single list property (face vertex_indices)
                    arr = np.array(
                        [[float(v) for v in r[1: 1 + int(r[0])]] for r in rows]
                    )
                    data[name] = {"vertex_indices": arr.astype(np.int64)}
                else:
                    arr = np.array([[float(v) for v in r] for r in rows])
                    data[name] = {
                        p[1]: arr[:, i] for i, p in enumerate(props)
                    }
            else:  # binary_little_endian
                if has_list:
                    # (count, idx...) records; fast path assumes the usual
                    # all-triangle layout and reads the whole element as one
                    # fixed-stride structured array (million-face meshes in
                    # milliseconds); mixed list lengths fall back to an
                    # in-memory offset walk
                    ldt, lidx = props[0][0].split(":")[1:]
                    cdt = np.dtype(_PLY_DTYPES[ldt])
                    idt = np.dtype(_PLY_DTYPES[lidx])
                    rec = np.dtype([("n", cdt), ("v", idt, (3,))])
                    start = f.tell()
                    blob = f.read(rec.itemsize * count)
                    n_read = len(blob) // rec.itemsize
                    raw = np.frombuffer(blob, rec, count=n_read)
                    if n_read == count and np.all(raw["n"] == 3):
                        faces = raw["v"].astype(np.int64)
                    else:
                        f.seek(start)
                        blob = blob + f.read()
                        faces = np.empty((count, 3), dtype=np.int64)
                        off = 0
                        for i in range(count):
                            n = int(np.frombuffer(blob, cdt, 1, off)[0])
                            off += cdt.itemsize
                            vals = np.frombuffer(blob, idt, n, off)
                            off += idt.itemsize * n
                            faces[i] = vals[:3]
                        f.seek(start + off)
                    data[name] = {"vertex_indices": faces}
                else:
                    dt = np.dtype([(p[1], _PLY_DTYPES[p[0]]) for p in props])
                    raw = np.frombuffer(f.read(dt.itemsize * count), dt)
                    data[name] = {p[1]: np.asarray(raw[p[1]]) for p in props}

    v = data.get("vertex", {})
    pts = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float64)
    normals = None
    if "nx" in v:
        normals = np.stack([v["nx"], v["ny"], v["nz"]], axis=1).astype(np.float64)
    colors = None
    if "red" in v:
        colors = (
            np.stack([v["red"], v["green"], v["blue"]], axis=1).astype(np.float64)
            / 255.0
        )
    intensity = v.get("intensity")
    if intensity is not None:
        intensity = np.asarray(intensity, dtype=np.float64)
    if "face" in data and len(data["face"].get("vertex_indices", [])) > 0:
        return TriangleMesh(
            vertices=pts,
            triangles=data["face"]["vertex_indices"].astype(np.int32),
            vertex_normals=normals,
            vertex_colors=colors,
        )
    return PointCloud(pts, normals, colors, intensity)


def read_point_cloud(path: str) -> PointCloud:
    """Dispatch on extension — reference dataset/lidar_dataset.py:283-299."""
    if path.endswith(".bin"):
        return read_kitti_bin(path)
    if path.endswith(".ply"):
        out = read_ply(path)
        if isinstance(out, TriangleMesh):
            return PointCloud(out.vertices, out.vertex_normals, out.vertex_colors)
        return out
    if path.endswith(".pcd"):
        return read_pcd(path)
    raise ValueError(
        "unsupported point cloud format (use .pcd, .ply or .bin): " + path
    )


def write_ply(path: str, obj, binary: bool = True) -> None:
    """Write a PointCloud or TriangleMesh to .ply."""
    is_mesh = isinstance(obj, TriangleMesh)
    pts = obj.vertices if is_mesh else obj.points
    normals = obj.vertex_normals if is_mesh else obj.normals
    colors = obj.vertex_colors if is_mesh else obj.colors
    intensity = None if is_mesh else obj.intensity
    n = pts.shape[0]

    props = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if normals is not None:
        props += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
    if colors is not None:
        props += [("red", "<u1"), ("green", "<u1"), ("blue", "<u1")]
    if intensity is not None:
        props += [("intensity", "<f4")]

    header = ["ply"]
    header.append(
        "format binary_little_endian 1.0" if binary else "format ascii 1.0"
    )
    header.append(f"element vertex {n}")
    typename = {"<f4": "float", "<u1": "uchar"}
    for name, dt in props:
        header.append(f"property {typename[dt]} {name}")
    if is_mesh:
        header.append(f"element face {obj.triangles.shape[0]}")
        header.append("property list uchar int vertex_indices")
    header.append("end_header")

    rec = np.empty(n, dtype=[(p, d) for p, d in props])
    rec["x"], rec["y"], rec["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
    if normals is not None:
        rec["nx"], rec["ny"], rec["nz"] = normals[:, 0], normals[:, 1], normals[:, 2]
    if colors is not None:
        c = np.clip(np.round(colors * 255), 0, 255).astype(np.uint8)
        rec["red"], rec["green"], rec["blue"] = c[:, 0], c[:, 1], c[:, 2]
    if intensity is not None:
        rec["intensity"] = intensity

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if binary:
            f.write(rec.tobytes())
            if is_mesh:
                tri = obj.triangles.astype("<i4")
                frec = np.empty(
                    tri.shape[0], dtype=[("n", "<u1"), ("v", "<i4", (3,))]
                )
                frec["n"] = 3
                frec["v"] = tri
                f.write(frec.tobytes())
        else:
            for i in range(n):
                f.write(
                    (" ".join(str(rec[p][i]) for p, _ in props) + "\n").encode()
                )
            if is_mesh:
                for t in obj.triangles:
                    f.write(f"3 {t[0]} {t[1]} {t[2]}\n".encode())


# --------------------------------------------------------------------------
# PCD


def read_pcd(path: str) -> PointCloud:
    """Minimal PCD v0.7 reader (ascii + binary)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key.upper()] = val
            if key.upper() == "DATA":
                break
        fields = header["FIELDS"].split()
        sizes = [int(s) for s in header["SIZE"].split()]
        types = header["TYPE"].split()
        counts = [int(c) for c in header.get("COUNT", " ".join(["1"] * len(fields))).split()]
        n = int(header["POINTS"])
        typemap = {("F", 4): "<f4", ("F", 8): "<f8", ("U", 1): "<u1",
                   ("U", 2): "<u2", ("U", 4): "<u4", ("I", 1): "<i1",
                   ("I", 2): "<i2", ("I", 4): "<i4"}
        dt = np.dtype(
            [
                (fields[i], typemap[(types[i], sizes[i])], (counts[i],))
                if counts[i] > 1
                else (fields[i], typemap[(types[i], sizes[i])])
                for i in range(len(fields))
            ]
        )
        if header["DATA"] == "ascii":
            rows = np.loadtxt(f, dtype=np.float64, max_rows=n)
            cols = {fields[i]: rows[:, i] for i in range(len(fields))}
        elif header["DATA"] == "binary":
            raw = np.frombuffer(f.read(dt.itemsize * n), dt)
            cols = {name: np.asarray(raw[name]).astype(np.float64) for name in fields}
        else:
            raise ValueError(f"unsupported PCD DATA {header['DATA']}")
    pts = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
    inten = cols.get("intensity")
    return PointCloud(points=pts, intensity=inten)


def write_pcd(path: str, pc: PointCloud) -> None:
    """Minimal binary PCD writer (xyz + optional intensity)."""
    n = len(pc)
    fields = ["x", "y", "z"] + (["intensity"] if pc.intensity is not None else [])
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
        f"FIELDS {' '.join(fields)}\n"
        f"SIZE {' '.join(['4'] * len(fields))}\n"
        f"TYPE {' '.join(['F'] * len(fields))}\n"
        f"COUNT {' '.join(['1'] * len(fields))}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA binary\n"
    )
    rec = np.empty(n, dtype=[(fld, "<f4") for fld in fields])
    rec["x"], rec["y"], rec["z"] = pc.points[:, 0], pc.points[:, 1], pc.points[:, 2]
    if pc.intensity is not None:
        rec["intensity"] = pc.intensity
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())
