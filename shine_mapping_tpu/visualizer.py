"""Interactive map visualizer.

Parity target: reference ``MapVisualizer`` (utils/visualizer.py:28-201): a
non-blocking window showing the current scan, sensor pose frame and latest
mesh, with key callbacks — space pauses/resumes, V toggles the mesh, F the
pose frame, M the scan map (utils/visualizer.py:107-118).  Open3D is not
part of the TPU image, so the visualizer degrades to a headless no-op (same
API) when it is missing — all drivers run with ``o3d_vis_on: False`` by
default on TPU hosts.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:  # pragma: no cover - optional dependency
    import open3d as o3d

    _HAS_O3D = True
except ImportError:  # pragma: no cover
    _HAS_O3D = False


RANDOM_COLOR_TABLE = np.array(
    [
        [0.12, 0.47, 0.71],
        [1.00, 0.50, 0.05],
        [0.17, 0.63, 0.17],
        [0.84, 0.15, 0.16],
        [0.58, 0.40, 0.74],
        [0.55, 0.34, 0.29],
    ]
)


class MapVisualizer:
    """Non-blocking visualizer; headless no-op without open3d."""

    def __init__(self) -> None:
        self.paused = False
        self.show_mesh = True
        self.show_frame = True
        self.show_scan = True
        self._vis = None
        if not _HAS_O3D:
            print("open3d not available: visualizer runs headless (no-op)")
            return
        # pragma: no cover — requires a display
        self._vis = o3d.visualization.VisualizerWithKeyCallback()
        self._vis.create_window(window_name="shine_mapping_tpu")
        self._vis.register_key_callback(ord(" "), self._toggle("paused"))
        self._vis.register_key_callback(ord("V"), self._toggle("show_mesh"))
        self._vis.register_key_callback(ord("F"), self._toggle("show_frame"))
        self._vis.register_key_callback(ord("M"), self._toggle("show_scan"))
        self._scan = o3d.geometry.PointCloud()
        self._mesh = o3d.geometry.TriangleMesh()
        self._frame = o3d.geometry.TriangleMesh.create_coordinate_frame(size=1.0)
        self._first = True

    def _toggle(self, attr: str):  # pragma: no cover
        def cb(_vis):
            setattr(self, attr, not getattr(self, attr))
            return False

        return cb

    def update(self, scan_pc=None, pose: Optional[np.ndarray] = None, mesh=None) -> None:
        if self._vis is None:
            return
        # pragma: no cover — requires a display
        if self.paused:
            self._vis.poll_events()
            return
        if scan_pc is not None and self.show_scan:
            self._scan.points = o3d.utility.Vector3dVector(scan_pc.points)
        if pose is not None and self.show_frame:
            self._frame = o3d.geometry.TriangleMesh.create_coordinate_frame(size=1.0)
            self._frame.transform(pose)
        if mesh is not None and self.show_mesh:
            self._mesh.vertices = o3d.utility.Vector3dVector(mesh.vertices)
            self._mesh.triangles = o3d.utility.Vector3iVector(mesh.triangles)
            if mesh.vertex_colors is not None:
                self._mesh.vertex_colors = o3d.utility.Vector3dVector(mesh.vertex_colors)
            self._mesh.compute_vertex_normals()
        if self._first:
            self._vis.add_geometry(self._scan)
            self._vis.add_geometry(self._mesh)
            self._vis.add_geometry(self._frame)
            self._first = False
        else:
            self._vis.update_geometry(self._scan)
            self._vis.update_geometry(self._mesh)
            self._vis.update_geometry(self._frame)
        self._vis.poll_events()
        self._vis.update_renderer()

    def update_mesh(self, mesh) -> None:
        self.update(mesh=mesh)

    def stop(self) -> None:
        if self._vis is not None:  # pragma: no cover
            self._vis.destroy_window()
