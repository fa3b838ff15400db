"""Headless tests of the visualizer control state machine
(reference key semantics: utils/visualizer.py:107-201) and the
offscreen software-rasterizer draw path."""

import numpy as np

from shine_mapping_tpu.visualizer import MapVisualizer


def make_vis():
    v = MapVisualizer()
    assert v._vis is None  # headless in the test image
    return v


def test_space_pause_resume_and_step():
    v = make_vis()
    assert v.should_advance()
    v.handle_key(" ")  # pause
    assert not v.playing
    assert not v.should_advance()
    v.handle_key("N")  # single step while paused
    assert v.should_advance()       # consumes the step
    assert not v.should_advance()   # still paused afterwards
    v.handle_key(" ")  # resume
    assert v.should_advance()


def test_step_ignored_while_playing():
    v = make_vis()
    v.handle_key("N")
    assert not v.step_once


def test_quit_keys():
    for key in ("Q", "\x1b"):
        v = make_vis()
        v.handle_key(key)
        assert v.quit_requested
        assert not v.should_advance()


def test_view_and_render_toggles():
    v = make_vis()
    assert not v.global_view and v.render_scan and v.render_map
    v.handle_key("V")
    assert v.global_view
    v.handle_key("V")
    assert not v.global_view
    v.handle_key("F")
    assert not v.render_scan
    v.handle_key("M")
    assert not v.render_map
    v.handle_key("B")
    assert v.background == "black"
    v.handle_key("W")
    assert v.background == "white"


def test_headless_update_noop():
    v = make_vis()
    v.update(None, None, None)  # must not raise
    v.update_mesh(None)
    v.stop()


def _scene():
    """A ground quad mesh + a little scan + a pose, metric scale."""
    from shine_mapping_tpu.data.io import TriangleMesh, PointCloud

    g = np.linspace(-10, 10, 9)
    xx, yy = np.meshgrid(g, g)
    v = np.stack([xx.ravel(), yy.ravel(), np.zeros(xx.size)], 1)
    tris = []
    n = len(g)
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            tris += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    mesh = TriangleMesh(
        vertices=v.astype(np.float32),
        triangles=np.asarray(tris, np.int32),
        vertex_normals=None,
        vertex_colors=None,
    )
    rng = np.random.default_rng(0)
    scan = PointCloud(points=rng.uniform(-8, 8, (400, 3)).astype(np.float32)
                      * np.array([1, 1, 0.05], np.float32)
                      + np.array([0, 0, 1.0], np.float32))
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, 1.2]
    return scan, pose, mesh


def test_render_offscreen_draws_scene(tmp_path):
    """The headless draw path must actually rasterize: mesh pixels differ
    from the background, the scan shows up golden, toggles and the
    ego/global camera change the image, and the PNG lands on disk."""
    scan, pose, mesh = _scene()
    v = make_vis()
    p = str(tmp_path / "frame.png")
    img = v.render_offscreen(p, scan_pc=scan, pose=pose, mesh=mesh,
                             width=320, height=200)
    assert img.shape == (200, 320, 3)
    import os

    assert os.path.exists(p)
    white = (img == 255).all(axis=2).mean()
    assert white < 0.9, "nothing was drawn"
    # golden scan points present (R and G high, B low)
    golden = ((img[..., 0] > 200) & (img[..., 1] > 150)
              & (img[..., 2] < 120)).sum()
    assert golden > 10

    # [F] hides the scan
    v.handle_key("F")
    img_nf = v.render_offscreen("", scan_pc=scan, pose=pose, mesh=mesh,
                                width=320, height=200)
    golden_nf = ((img_nf[..., 0] > 200) & (img_nf[..., 1] > 150)
                 & (img_nf[..., 2] < 120)).sum()
    assert golden_nf < golden / 2
    v.handle_key("F")

    # [M] hides the mesh -> image mostly background again
    v.handle_key("M")
    img_nm = v.render_offscreen("", scan_pc=scan, pose=pose, mesh=mesh,
                                width=320, height=200)
    assert (img_nm == 255).all(axis=2).mean() > white
    v.handle_key("M")

    # [B] black background
    v.handle_key("B")
    img_b = v.render_offscreen("", scan_pc=scan, pose=pose, mesh=mesh,
                               width=320, height=200)
    assert (img_b == 0).all(axis=2).mean() > 0.05
    v.handle_key("W")

    # [V] global (overhead) view differs from ego view
    v.handle_key("V")
    img_g = v.render_offscreen("", scan_pc=scan, pose=pose, mesh=mesh,
                               width=320, height=200)
    assert (img_g != img).mean() > 0.05
