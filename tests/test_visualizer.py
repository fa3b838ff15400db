"""Headless tests of the visualizer control state machine
(reference key semantics: utils/visualizer.py:107-201)."""

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
