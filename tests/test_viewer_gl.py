"""Headless-EGL execution of the GL viewer: both pipelines actually draw.

Runs the REAL shader pipelines (point splats and the surfel geometry-shader
disks) through a surfaceless-EGL llvmpipe context and checks pixels landed.
Skips only if no EGL/GL stack is importable at all.
"""

import numpy as np
import pytest

from mast3r_slam_tpu.slam.frame import KeyframeBuffer, States


def _make_scene():
    h, w = 24, 32
    kfs = KeyframeBuffer(h, w, capacity=4, feat_dim=8, patch_size=8)
    states = States()
    rng = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32), indexing="xy")
    z = 2.0 + 0.1 * np.sin(u / 3.0)
    X = np.stack([(u - w / 2) / 20 * z, (v - h / 2) / 20 * z, z],
                 -1).reshape(-1, 3).astype(np.float32)

    import jax.numpy as jnp

    from mast3r_slam_tpu.slam.frame import Frame

    for i in range(2):
        fr = Frame(frame_id=i, img=None, img_shape=(h, w),
                   img_true_shape=(h, w),
                   uimg=rng.uniform(0.2, 1.0, (h, w, 3)).astype(np.float32))
        fr.T_WC = jnp.asarray(
            np.array([0.1 * i, 0, 0, 0, 0, 0, 1, 1], np.float32))
        fr.X_canon = jnp.asarray(X + 0.01 * i)
        fr.C = jnp.ones((h * w, 1), jnp.float32) * 2.0
        fr.feat = jnp.zeros((1, 12, 8))
        fr.pos = jnp.zeros((1, 12, 2), jnp.int32)
        fr.N = fr.N_updates = 1
        kfs.append(fr)
    with states.lock:
        states.edges_ii, states.edges_jj = [0], [1]
    return kfs, states


@pytest.fixture(scope="module")
def gl_viewer():
    from mast3r_slam_tpu.viz.viewer import Viewer

    kfs, states = _make_scene()
    v = Viewer(kfs, states, {}, width=160, height=120, headless=True)
    v.show_ui = False  # map-pipeline tests; the overlay has its own test
    try:
        v.init_gl()
    except Exception as e:  # no GL stack at all
        pytest.skip(f"no headless GL available: {e}")
    yield v
    v.ctx.destroy()


def _nonbg_fraction(img):
    bg = np.array([int(0.05 * 255), int(0.05 * 255), int(0.08 * 255)])
    return (np.abs(img.astype(int) - bg).sum(-1) > 10).mean()


def test_surfel_pipeline_draws(gl_viewer):
    gl_viewer.surfel_mode = True
    gl_viewer.surfel_radius = 0.05
    gl_viewer.render_frame()
    img = gl_viewer.ctx.read_pixels()
    assert img.shape == (120, 160, 3)
    assert _nonbg_fraction(img) > 0.05, "surfel pass drew nothing"


def test_point_pipeline_and_overlays_draw(gl_viewer):
    gl_viewer.surfel_mode = False
    gl_viewer.render_frame()
    img = gl_viewer.ctx.read_pixels()
    assert _nonbg_fraction(img) > 0.01, "point pass drew nothing"


def test_conf_threshold_culls(gl_viewer):
    gl_viewer.surfel_mode = True
    gl_viewer.conf_threshold = 100.0   # above every confidence
    gl_viewer._kf_points.clear()
    gl_viewer.keyframes.is_dirty[:2] = True
    gl_viewer.render_frame()
    img = gl_viewer.ctx.read_pixels()
    lo = _nonbg_fraction(img)
    gl_viewer.conf_threshold = 0.0
    gl_viewer._kf_points.clear()
    gl_viewer.keyframes.is_dirty[:2] = True
    gl_viewer.render_frame()
    hi = _nonbg_fraction(img := gl_viewer.ctx.read_pixels())
    assert hi > lo, (hi, lo)


def test_control_overlay_draws_and_handles_input(gl_viewer):
    """The imgui-equivalent control panel (viz/ui.py): renders, and its
    buttons/sliders mutate viewer + shared state exactly like the
    reference's imgui callbacks (visualization.py:324-332)."""
    gl_viewer.show_ui = True
    try:
        gl_viewer.render_frame()
        img = gl_viewer.ctx.read_pixels()
        # panel background color present (top-left region)
        panel_px = img[6:100, 6:100].reshape(-1, 3)
        bg = np.array([int(0.12 * 255), int(0.13 * 255), int(0.18 * 255)])
        assert (np.abs(panel_px.astype(int) - bg).sum(-1) < 12).mean() > 0.2

        ov = gl_viewer.overlay
        # pause button = first widget
        btn = ov.widgets[0]
        x = btn.rect[0] + 5
        y = btn.rect[1] + 5
        with gl_viewer.states.lock:
            paused0 = gl_viewer.states.paused
        assert ov.handle_press(x, y)
        with gl_viewer.states.lock:
            assert gl_viewer.states.paused != paused0
        assert btn.text() in ("PAUSE", "RESUME")
        ov.handle_release()

        # conf slider: press at 50% then drag to ~100%
        sld = [w for w in ov.widgets if hasattr(w, "lo")][0]
        sx, sy, sw, sh = sld.rect
        assert ov.handle_press(sx + sw * 0.5, sy + sh / 2)
        v_mid = sld.get()
        assert abs(v_mid - (sld.lo + 0.5 * (sld.hi - sld.lo))) < 0.2 * (
            sld.hi - sld.lo)
        assert ov.handle_drag(sx + sw, sy + sh / 2)
        assert sld.get() > v_mid
        ov.handle_release()
        assert not ov.handle_drag(sx, sy)  # drag ends on release

        # a click outside the panel is NOT consumed (camera drag instead).
        # (the tiny 160x120 test window sits entirely under the fixed-size
        # panel, so probe a coordinate beyond the panel's extent)
        assert not ov.handle_press(ov.panel_rect[0] + ov.panel_rect[2] + 50,
                                   ov.panel_rect[1] + ov.panel_rect[3] + 50)
    finally:
        gl_viewer.show_ui = False
        with gl_viewer.states.lock:
            gl_viewer.states.paused = False
        gl_viewer.conf_threshold = 0.0
