"""Interactive OpenGL viewer (glfw + PyOpenGL), run as a host thread.

Interactive counterpart of the reference visualization process (reference:
mast3r_slam/visualization.py:383-445 + thirdparty/in3d): confidence-
thresholded keyframe point splats (updated incrementally via the keyframe
ring's ``is_dirty`` flags — reference visualization.py:131-151), trajectory
polyline, camera frustums, factor-graph edges, orbit/zoom camera, and
keyboard controls that message state back to the main loop (pause, conf
threshold, follow-cam) — the ``WindowMsg`` equivalent is direct mutation of
the shared ``States``/viewer fields under their locks.

Runs in a thread of the single controller process instead of a separate
``mp.Process`` — host threads are free while device compute is dispatched
asynchronously. Degrades gracefully (prints a notice) when no display or GL
stack is available; the headless snapshot renderer (viz/render.py) covers
that case.
"""

from __future__ import annotations

import threading
import time

import numpy as np

from mast3r_slam_tpu.ops import lie
from mast3r_slam_tpu.viz.render import frustum_corners

_VS = """
#version 120
attribute vec3 in_pos;
attribute vec3 in_color;
uniform mat4 mvp;
uniform float point_size;
varying vec3 v_color;
void main() {
    gl_Position = mvp * vec4(in_pos, 1.0);
    gl_PointSize = point_size;
    v_color = in_color;
}
"""

_FS = """
#version 120
varying vec3 v_color;
void main() { gl_FragColor = vec4(v_color, 1.0); }
"""


def _perspective(fovy, aspect, near, far):
    f = 1.0 / np.tan(np.radians(fovy) / 2)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = (far + near) / (near - far)
    m[2, 3] = 2 * far * near / (near - far)
    m[3, 2] = -1.0
    return m


class Viewer(threading.Thread):
    def __init__(self, keyframes, states, cfg, width=1280, height=720):
        super().__init__(daemon=True, name="viewer")
        self.keyframes = keyframes
        self.states = states
        self.cfg = cfg
        self.width, self.height = width, height
        self.conf_threshold = 0.0
        self.follow = False
        self.should_close = threading.Event()
        # orbit camera state
        self.yaw, self.pitch, self.dist = 0.0, -0.4, 4.0
        self.center = np.zeros(3, np.float32)
        self._drag = None
        self._kf_points: dict[int, tuple] = {}

    # -- GL plumbing ---------------------------------------------------------

    def _init_gl(self):
        import glfw
        from OpenGL import GL

        if not glfw.init():
            raise RuntimeError("glfw init failed (no display?)")
        glfw.window_hint(glfw.VISIBLE, True)
        self.win = glfw.create_window(self.width, self.height,
                                      "MASt3R-SLAM-TPU", None, None)
        if not self.win:
            glfw.terminate()
            raise RuntimeError("glfw window creation failed")
        glfw.make_context_current(self.win)
        glfw.set_scroll_callback(self.win, self._on_scroll)
        glfw.set_cursor_pos_callback(self.win, self._on_cursor)
        glfw.set_mouse_button_callback(self.win, self._on_button)
        glfw.set_key_callback(self.win, self._on_key)

        vs = GL.glCreateShader(GL.GL_VERTEX_SHADER)
        GL.glShaderSource(vs, _VS)
        GL.glCompileShader(vs)
        fs = GL.glCreateShader(GL.GL_FRAGMENT_SHADER)
        GL.glShaderSource(fs, _FS)
        GL.glCompileShader(fs)
        self.prog = GL.glCreateProgram()
        GL.glAttachShader(self.prog, vs)
        GL.glAttachShader(self.prog, fs)
        GL.glLinkProgram(self.prog)
        GL.glEnable(GL.GL_DEPTH_TEST)
        GL.glEnable(GL.GL_VERTEX_PROGRAM_POINT_SIZE)
        self.GL = GL
        self.glfw = glfw

    # -- input callbacks -----------------------------------------------------

    def _on_scroll(self, win, dx, dy):
        self.dist *= 0.9 ** dy

    def _on_button(self, win, button, action, mods):
        self._drag = (None if action == 0 else
                      self.glfw.get_cursor_pos(win))

    def _on_cursor(self, win, x, y):
        if self._drag is not None:
            x0, y0 = self._drag
            self.yaw += (x - x0) * 0.005
            self.pitch = np.clip(self.pitch + (y - y0) * 0.005, -1.5, 1.5)
            self._drag = (x, y)

    def _on_key(self, win, key, sc, action, mods):
        if action != 1:
            return
        g = self.glfw
        if key == g.KEY_SPACE:
            with self.states.lock:
                self.states.paused = not self.states.paused
        elif key == g.KEY_F:
            self.follow = not self.follow
        elif key in (g.KEY_UP, g.KEY_EQUAL):
            self.conf_threshold += 0.25
        elif key in (g.KEY_DOWN, g.KEY_MINUS):
            self.conf_threshold = max(0.0, self.conf_threshold - 0.25)
        elif key in (g.KEY_ESCAPE, g.KEY_Q):
            self.should_close.set()

    # -- data upload -----------------------------------------------------------

    def _refresh_dirty(self):
        kf = self.keyframes
        dirty = kf.get_dirty_idx()
        with kf.lock:
            for i in dirty:
                i = int(i)
                if i >= len(kf):
                    continue
                X = np.asarray(kf.X[i])
                C = np.asarray(kf.C[i][:, 0])
                n = max(int(kf.N[i]), 1)
                T = np.asarray(kf.T_WC[i])
                uimg = kf.uimg[i]
                col = (np.asarray(uimg, np.float32).reshape(-1, 3)
                       if uimg is not None else np.full((X.shape[0], 3), 0.7,
                                                        np.float32))
                self._kf_points[i] = (X, C / n, col, T)

    def _camera_mvp(self):
        cy, sy = np.cos(self.yaw), np.sin(self.yaw)
        cp, sp = np.cos(self.pitch), np.sin(self.pitch)
        eye = self.center + self.dist * np.array(
            [sy * cp, sp, -cy * cp], np.float32
        )
        f = self.center - eye
        f /= np.linalg.norm(f) + 1e-9
        up = np.array([0, -1, 0], np.float32)
        r = np.cross(f, up)
        r /= np.linalg.norm(r) + 1e-9
        d = np.cross(f, r)
        view = np.eye(4, dtype=np.float32)
        view[:3, :3] = np.stack([r, d, f])
        view[:3, 3] = -view[:3, :3] @ eye
        proj = _perspective(60, self.width / self.height, 0.01, 1000.0)
        return proj @ view

    def _draw_points(self, mvp):
        GL = self.GL
        pts, cols = [], []
        for i, (X, Cavg, col, T) in self._kf_points.items():
            keep = Cavg > self.conf_threshold
            Xw = np.asarray(lie.act(T[None], X))[keep]
            ok = np.isfinite(Xw).all(1) & (np.abs(Xw) < 1e4).all(1)
            pts.append(Xw[ok].astype(np.float32))
            cols.append(col[keep][ok])
        if not pts:
            return
        P = np.concatenate(pts)
        C = np.concatenate(cols)
        GL.glUseProgram(self.prog)
        mvp_loc = GL.glGetUniformLocation(self.prog, "mvp")
        GL.glUniformMatrix4fv(mvp_loc, 1, True, mvp.astype(np.float32))
        GL.glUniform1f(GL.glGetUniformLocation(self.prog, "point_size"), 2.0)
        pos_loc = GL.glGetAttribLocation(self.prog, "in_pos")
        col_loc = GL.glGetAttribLocation(self.prog, "in_color")
        GL.glEnableVertexAttribArray(pos_loc)
        GL.glEnableVertexAttribArray(col_loc)
        GL.glVertexAttribPointer(pos_loc, 3, GL.GL_FLOAT, False, 0, P)
        GL.glVertexAttribPointer(col_loc, 3, GL.GL_FLOAT, False, 0, C)
        GL.glDrawArrays(GL.GL_POINTS, 0, len(P))
        GL.glDisableVertexAttribArray(pos_loc)
        GL.glDisableVertexAttribArray(col_loc)

    def _draw_lines(self, mvp, segments, color):
        if not segments:
            return
        GL = self.GL
        P = np.asarray(segments, np.float32).reshape(-1, 3)
        C = np.tile(np.asarray(color, np.float32), (len(P), 1))
        GL.glUseProgram(self.prog)
        GL.glUniformMatrix4fv(GL.glGetUniformLocation(self.prog, "mvp"), 1,
                              True, mvp.astype(np.float32))
        pos_loc = GL.glGetAttribLocation(self.prog, "in_pos")
        col_loc = GL.glGetAttribLocation(self.prog, "in_color")
        GL.glEnableVertexAttribArray(pos_loc)
        GL.glEnableVertexAttribArray(col_loc)
        GL.glVertexAttribPointer(pos_loc, 3, GL.GL_FLOAT, False, 0, P)
        GL.glVertexAttribPointer(col_loc, 3, GL.GL_FLOAT, False, 0, C)
        GL.glDrawArrays(GL.GL_LINES, 0, len(P))
        GL.glDisableVertexAttribArray(pos_loc)
        GL.glDisableVertexAttribArray(col_loc)

    # -- main loop ---------------------------------------------------------

    def run(self):
        try:
            self._init_gl()
        except Exception as e:
            print(f"[viewer] disabled ({e}); use viz/render.py snapshots")
            return
        GL, glfw = self.GL, self.glfw
        while not (glfw.window_should_close(self.win)
                   or self.should_close.is_set()):
            self._refresh_dirty()
            with self.keyframes.lock:
                n = len(self.keyframes)
                traj = np.asarray(self.keyframes.T_WC[:n]) if n else None
            with self.states.lock:
                edges = list(zip(self.states.edges_ii, self.states.edges_jj))
            if traj is not None and len(traj) and self.follow:
                self.center = traj[-1, :3]
            GL.glViewport(0, 0, self.width, self.height)
            GL.glClearColor(0.05, 0.05, 0.08, 1.0)
            GL.glClear(GL.GL_COLOR_BUFFER_BIT | GL.GL_DEPTH_BUFFER_BIT)
            mvp = self._camera_mvp()
            self._draw_points(mvp)
            if traj is not None and len(traj) > 1:
                segs = []
                for a, b in zip(traj[:-1, :3], traj[1:, :3]):
                    segs += [a, b]
                self._draw_lines(mvp, segs, (1.0, 0.3, 0.2))
                fr = []
                for T in traj:
                    c = frustum_corners(T)
                    for a, b in ((0, 1), (0, 2), (0, 3), (0, 4), (1, 2),
                                 (2, 3), (3, 4), (4, 1)):
                        fr += [c[a], c[b]]
                self._draw_lines(mvp, fr, (0.3, 0.8, 1.0))
                eg = []
                for i, j in edges:
                    if i < n and j < n:
                        eg += [traj[i, :3], traj[j, :3]]
                self._draw_lines(mvp, eg, (0.2, 1.0, 0.3))
            glfw.swap_buffers(self.win)
            glfw.poll_events()
            time.sleep(1 / 30)
        glfw.terminate()
