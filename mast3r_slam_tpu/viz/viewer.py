"""OpenGL viewer (interactive glfw window OR headless EGL), run as a thread.

Counterpart of the reference visualization process (reference:
mast3r_slam/visualization.py:383-445 + thirdparty/in3d): keyframe map
rendering with two pipelines — confidence-thresholded point splats and
normal-oriented SURFEL disks built in a geometry shader (capability parity
with reference resources/programs/surfelmap.glsl: per-point quads spanned by
the surface tangent frame, round-disk fragment discard, Lambert-shaded) —
plus trajectory polyline, camera frustums, factor-graph edges, orbit/zoom
camera, and keyboard controls that message state back to the main loop
(pause, conf threshold, follow-cam, point/surfel switch — the reference's
imgui sliders/buttons, visualization.py:324-332, map to keys; imgui is not
available in this environment).

Keyframe uploads are incremental via the ring's ``is_dirty`` flags
(reference visualization.py:131-151). Surfel normals come from the pointmap
grid (cross of the image-axis tangents), computed once per dirty keyframe on
the host.

Runs in a thread of the single controller process instead of a separate
``mp.Process`` — host threads are free while device compute is dispatched
asynchronously. Without a display it automatically renders into a
surfaceless-EGL framebuffer (viz/glctx.py) — same GL code path, exercised
by tests/test_viewer_gl.py.
"""

from __future__ import annotations

import ctypes
import threading
import time

import numpy as np

from mast3r_slam_tpu.ops import lie
from mast3r_slam_tpu.viz.glctx import create_context
from mast3r_slam_tpu.viz.render import frustum_corners

_VS = """
#version 330
in vec3 in_pos;
in vec3 in_color;
uniform mat4 mvp;
uniform float point_size;
out vec3 v_color;
void main() {
    gl_Position = mvp * vec4(in_pos, 1.0);
    gl_PointSize = point_size;
    v_color = in_color;
}
"""

_FS = """
#version 330
in vec3 v_color;
out vec4 frag;
void main() { frag = vec4(v_color, 1.0); }
"""

# Surfel pipeline: points + per-point normals in, screen-facing disks out.
_SURFEL_VS = """
#version 330
in vec3 in_pos;
in vec3 in_normal;
in vec3 in_color;
out vec3 g_normal;
out vec3 g_color;
void main() {
    gl_Position = vec4(in_pos, 1.0);
    g_normal = in_normal;
    g_color = in_color;
}
"""

_SURFEL_GS = """
#version 330
layout(points) in;
layout(triangle_strip, max_vertices = 4) out;
uniform mat4 mvp;
uniform float radius;
in vec3 g_normal[];
in vec3 g_color[];
out vec3 f_color;
out vec2 f_uv;
out vec3 f_normal;
void main() {
    vec3 p = gl_in[0].gl_Position.xyz;
    vec3 n = normalize(g_normal[0]);
    // tangent frame of the surfel plane (guard the degenerate up case)
    vec3 up = abs(n.y) > 0.93 ? vec3(1.0, 0.0, 0.0) : vec3(0.0, -1.0, 0.0);
    vec3 t = normalize(cross(n, up));
    vec3 b = cross(n, t);
    vec2 corners[4] = vec2[4](vec2(-1.0, -1.0), vec2(1.0, -1.0),
                              vec2(-1.0, 1.0), vec2(1.0, 1.0));
    for (int i = 0; i < 4; ++i) {
        vec3 q = p + (corners[i].x * t + corners[i].y * b) * radius;
        gl_Position = mvp * vec4(q, 1.0);
        f_color = g_color[0];
        f_uv = corners[i];
        f_normal = n;
        EmitVertex();
    }
    EndPrimitive();
}
"""

_SURFEL_FS = """
#version 330
in vec3 f_color;
in vec2 f_uv;
in vec3 f_normal;
uniform vec3 light_dir;
out vec4 frag;
void main() {
    if (dot(f_uv, f_uv) > 1.0) discard;   // round disk
    float lambert = 0.35 + 0.65 * abs(dot(normalize(f_normal),
                                          normalize(light_dir)));
    frag = vec4(f_color * lambert, 1.0);
}
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


def _grid_normals(X, h, w):
    """Per-point normals from the pointmap grid: normalize(cross(down, right))
    (reference surfelmap.glsl geometry stage)."""
    P = X.reshape(h, w, 3)
    right = np.roll(P, -1, axis=1) - P
    down = np.roll(P, -1, axis=0) - P
    n = np.cross(down, right)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.clip(norm, 1e-12, None)
    # wrap columns/rows reuse their neighbor's normal
    n[:, -1] = n[:, -2]
    n[-1, :] = n[-2, :]
    return n.reshape(-1, 3).astype(np.float32)


def _compile_program(GL, *stages):
    prog = GL.glCreateProgram()
    for kind, src in stages:
        sh = GL.glCreateShader(kind)
        GL.glShaderSource(sh, src)
        GL.glCompileShader(sh)
        if not GL.glGetShaderiv(sh, GL.GL_COMPILE_STATUS):
            raise RuntimeError(GL.glGetShaderInfoLog(sh).decode())
        GL.glAttachShader(prog, sh)
    GL.glLinkProgram(prog)
    if not GL.glGetProgramiv(prog, GL.GL_LINK_STATUS):
        raise RuntimeError(GL.glGetProgramInfoLog(prog).decode())
    return prog


class Viewer(threading.Thread):
    def __init__(self, keyframes, states, cfg, width=1280, height=720,
                 headless=None):
        super().__init__(daemon=True, name="viewer")
        self.keyframes = keyframes
        self.states = states
        self.cfg = cfg
        self.width, self.height = width, height
        self.headless = headless
        self.conf_threshold = 0.0
        self.follow = False
        self.surfel_mode = bool(cfg.get("viz", {}).get("surfels", True)) \
            if isinstance(cfg, dict) else True
        self.surfel_radius = 0.01
        self.should_close = threading.Event()
        # control overlay (the reference's imgui panel; viz/ui.py)
        from mast3r_slam_tpu.viz.ui import build_default_overlay

        self.overlay = build_default_overlay(self)
        self.show_ui = bool(cfg.get("viz", {}).get("ui", True)) \
            if isinstance(cfg, dict) else True
        # orbit camera state
        self.yaw, self.pitch, self.dist = 0.0, -0.4, 4.0
        self.center = np.zeros(3, np.float32)
        self._drag = None
        self._kf_points: dict[int, tuple] = {}

    # -- GL plumbing ---------------------------------------------------------

    def init_gl(self):
        # context first: the EGL backend must pick PyOpenGL's platform
        # BEFORE the first ``import OpenGL`` in this process
        self.ctx = create_context(self.width, self.height,
                                  headless=self.headless)
        from OpenGL import GL
        self.ctx.set_callbacks(scroll=self._on_scroll, cursor=self._on_cursor,
                               button=self._on_button, key=self._on_key)
        self.prog = _compile_program(
            GL, (GL.GL_VERTEX_SHADER, _VS), (GL.GL_FRAGMENT_SHADER, _FS))
        self.prog_surfel = _compile_program(
            GL, (GL.GL_VERTEX_SHADER, _SURFEL_VS),
            (GL.GL_GEOMETRY_SHADER, _SURFEL_GS),
            (GL.GL_FRAGMENT_SHADER, _SURFEL_FS))
        self.vao = GL.glGenVertexArrays(1)
        GL.glBindVertexArray(self.vao)
        # one dynamic VBO per attribute slot (core-profile VAOs reject
        # client-side array pointers)
        self._vbos = GL.glGenBuffers(4)
        GL.glEnable(GL.GL_DEPTH_TEST)
        GL.glEnable(GL.GL_VERTEX_PROGRAM_POINT_SIZE)
        self.GL = GL

    # -- input callbacks -----------------------------------------------------

    def _on_scroll(self, win, dx, dy):
        self.dist *= 0.9 ** dy

    def _on_button(self, win, button, action, mods):
        if action == 0:
            self.overlay.handle_release()
            self._drag = None
            return
        x, y = self.ctx.glfw.get_cursor_pos(win)
        # the overlay consumes clicks inside the panel (reference imgui
        # capture semantics); everything else starts a camera drag
        if self.show_ui and self.overlay.handle_press(x, y):
            return
        self._drag = (x, y)

    def _on_cursor(self, win, x, y):
        if self.show_ui and self.overlay.handle_drag(x, y):
            return
        if self._drag is not None:
            x0, y0 = self._drag
            self.yaw += (x - x0) * 0.005
            self.pitch = np.clip(self.pitch + (y - y0) * 0.005, -1.5, 1.5)
            self._drag = (x, y)

    def _on_key(self, win, key, sc, action, mods):
        if action != 1:
            return
        g = self.ctx.glfw
        if key == g.KEY_SPACE:
            with self.states.lock:
                self.states.paused = not self.states.paused
        elif key == g.KEY_F:
            self.follow = not self.follow
        elif key == g.KEY_M:
            self.surfel_mode = not self.surfel_mode
        elif key == g.KEY_LEFT_BRACKET:
            self.surfel_radius = max(1e-4, self.surfel_radius * 0.8)
        elif key == g.KEY_RIGHT_BRACKET:
            self.surfel_radius *= 1.25
        elif key in (g.KEY_UP, g.KEY_EQUAL):
            self.conf_threshold += 0.25
        elif key in (g.KEY_DOWN, g.KEY_MINUS):
            self.conf_threshold = max(0.0, self.conf_threshold - 0.25)
        elif key in (g.KEY_ESCAPE, g.KEY_Q):
            self.should_close.set()

    # -- data upload ---------------------------------------------------------

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
                nrm = _grid_normals(X, kf.h, kf.w)
                self._kf_points[i] = (X, C / n, col, T, nrm)

    def _camera_mvp(self):
        cy, sy = np.cos(self.yaw), np.sin(self.yaw)
        cp, sp = np.cos(self.pitch), np.sin(self.pitch)
        eye = self.center + self.dist * np.array(
            [sy * cp, sp, -cy * cp], np.float32
        )
        f = self.center - eye
        f /= np.linalg.norm(f) + 1e-9
        up = np.array([0, -1, 0], np.float32)
        s = np.cross(f, up)
        s /= np.linalg.norm(s) + 1e-9
        u = np.cross(s, f)
        # standard lookAt: camera forward maps to -z (GL clip space needs
        # w_clip = -z_view > 0 for visible geometry)
        view = np.eye(4, dtype=np.float32)
        view[:3, :3] = np.stack([s, u, -f])
        view[:3, 3] = -view[:3, :3] @ eye
        proj = _perspective(60, self.width / self.height, 0.01, 1000.0)
        return proj @ view

    def _gather_map(self):
        """Concatenate confidence-passing world-frame points of all KFs."""
        pts, cols, nrms = [], [], []
        for i, (X, Cavg, col, T, nrm) in self._kf_points.items():
            keep = Cavg > self.conf_threshold
            Xw = np.asarray(lie.act(T[None], X))[keep]
            ok = np.isfinite(Xw).all(1) & (np.abs(Xw) < 1e4).all(1)
            pts.append(Xw[ok].astype(np.float32))
            cols.append(col[keep][ok])
            R = np.asarray(
                lie.quat_to_matrix(lie.quaternion(np.asarray(T))))
            nrms.append((nrm[keep][ok] @ R.T).astype(np.float32))
        if not pts:
            return None
        return (np.concatenate(pts), np.concatenate(cols),
                np.concatenate(nrms))

    _bind_slot = 0

    def _bind_attr(self, prog, name, arr, comps=3):
        GL = self.GL
        arr = np.ascontiguousarray(arr, np.float32)
        vbo = self._vbos[self._bind_slot % len(self._vbos)]
        self._bind_slot += 1
        GL.glBindBuffer(GL.GL_ARRAY_BUFFER, vbo)
        GL.glBufferData(GL.GL_ARRAY_BUFFER, arr.nbytes, arr,
                        GL.GL_DYNAMIC_DRAW)
        loc = GL.glGetAttribLocation(prog, name)
        GL.glEnableVertexAttribArray(loc)
        GL.glVertexAttribPointer(loc, comps, GL.GL_FLOAT, False, 0,
                                 ctypes.c_void_p(0))
        GL.glBindBuffer(GL.GL_ARRAY_BUFFER, 0)
        return loc

    def _draw_points(self, mvp, P, C):
        GL = self.GL
        GL.glUseProgram(self.prog)
        GL.glUniformMatrix4fv(GL.glGetUniformLocation(self.prog, "mvp"), 1,
                              True, mvp.astype(np.float32))
        GL.glUniform1f(GL.glGetUniformLocation(self.prog, "point_size"), 2.0)
        locs = [self._bind_attr(self.prog, "in_pos", P),
                self._bind_attr(self.prog, "in_color", C)]
        GL.glDrawArrays(GL.GL_POINTS, 0, len(P))
        for loc in locs:
            GL.glDisableVertexAttribArray(loc)

    def _draw_surfels(self, mvp, P, C, N):
        GL = self.GL
        GL.glUseProgram(self.prog_surfel)
        GL.glUniformMatrix4fv(
            GL.glGetUniformLocation(self.prog_surfel, "mvp"), 1, True,
            mvp.astype(np.float32))
        GL.glUniform1f(GL.glGetUniformLocation(self.prog_surfel, "radius"),
                       self.surfel_radius)
        GL.glUniform3f(GL.glGetUniformLocation(self.prog_surfel, "light_dir"),
                       0.3, 0.5, 1.0)
        locs = [self._bind_attr(self.prog_surfel, "in_pos", P),
                self._bind_attr(self.prog_surfel, "in_color", C),
                self._bind_attr(self.prog_surfel, "in_normal", N)]
        GL.glDrawArrays(GL.GL_POINTS, 0, len(P))
        for loc in locs:
            GL.glDisableVertexAttribArray(loc)

    def _draw_lines(self, mvp, segments, color):
        if not segments:
            return
        GL = self.GL
        P = np.asarray(segments, np.float32).reshape(-1, 3)
        C = np.tile(np.asarray(color, np.float32), (len(P), 1))
        GL.glUseProgram(self.prog)
        GL.glUniformMatrix4fv(GL.glGetUniformLocation(self.prog, "mvp"), 1,
                              True, mvp.astype(np.float32))
        locs = [self._bind_attr(self.prog, "in_pos", P),
                self._bind_attr(self.prog, "in_color", C)]
        GL.glDrawArrays(GL.GL_LINES, 0, len(P))
        for loc in locs:
            GL.glDisableVertexAttribArray(loc)

    # -- frame ---------------------------------------------------------------

    def render_frame(self):
        """One full render pass (also the unit-testable entry point)."""
        GL = self.GL
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
        m = self._gather_map()
        if m is not None:
            P, C, N = m
            if self.surfel_mode:
                self._draw_surfels(mvp, P, C, N)
            else:
                self._draw_points(mvp, P, C)
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
        if self.show_ui:
            self._draw_overlay()
        self.ctx.swap()

    def _draw_overlay(self):
        """Screen-space control panel (positions already in NDC)."""
        GL = self.GL
        P, C = self.overlay.triangles(self.width, self.height)
        GL.glDisable(GL.GL_DEPTH_TEST)
        GL.glUseProgram(self.prog)
        GL.glUniformMatrix4fv(GL.glGetUniformLocation(self.prog, "mvp"), 1,
                              True, np.eye(4, dtype=np.float32))
        locs = [self._bind_attr(self.prog, "in_pos", P),
                self._bind_attr(self.prog, "in_color", C)]
        GL.glDrawArrays(GL.GL_TRIANGLES, 0, len(P))
        for loc in locs:
            GL.glDisableVertexAttribArray(loc)
        GL.glEnable(GL.GL_DEPTH_TEST)

    # -- main loop -----------------------------------------------------------

    def run(self):
        try:
            self.init_gl()
        except Exception as e:
            print(f"[viewer] disabled ({e}); use viz/render.py snapshots")
            return
        while not (self.ctx.should_close() or self.should_close.is_set()):
            self.render_frame()
            time.sleep(1 / 30)
        self.ctx.destroy()
