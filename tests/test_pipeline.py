"""Backend pipeline tests with a stub model: factor growth, BA, reloc flow."""

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.ops import lie
from mast3r_slam_tpu.slam.factor_graph import FactorGraph
from mast3r_slam_tpu.slam.frame import Frame, KeyframeBuffer, Mode, States
from mast3r_slam_tpu.slam.pipeline import Backend

RNG = np.random.default_rng(13)

H, W = 32, 48
N = H * W

CFG = {
    "use_calib": False,
    "local_opt": {"pin": 1, "C_conf": 0.0, "Q_conf": 0.0,
                  "min_match_frac": 0.0, "max_iters": 3, "sigma_ray": 0.003,
                  "sigma_dist": 0.1, "delta_norm": 1e-8,
                  "pixel_border": -10, "depth_eps": 1e-6,
                  "sigma_pixel": 1.0, "sigma_depth": 10.0},
    "retrieval": {"k": 2, "min_thresh": 0.0},
    "reloc": {"min_match_frac": 0.0, "strict": True},
}


class StubModel:
    """Identity-correspondence stand-in for MASt3RInference."""

    def match_symmetric(self, feat_i, pos_i, feat_j, pos_j, img_hw,
                        init_i2j=None, init_j2i=None):
        b = feat_i.shape[0]
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (b, N))
        valid = jnp.ones((b, N, 1), bool)
        Q = jnp.full((b, N, 1), 4.0)
        return idx, idx, valid, valid, Q, Q, Q, Q


class StubRetrieval:
    def __init__(self):
        self.added = 0

    def update(self, frame, add_after_query, k, min_thresh=0.0, kf_idx=None):
        hits = [0] if self.added > 1 else []
        if add_after_query:
            self.added += 1
        return hits


def make_keyframes(n_kf=3, noise=0.0):
    kfs = KeyframeBuffer(H, W, capacity=8, feat_dim=8)
    X_shared = (RNG.random((N, 3)) + [0, 0, 2.0]).astype(np.float32)
    for i in range(n_kf):
        fr = Frame(frame_id=i, img=jnp.zeros((H, W, 3)), img_shape=(H, W),
                   img_true_shape=(H, W),
                   uimg=np.zeros((H, W, 3), np.float32))
        T_true = lie.exp(jnp.asarray([0.05 * i, 0, 0, 0, 0.02 * i, 0, 0.0]))
        # all keyframes observe the SAME world points, stored in cam frame
        Xw = jnp.asarray(X_shared)
        fr.X_canon = lie.act(lie.inv(T_true)[None], Xw)
        fr.C = jnp.ones((N, 1))
        fr.feat = jnp.zeros((1, kfs.num_patches, 8))
        fr.pos = jnp.zeros((1, kfs.num_patches, 2), jnp.int32)
        fr.N = 1
        # start poses perturbed (except kf0, pinned)
        xi = np.zeros(7, np.float32)
        if i > 0 and noise > 0:
            xi = (RNG.normal(size=7) * noise).astype(np.float32)
        fr.T_WC = lie.compose(lie.exp(jnp.asarray(xi)), T_true)
        kfs.append(fr)
    return kfs


def test_backend_step_adds_edges_and_solves():
    kfs = make_keyframes(3, noise=0.02)
    states = States()
    states.set_mode(Mode.TRACKING)
    graph = FactorGraph(StubModel(), kfs, CFG)
    backend = Backend(StubModel(), kfs, states, graph, StubRetrieval(), CFG)

    T_before = np.asarray(kfs.T_WC[:3]).copy()
    for idx in (1, 2):
        states.queue_global_optimization(idx)
    assert backend.step()  # processes kf 1
    assert backend.step()  # processes kf 2
    assert graph.n_edges() >= 2
    assert not backend.step()  # queue drained
    T_after = np.asarray(kfs.T_WC[:3])
    # pinned pose unchanged, others moved by the solve
    np.testing.assert_allclose(T_after[0], T_before[0], atol=1e-7)
    assert np.abs(T_after[1:] - T_before[1:]).max() > 1e-5
    # versions bumped for moved keyframes
    assert kfs.version[1] > 0 and kfs.version[2] > 0
    assert states.edges_ii  # published for viz


def test_global_ba_reduces_pose_error():
    kfs = make_keyframes(3, noise=0.03)
    graph = FactorGraph(StubModel(), kfs, CFG)
    graph.add_factors([0, 1], [1, 2], 0.0)

    def pose_err():
        err = 0.0
        for i in range(3):
            T_true = lie.exp(jnp.asarray([0.05 * i, 0, 0, 0, 0.02 * i, 0, 0.0]))
            d = lie.log(lie.compose(lie.inv(kfs.T_WC[i]), T_true))
            err += float(jnp.linalg.norm(d))
        return err

    e0 = pose_err()
    graph.solve_GN_rays()
    e1 = pose_err()
    assert e1 < e0 * 0.5, f"BA did not reduce pose error: {e0} -> {e1}"


def test_reloc_failure_rolls_back():
    from mast3r_slam_tpu.slam.pipeline import relocalization

    kfs = make_keyframes(3)
    graph = FactorGraph(StubModel(), kfs, CFG)

    class NoRetrieval:
        def update(self, *a, **k):
            return []

    fr = kfs[1]
    n0 = len(kfs)
    ok = relocalization(fr, kfs, graph, NoRetrieval(), CFG)
    assert not ok
    assert len(kfs) == n0  # tentative keyframe rolled back


def test_global_ba_calib_reduces_pose_error():
    """Calibrated BA on a pixel-consistent synthetic world.

    The calib solver assumes per-pixel points lie on their own pixel rays
    (constrain_points_to_ray) — so the fixture renders a fronto-parallel
    plane at depth 2 seen by x-translated cameras, with TRUE pixel
    correspondences (a constant 3 px disparity per baseline step).
    """
    from mast3r_slam_tpu.ops import geometry

    fx = 60.0
    K = jnp.asarray([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
    uv = geometry.get_pixel_coords((H, W))
    X_plane = np.asarray(geometry.backproject(uv, jnp.full((N, 1), 2.0), K))

    tx = [0.0, 0.1, 0.2]  # camera x-translations (world)
    kfs = KeyframeBuffer(H, W, capacity=8, feat_dim=8)
    for i, t in enumerate(tx):
        fr = Frame(frame_id=i, img=jnp.zeros((H, W, 3)), img_shape=(H, W),
                   img_true_shape=(H, W),
                   uimg=np.zeros((H, W, 3), np.float32))
        fr.X_canon = jnp.asarray(X_plane)  # plane is fronto-parallel: same map
        fr.C = jnp.ones((N, 1))
        fr.feat = jnp.zeros((1, kfs.num_patches, 8))
        fr.pos = jnp.zeros((1, kfs.num_patches, 2), jnp.int32)
        fr.N = 1
        # perturbed initial pose (kf0 pinned at truth)
        xi = np.zeros(7, np.float32)
        if i > 0:
            xi = (RNG.normal(size=7) * 0.01).astype(np.float32)
        T_true = jnp.asarray([t, 0, 0, 0, 0, 0, 1, 1], jnp.float32)
        fr.T_WC = lie.compose(lie.exp(jnp.asarray(xi)), T_true)
        kfs.append(fr)
    kfs.set_intrinsics(K)

    cfg = dict(CFG)
    cfg["use_calib"] = True
    graph = FactorGraph(StubModel(), kfs, cfg, K=K)
    # true correspondences: pixel (u, v) of kf j ↔ (u + disparity, v) of kf i
    uu = np.arange(W)
    vv = np.arange(H)
    U, V = np.meshgrid(uu, vv, indexing="xy")
    edges = [(0, 1), (1, 2)]
    ii, jj, idxs, valids = [], [], [], []
    for i, j in edges:
        disp = int(round(fx * (tx[j] - tx[i]) / 2.0))
        u_i = U + disp
        valid = (u_i >= 0) & (u_i < W)
        idx = np.clip(u_i, 0, W - 1) + W * V
        ii.append(i)
        jj.append(j)
        idxs.append(idx.reshape(-1))
        valids.append(valid.reshape(-1))
    graph.ii = np.asarray(ii, np.int32)
    graph.jj = np.asarray(jj, np.int32)
    graph.idx_ii2jj = jnp.asarray(np.stack(idxs), jnp.int32)
    graph.valid_match_j = jnp.asarray(np.stack(valids))[..., None]
    # reverse direction: disparity negates
    idxs_r, valids_r = [], []
    for i, j in edges:
        disp = int(round(fx * (tx[i] - tx[j]) / 2.0))
        u_j = U + disp
        valid = (u_j >= 0) & (u_j < W)
        idxs_r.append((np.clip(u_j, 0, W - 1) + W * V).reshape(-1))
        valids_r.append(valid.reshape(-1))
    graph.idx_jj2ii = jnp.asarray(np.stack(idxs_r), jnp.int32)
    graph.valid_match_i = jnp.asarray(np.stack(valids_r))[..., None]
    graph.Q_ii2jj = jnp.full((2, N, 1), 4.0)
    graph.Q_jj2ii = jnp.full((2, N, 1), 4.0)

    def pose_err():
        err = 0.0
        for i, t in enumerate(tx):
            T_true = jnp.asarray([t, 0, 0, 0, 0, 0, 1, 1], jnp.float32)
            d = lie.log(lie.compose(lie.inv(kfs.T_WC[i]), T_true))
            err += float(jnp.linalg.norm(d))
        return err

    e0 = pose_err()
    graph.solve_GN_calib()
    e1 = pose_err()
    assert e1 < e0 * 0.5, f"calib BA did not reduce pose error: {e0} -> {e1}"


def test_add_factors_accepts_consecutive_edge_hint():
    """The backend warm-start hint path: add_factors with init_hint still
    builds the edge (the hint only seeds the matcher's LM init)."""
    kfs = make_keyframes(3, noise=0.02)
    graph = FactorGraph(StubModel(), kfs, CFG)
    n = kfs.h * kfs.w
    hint = (1, 2, np.arange(n, dtype=np.int32))
    assert graph.add_factors([1], [2], 0.0, init_hint=hint)
    assert graph.n_edges() == 1


def test_reloc_success_clears_all_queued_counts():
    """Multiple queued reloc attempts for one lost-tracking episode are all
    resolved by ONE success — a leaked count kept Backend.idle() false
    forever and would fire a spurious relocalization on the next failure."""
    from mast3r_slam_tpu.slam.frame import Mode, States
    from mast3r_slam_tpu.slam.pipeline import Backend

    kfs = make_keyframes(3)
    graph = FactorGraph(StubModel(), kfs, CFG)

    class HitRetrieval:
        def update(self, *a, **k):
            return [0]

    states = States()
    states.set_mode(Mode.RELOC)
    fr = kfs[1]
    fr.frame_id = 99
    states.set_frame(fr)
    states.queue_reloc()
    states.queue_reloc()  # a second frame queued while the backend was busy
    backend = Backend(StubModel(), kfs, states, graph, HitRetrieval(), CFG)
    assert backend.step()          # succeeds (strict reloc, stub matches)
    assert states.get_mode() == Mode.TRACKING
    assert states.reloc_sem == 0, "stale reloc count leaked"
    assert backend.idle()


def test_tracker_warm_start_reset_on_foreign_keyframe(monkeypatch):
    """A reloc-appended keyframe changes the tracking target: the tracker
    must drop its cross-frame matcher warm start (converged against a
    DIFFERENT keyframe) instead of seeding with it. Exercises the REAL
    guard inside FrameTracker.track via a stubbed track_core that captures
    the idx_init actually passed to the device program."""
    from types import SimpleNamespace

    from mast3r_slam_tpu.slam import tracker as TR

    kfs = make_keyframes(2)
    captured = {}

    def fake_track_core(params, mcfg, img, feat_k, pos_k, idx_init, *a, **kw):
        captured["idx_init"] = np.asarray(idx_init)
        # match_frac below min_match_frac → track() exits right after the
        # host-side bookkeeping; only these keys are read before that
        return {
            "idx_f2k": jnp.zeros((1, N), jnp.int32),
            "feat_f": jnp.zeros((1, N, 8)),
            "pos_f": jnp.zeros((1, N, 2), jnp.int32),
            "X_frame": jnp.zeros((N, 3)),
            "C_frame": jnp.zeros((N, 1)),
            "match_frac": jnp.asarray(0.0),
        }

    monkeypatch.setattr(TR, "track_core", fake_track_core)

    tr = TR.FrameTracker.__new__(TR.FrameTracker)
    tr.keyframes = kfs
    tr.cfg = dict(CFG["local_opt"], min_match_frac=0.5, huber=1.345,
                  rel_error=1e-3, match_frac_thresh=0.333,
                  filtering_mode="weighted_pointmap",
                  filtering_score="median")
    tr.model = SimpleNamespace(params={}, cfg=None,
                               match_cfg=CFG.get("matching", {}))
    tr.quality_service = None
    tr.use_calib = False
    tr.match_cfg = CFG.get("matching", {})
    # warm start converged against keyframe 0; current target is keyframe 1
    tr.idx_f2k = jnp.full((1, N), 7, jnp.int32)
    tr._warm_kf_idx = 0

    frame = Frame(frame_id=9, img=jnp.zeros((H, W, 3)), img_shape=(H, W),
                  img_true_shape=(H, W), uimg=np.zeros((H, W, 3), np.float32))
    frame.T_WC = lie.identity()
    tr.track(frame)

    # the guard must have dropped the foreign warm start: the device
    # program received the identity init, not the poisoned one
    assert (captured["idx_init"] == np.arange(N)).all()
