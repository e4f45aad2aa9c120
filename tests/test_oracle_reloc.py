"""Ground-truth relocalization episode on the oracle scene (VERDICT r3 #6).

Forces a tracking break (camera TELEPORT back to the trajectory start) and
pins the full production recovery path — tracking-break detection →
retrieval query → strict ``add_factors`` validation → pose adoption →
global GN solve — against known ground truth, using the REAL components:
``slam.pipeline.relocalization``, ``slam.factor_graph.FactorGraph``,
``slam.retrieval.RetrievalDatabase``, and ``ops.matching.match``. Only the
network is replaced, by exact oracle geometry (the same substitution as the
solver-robustness studies in utils/oracle_scene.py).

Reference path: main.py:28-71 (relocalization), tracker.py:67-70 (break
trigger), global_opt.py:78-79 (strict batch rejection).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mast3r_slam_tpu.ops import lie, matching
from mast3r_slam_tpu.slam.factor_graph import FactorGraph
from mast3r_slam_tpu.slam.frame import Frame, KeyframeBuffer
from mast3r_slam_tpu.slam.pipeline import relocalization
from mast3r_slam_tpu.slam.retrieval import RetrievalDatabase
from mast3r_slam_tpu.utils.oracle_scene import OracleScene

H, W = 48, 64
N = H * W
DESC = 24
FEAT_TOKENS = (H // 16) * (W // 16)  # 12

CFG = {
    "use_calib": False,
    "local_opt": {"pin": 1, "C_conf": 0.0, "Q_conf": 0.0,
                  "min_match_frac": 0.0, "max_iters": 30,
                  "sigma_ray": 0.003, "sigma_dist": 10.0,
                  "delta_norm": 1e-8},
    "matching": {"max_iter": 10, "radius": 2, "dilation_max": 5,
                 "level_step": 2},
    "retrieval": {"k": 3, "min_thresh": 5e-3},
    "reloc": {"min_match_frac": 0.3, "strict": True},
}


def _pose_tx(x, yaw=0.0):
    """Sim(3) pose translating along +x with a small yaw."""
    return np.asarray(
        lie.exp(jnp.asarray([x, 0.0, 0.0, 0.0, yaw, 0.0, 0.0],
                            jnp.float32)))


class OracleWorld:
    """Per-frame oracle observations + a fake model for the factor graph."""

    def __init__(self, seed=0):
        self.scene = OracleScene(seed=seed, desc_dim=DESC)
        self.K = self.scene.intrinsics((H, W))
        self.frames = {}  # fid -> dict(pose, X_cam, hits, D, tokens)

    def observe(self, fid, T_WC):
        X_cam, hits = self.scene.raycast(T_WC, self.K, (H, W))
        D = self.scene.descriptors(hits)
        # retrieval tokens: the scene descriptors at the patch-center pixels
        # (what a real encoder would summarize per 16x16 patch)
        centers = [(r * 16 + 8) * W + (c * 16 + 8)
                   for r in range(H // 16) for c in range(W // 16)]
        tokens = D[centers]
        self.frames[fid] = dict(pose=np.asarray(T_WC), X_cam=X_cam,
                                hits=hits, D=D, tokens=tokens)
        return self.frames[fid]

    def make_frame(self, fid, T_est=None):
        ob = self.frames[fid]
        fr = Frame(frame_id=fid, img=jnp.zeros((H, W, 3)), img_shape=(H, W),
                   img_true_shape=(H, W),
                   uimg=np.zeros((H, W, 3), np.float32))
        fr.X_canon = jnp.asarray(ob["X_cam"])
        fr.C = jnp.ones((N, 1))
        fr.feat = jnp.asarray(ob["tokens"])[None]
        fr.pos = jnp.zeros((1, FEAT_TOKENS, 2), jnp.int32)
        fr.N = 1
        fr.T_WC = jnp.asarray(ob["pose"] if T_est is None else T_est)
        return fr

    def _lookup(self, feat):
        """tokens (P, D) -> frame id (nearest stored token array)."""
        f = np.asarray(feat, np.float32)
        best, best_d = None, np.inf
        for fid, ob in self.frames.items():
            d = float(np.abs(f - ob["tokens"]).sum())
            if d < best_d:
                best, best_d = fid, d
        return best

    # -- the factor graph's model interface --------------------------------
    def match_symmetric(self, feat_i, pos_i, feat_j, pos_j, img_hw,
                        init_i2j=None, init_j2i=None):
        b = feat_i.shape[0]
        Xii, Xji, Xjj, Xij, Dii, Dji, Djj, Dij = ([] for _ in range(8))
        for e in range(b):
            i = self._lookup(feat_i[e])
            j = self._lookup(feat_j[e])
            oi, oj = self.frames[i], self.frames[j]
            Xii.append(oi["X_cam"])
            Xjj.append(oj["X_cam"])
            # cross maps: the other frame's surface seen in this camera
            # (what the cross-decoder head predicts)
            Xji.append(self.scene.world_to_cam(oj["hits"], oi["pose"])
                       .astype(np.float32))
            Xij.append(self.scene.world_to_cam(oi["hits"], oj["pose"])
                       .astype(np.float32))
            Dii.append(oi["D"])
            Djj.append(oj["D"])
            Dji.append(oj["D"])
            Dij.append(oi["D"])
        X11 = jnp.asarray(np.stack(Xii + Xjj)).reshape(2 * b, H, W, 3)
        X21 = jnp.asarray(np.stack(Xji + Xij)).reshape(2 * b, H, W, 3)
        D11 = jnp.asarray(np.stack(Dii + Djj)).reshape(2 * b, H, W, DESC)
        D21 = jnp.asarray(np.stack(Dji + Dij)).reshape(2 * b, H, W, DESC)
        idx, valid = matching.match(
            X11, X21, D11, D21, radius=2, level_step=2)
        Q = jnp.full((b, N, 1), 2.0)
        return (idx[:b], idx[b:], valid[:b], valid[b:], Q, Q, Q, Q)


@pytest.fixture(scope="module")
def episode():
    """6 keyframes walking +x, then a teleport back to the start region."""
    world = OracleWorld(seed=0)
    # corridor long enough that the last keyframe's frustum (half-width
    # ~1.14 at the base depth) shares nothing with the start region — the
    # teleport-back must genuinely break tracking
    kf_x = [0.0, 0.6, 1.2, 1.8, 2.4, 3.0]
    kfs = KeyframeBuffer(H, W, capacity=16, feat_dim=DESC)
    rng = np.random.default_rng(4)
    for i, x in enumerate(kf_x):
        T = _pose_tx(x, yaw=0.02 * i)
        world.observe(i, T)
        # keyframe pose estimates carry small drift (pin=1 keeps kf0 exact)
        # so the reloc's global solve has something real to do
        T_est = None
        if i > 0:
            xi = (rng.normal(size=7) * 0.004).astype(np.float32)
            T_est = np.asarray(lie.compose(lie.exp(jnp.asarray(xi)),
                                           jnp.asarray(T)))
        kfs.append(world.make_frame(i, T_est=T_est))

    db = RetrievalDatabase(CFG, codebook_size=16, nfeat=FEAT_TOKENS,
                           desc_dim=DESC)
    # codebook from scene descriptor samples (the production system would
    # load the pretrained codebook or bootstrap from early keyframes)
    samp_hits = world.frames[0]["hits"][:: N // 64][:64]
    db.set_codebook(world.scene.descriptors(samp_hits)[:16])
    for i in range(len(kf_x)):
        db.update(kfs[i], add_after_query=True, k=0, kf_idx=i)
    return world, kfs, db


def test_teleport_breaks_tracking(episode):
    """The teleport frame genuinely breaks tracking vs the LAST keyframe:
    the matcher's valid fraction falls below the production RELOC trigger
    (tracking.min_match_frac) — the precondition of the reloc episode."""
    world, kfs, _ = episode
    T_tele = _pose_tx(0.05, yaw=0.01)
    ob = world.observe(100, T_tele)
    last = world.frames[5]
    X21 = world.scene.world_to_cam(last["hits"], ob["pose"]).astype(np.float32)
    _, valid = matching.match(
        jnp.asarray(ob["X_cam"]).reshape(1, H, W, 3),
        jnp.asarray(X21).reshape(1, H, W, 3),
        jnp.asarray(ob["D"]).reshape(1, H, W, DESC),
        jnp.asarray(last["D"]).reshape(1, H, W, DESC),
        radius=2, level_step=2)
    frac = float(jnp.mean(valid.astype(jnp.float32)))
    assert frac < 0.05, f"teleport did not break tracking (frac={frac})"


def test_reloc_recovers_pose(episode):
    """RELOC → retrieval → strict add_factors → pose-adopt → global solve
    recovers the teleported camera's ground-truth pose."""
    world, kfs, db = episode
    graph = FactorGraph(world, kfs, CFG)
    T_tele = _pose_tx(0.05, yaw=0.01)
    world.observe(100, T_tele)
    # the lost frame enters reloc with a garbage pose estimate (production:
    # the stale last-tracked pose)
    frame = world.make_frame(100, T_est=np.asarray(_pose_tx(1.5)))

    n_before = len(kfs)
    ok = relocalization(frame, kfs, graph, db, CFG)
    assert ok, "relocalization failed on a genuine revisit"
    assert len(kfs) == n_before + 1
    assert graph.n_edges() >= 1

    T_rec = np.asarray(kfs.T_WC[len(kfs) - 1])
    t_err = float(np.linalg.norm(T_rec[:3] - T_tele[:3]))
    q_err = float(min(np.linalg.norm(T_rec[3:7] - T_tele[3:7]),
                      np.linalg.norm(T_rec[3:7] + T_tele[3:7])))
    s_err = abs(float(T_rec[7]) - 1.0)
    assert t_err < 0.05, f"translation error {t_err:.4f}"
    assert q_err < 0.05, f"quaternion error {q_err:.4f}"
    # Sim(3) scale is the softest direction under the production weighting
    # (ray residuals are scale-invariant; the dist channel is whitened by
    # sigma_dist=10 — reference config/base.yaml:26): the reloc solve leaves
    # ~7% scale residue here, corrected by subsequent tracking + global BA
    # in a live run. Pin it stays bounded.
    assert s_err < 0.12, f"scale error {s_err:.4f}"


class _ForcedRetrieval:
    """Retrieval stand-in that always proposes candidates — isolates the
    STRICT geometric validation as the rejection mechanism under test."""

    def update(self, frame, add_after_query, k, min_thresh=0.0,
               kf_idx=None, skip_query=False):
        return [] if skip_query else [0, 1]


def test_reloc_strict_rejects_impostor(episode):
    """A frame observing an UNSEEN region, with retrieval FORCED to propose
    candidates, must be rejected by the strict factor check and rolled back
    (reference global_opt.py:78-79 + main.py:41-64 pop_last)."""
    world, kfs, _ = episode
    graph = FactorGraph(world, kfs, CFG)
    # far outside the mapped corridor: no genuine view overlap with kf 0/1
    T_far = _pose_tx(8.0)
    world.observe(200, T_far)
    frame = world.make_frame(200)

    n_before = len(kfs)
    n_edges_before = graph.n_edges()
    ok = relocalization(frame, kfs, graph, _ForcedRetrieval(), CFG)
    assert not ok, "strict reloc accepted a geometrically impossible frame"
    assert len(kfs) == n_before, "tentative keyframe not rolled back"
    assert graph.n_edges() == n_edges_before
