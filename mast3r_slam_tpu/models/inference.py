"""High-level MASt3R inference APIs used by the SLAM layers.

Functional equivalent of the reference wrapper layer (reference:
mast3r_slam/mast3r_utils.py): mono / asymmetric / symmetric inference and the
match entry points. One deliberate TPU redesign: the reference decodes
symmetric keyframe pairs in a Python loop one pair at a time
(mast3r_utils.py:83-115); here both directions of all B pairs run as a single
batched decoder call of batch 2B, which keeps the MXU busy and is the unit
that shards across chips (see parallel/sharding.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.models import mast3r as M
from mast3r_slam_tpu.ops import matching


def _decimate(a, ds, h_axis=1):
    """Strided spatial decimation of image-shaped head outputs — the
    reference's working-resolution ``downsample`` (mast3r_utils.py:43-52).
    ``h_axis`` is the H axis; W is the next axis (works for both
    channel-full ``(…,H,W,F)`` and channel-less ``(…,H,W)`` layouts)."""
    if ds <= 1:
        return a
    idx = [slice(None)] * a.ndim
    idx[h_axis] = slice(None, None, ds)
    idx[h_axis + 1] = slice(None, None, ds)
    return a[tuple(idx)]


class MASt3RInference:
    """Holds params + config and exposes SLAM-facing inference methods.

    With ``mesh`` set (a 1-D ``jax.sharding.Mesh``), symmetric pair-decode
    batches are sharded over the mesh's edge axis — each chip decodes a slice
    of the keyframe-pair batch (params replicated), which is how the backend
    scales across a TPU slice.
    """

    def __init__(self, params, cfg: M.MASt3RConfig, match_cfg: dict | None = None,
                 mesh=None, downsample: int = 1):
        self.params = params
        self.cfg = cfg
        self.match_cfg = match_cfg or {}
        self.mesh = mesh
        # ``dataset.img_downsample``: decimate the WORKING pointmaps /
        # descriptors emitted by every inference path by this stride, as the
        # reference does after each decode (mast3r_utils.py:43-52 downsample,
        # applied at :78/:114/:134/:205) — the model still runs at full
        # crop resolution; only the SLAM-side per-pixel state shrinks.
        self.ds = int(downsample)
        # Separate replicated copy for the backend sub-mesh: the frontend
        # params stay uncommitted so per-frame programs keep running on the
        # (disjoint) frontend device — committing the ONE copy to the mesh
        # would drag every tracking program onto the backend chips.
        self.params_mesh = None
        if mesh is not None:
            from mast3r_slam_tpu.parallel import sharding as S

            self.params_mesh = S.replicate(params, mesh)

    # -- encoding ----------------------------------------------------------

    def encode_frame(self, frame):
        """Populate ``frame.feat`` / ``frame.pos`` (cached across calls)."""
        if frame.feat is None:
            feat, pos = M.encode(self.params, self.cfg, frame.img[None])
            frame.feat = feat
            frame.pos = pos
        return frame.feat, frame.pos

    # -- inference ---------------------------------------------------------

    def inference_mono(self, frame):
        """Self-pair decode → flattened (Xii (1, N, 3), Cii (1, N, 1)).

        One fused program (encode + self-decode + head); also populates
        ``frame.feat``/``frame.pos``.
        """
        feat, pos, X, C = _mono_core(
            self.params, self.cfg, frame.img[None], frame.img_true_shape,
            self.ds,
        )
        frame.feat = feat
        frame.pos = pos
        return X, C

    def asymmetric_inference(self, frame_i, frame_j):
        """One decode pass i↔j. Returns stacked (X, C, D, Q) with leading dim 2:
        index 0 = view i in frame i ("ii"), index 1 = view j in frame i ("ji")."""
        feat_i, pos_i = self.encode_frame(frame_i)
        feat_j, pos_j = self.encode_frame(frame_j)
        res_ii, res_ji = M.decode_heads(
            self.params, self.cfg, feat_i, pos_i, feat_j, pos_j,
            frame_i.img_true_shape,
        )
        X = jnp.concatenate([res_ii["pts3d"], res_ji["pts3d"]], axis=0)
        C = jnp.concatenate([res_ii["conf"], res_ji["conf"]], axis=0)
        D = jnp.concatenate([res_ii["desc"], res_ji["desc"]], axis=0)
        Q = jnp.concatenate([res_ii["desc_conf"], res_ji["desc_conf"]], axis=0)
        return tuple(_decimate(a, self.ds, h_axis=1) for a in (X, C, D, Q))

    def decode_symmetric_batch(self, feat_i, pos_i, feat_j, pos_j, img_hw):
        """Both decode directions of B pairs in ONE batched call.

        Returns (X, C, D, Q) each with leading dim 4 over [ii, ji, jj, ij]
        and second dim B (matching the reference's output convention).
        """
        params = self.params
        B = feat_i.shape[0]
        if self.mesh is not None:
            import numpy as _np

            from mast3r_slam_tpu.parallel import sharding as S

            n_dev = int(_np.prod(self.mesh.devices.shape))
            # Pad the pair batch up to the mesh size (edge mode repeats the
            # LAST row; the padded rows are trimmed after decode) so the
            # decode ALWAYS runs on the backend sub-mesh — a fallback to the
            # frontend chip would stall tracking for ~200 ms per event.
            Bp = S.pad_to_multiple(B, n_dev)
            if Bp != B:
                pad = [(0, Bp - B)] + [(0, 0)] * (feat_i.ndim - 1)
                feat_i = jnp.pad(feat_i, pad, mode="edge")
                feat_j = jnp.pad(feat_j, pad, mode="edge")
                pos_i = jnp.pad(pos_i, [(0, Bp - B), (0, 0), (0, 0)],
                                mode="edge")
                pos_j = jnp.pad(pos_j, [(0, Bp - B), (0, 0), (0, 0)],
                                mode="edge")
            params = self.params_mesh
            feat_i = S.shard_leading(feat_i, self.mesh)
            feat_j = S.shard_leading(feat_j, self.mesh)
            pos_i = S.shard_leading(pos_i, self.mesh)
            pos_j = S.shard_leading(pos_j, self.mesh)
        out = _decode_symmetric_batch_jit(
            params, self.cfg, feat_i, pos_i, feat_j, pos_j, tuple(img_hw),
            self.ds,
        )
        if out[0].shape[1] != B:
            out = tuple(a[:, :B] for a in out)
        return out

    # -- matching entry points --------------------------------------------

    def match_asymmetric(self, frame_i, frame_j, idx_i2j_init=None):
        """Frame-to-keyframe matching (tracking hot path).

        Returns ``(idx_i2j, valid_match_j, Xii, Cii, Qii, Xji, Cji, Qji)``
        with pointmaps flattened to (1, N, ...) as the SLAM core expects.
        """
        X, C, D, Q = self.asymmetric_inference(frame_i, frame_j)
        b = 1
        h, w = X.shape[1:3]
        Xii, Xji = X[:b], X[b:]
        Dii, Dji = D[:b], D[b:]

        idx_i2j, valid_match_j = matching.match(
            Xii, Xji, Dii, Dji, idx_1_to_2_init=idx_i2j_init, **self._match_kw()
        )

        n = h * w
        flatten = lambda a: a.reshape(2, n, -1)
        Xf = flatten(X)
        Cf = flatten(C)
        Qf = flatten(Q)
        return (
            idx_i2j,
            valid_match_j,
            Xf[0][None], Cf[0][None], Qf[0][None],
            Xf[1][None], Cf[1][None], Qf[1][None],
        )

    def match_symmetric(self, feat_i, pos_i, feat_j, pos_j, img_hw,
                        init_i2j=None, init_j2i=None):
        """Symmetric matching for B keyframe pairs (backend edge creation).

        Returns ``(idx_i2j, idx_j2i, valid_j, valid_i, Qii, Qjj, Qji, Qij)``
        — reference mast3r_utils.py:142-180 semantics. ``init_i2j`` /
        ``init_j2i (B, N)`` optionally warm-start the matcher per direction.
        NOTE on the convention: matcher inits (like its outputs) are indexed
        by IMAGE-2 pixels and hold image-1 pixels, so ``init_i2j`` — the
        init for the direction whose output is ``idx_i2j`` — must map
        j-pixels → i-pixels (e.g. the pose projection of keyframe j's
        points into camera i), and vice versa. A missing direction
        cold-starts from identity.
        """
        b = feat_i.shape[0]
        # n is the WORKING pixel count (img_hw is the model resolution; the
        # per-pixel state may be decimated by dataset.img_downsample)
        n = (img_hw[0] // self.ds) * (img_hw[1] // self.ds)
        if self.mesh is None:
            # Fused single-program path: decode + heads + both matcher
            # directions in ONE dispatch (_match_symmetric_fused).
            ident = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None],
                                     (b, n))
            i2j = ident if init_i2j is None else init_i2j.astype(jnp.int32)
            j2i = ident if init_j2i is None else init_j2i.astype(jnp.int32)
            init = jnp.concatenate([i2j, j2i], axis=0)
            kw_items = tuple(sorted(self._match_kw().items()))
            idx_1_to_2, valid_match_2, Q = _match_symmetric_fused(
                self.params, self.cfg, feat_i, pos_i, feat_j, pos_j, init,
                tuple(img_hw), kw_items, self.ds)
            Qii, Qji, Qjj, Qij = Q[0], Q[1], Q[2], Q[3]
        else:
            # Mesh path: pair-decode batch shards over the edge axis; the
            # matcher stays ONE batched call (rows live on different chips,
            # a single sharded program keeps them parallel).
            X, C, D, Q = self.decode_symmetric_batch(
                feat_i, pos_i, feat_j, pos_j, img_hw)
            Xii, Xji, Xjj, Xij = X[0], X[1], X[2], X[3]
            Dii, Dji, Djj, Dij = D[0], D[1], D[2], D[3]
            Qii, Qji, Qjj, Qij = Q[0], Q[1], Q[2], Q[3]

            X11 = jnp.concatenate([Xii, Xjj], axis=0)
            X21 = jnp.concatenate([Xji, Xij], axis=0)
            D11 = jnp.concatenate([Dii, Djj], axis=0)
            D21 = jnp.concatenate([Dji, Dij], axis=0)
            init = None
            if init_i2j is not None or init_j2i is not None:
                ident = jnp.broadcast_to(
                    jnp.arange(n, dtype=jnp.int32)[None], (b, n))
                i2j = ident if init_i2j is None else init_i2j.astype(jnp.int32)
                j2i = ident if init_j2i is None else init_j2i.astype(jnp.int32)
                init = jnp.concatenate([i2j, j2i], axis=0)
                # warm starts are computed on the FRONTEND chip (pose
                # projections of keyframe state); replicate them onto the
                # backend mesh or the matcher jit rejects the mixed-device
                # inputs (decode outputs live on the mesh)
                from mast3r_slam_tpu.parallel import sharding as S

                init = S.replicate(init, self.mesh)
            idx_1_to_2, valid_match_2 = matching.match(
                X11, X21, D11, D21, idx_1_to_2_init=init, **self._match_kw()
            )

        idx_i2j = idx_1_to_2[:b]
        idx_j2i = idx_1_to_2[b:]
        valid_j = valid_match_2[:b]
        valid_i = valid_match_2[b:]
        return (
            idx_i2j, idx_j2i, valid_j, valid_i,
            Qii.reshape(b, n, 1), Qjj.reshape(b, n, 1),
            Qji.reshape(b, n, 1), Qij.reshape(b, n, 1),
        )

    def match_oneway(self, feat_i, pos_i, feat_j, pos_j, img_hw,
                     init_i2j=None):
        """ONE direction of a symmetric edge: decode (i, j) + the i→j
        matcher, as a single fused program.

        Used by the backend when the j→i direction of a consecutive edge is
        REUSED from the tracker: the tracker's decode (frame=j, keyframe=i)
        and converged match are bit-identical to what the symmetric path
        would recompute for that direction (same deterministic programs on
        the same features), so the keyframe event only pays half the decode
        and one matcher. Returns ``(idx_i2j (1, N), valid_j (1, N, 1),
        Qii (1, N), Qji (1, N))`` at the working resolution.
        """
        n = (img_hw[0] // self.ds) * (img_hw[1] // self.ds)
        if init_i2j is None:
            init_i2j = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None],
                                        (1, n))
        kw_items = tuple(sorted(self._match_kw().items()))
        return _match_oneway_fused(
            self.params, self.cfg, feat_i, pos_i, feat_j, pos_j,
            init_i2j.astype(jnp.int32), tuple(img_hw), kw_items, self.ds)

    def _match_kw(self):
        c = self.match_cfg
        return dict(
            max_iter=int(c.get("max_iter", 10)),
            lambda_init=float(c.get("lambda_init", 1e-8)),
            convergence_thresh=float(c.get("convergence_thresh", 1e-6)),
            dist_thresh=float(c.get("dist_thresh", 0.1)),
            radius=int(c.get("radius", 3)),
            dilation_max=int(c.get("dilation_max", 5)),
            refine_mode=matching.resolve_refine_mode(c),
            plateau_frac=float(c.get("plateau_frac", 0.001)),
            level_step=int(c.get("level_step", 1)),
            proj_step=int(c.get("proj_step", 1)),
        )


@partial(jax.jit, static_argnames=("cfg", "img_hw", "kw_items", "ds"))
def _match_oneway_fused(params, cfg, feat_i, pos_i, feat_j, pos_j, init,
                        img_hw, kw_items, ds=1):
    """Half of :func:`_match_symmetric_fused`: decode direction (i, j) +
    heads + the i→j matcher in ONE program (row 0 of the symmetric path,
    bit-identical computation). Returns ``(idx_i2j, valid_j, Qii, Qji)``."""
    res_ii, res_ji = M.decode_heads(params, cfg, feat_i, pos_i, feat_j,
                                    pos_j, img_hw)
    Xii = _decimate(res_ii["pts3d"], ds, h_axis=1)
    Xji = _decimate(res_ji["pts3d"], ds, h_axis=1)
    Dii = _decimate(res_ii["desc"], ds, h_axis=1)
    Dji = _decimate(res_ji["desc"], ds, h_axis=1)
    Qii = _decimate(res_ii["desc_conf"], ds, h_axis=1)
    Qji = _decimate(res_ji["desc_conf"], ds, h_axis=1)
    kw = dict(kw_items)
    b, h, w, _ = Xii.shape
    idx, valid = matching.match(Xii, Xji, Dii, Dji, idx_1_to_2_init=init,
                                **kw)
    return idx, valid, Qii.reshape(b, h * w), Qji.reshape(b, h * w)


@partial(jax.jit, static_argnames=("cfg", "img_hw", "ds"))
def _mono_core(params, cfg, img, img_hw, ds=1):
    """Fused mono inference: encode + self-pair decode + head1."""
    feat, pos = M.encode_image(params, cfg, img)
    d1, _ = M.decode_pair(params, cfg, feat, pos, feat, pos)
    res1 = M.downstream_head(M.head_params(params, 0), cfg, d1, img_hw)
    pts = _decimate(res1["pts3d"], ds, h_axis=1)
    conf = _decimate(res1["conf"], ds, h_axis=1)
    b, h, w, _ = pts.shape
    return (feat, pos, pts.reshape(b, h * w, 3),
            conf.reshape(b, h * w, 1))


def _decode_symmetric_core(params, cfg, feat_i, pos_i, feat_j, pos_j, img_hw,
                           ds=1):
    """(B, N, C) features → stacked [ii, ji, jj, ij] head outputs, one decode.
    ``ds``: working-resolution decimation (reference mast3r_utils.py:43-52)."""
    f1 = jnp.concatenate([feat_i, feat_j], axis=0)   # sources
    f2 = jnp.concatenate([feat_j, feat_i], axis=0)   # cross streams
    p1 = jnp.concatenate([pos_i, pos_j], axis=0)
    p2 = jnp.concatenate([pos_j, pos_i], axis=0)
    res1, res2 = M.decode_heads(params, cfg, f1, p1, f2, p2, img_hw)
    b = feat_i.shape[0]

    def stack(key):
        a1 = res1[key]   # [11 (B); 22 (B)]
        a2 = res2[key]   # [21 (B); 12 (B)]
        return _decimate(
            jnp.stack([a1[:b], a2[:b], a1[b:], a2[b:]], axis=0), ds,
            h_axis=2)

    return stack("pts3d"), stack("conf"), stack("desc"), stack("desc_conf")


_decode_symmetric_batch_jit = partial(
    jax.jit, static_argnames=("cfg", "img_hw", "ds")
)(_decode_symmetric_core)


@partial(jax.jit, static_argnames=("cfg", "img_hw", "kw_items", "ds"))
def _match_symmetric_fused(params, cfg, feat_i, pos_i, feat_j, pos_j, init,
                           img_hw, kw_items, ds=1):
    """Symmetric pair decode + heads + both matcher directions as ONE XLA
    program — the whole backend edge-creation compute in a single dispatch.

    Program switches cost ~20 ms on a remote-attached chip
    (docs/PERFORMANCE.md rule 4), so the staged decode→match→match chain
    paid two avoidable dispatch gaps per keyframe event. The matcher runs
    per direction (B=1 ``matching.match`` calls inside the program): a
    vmapped LM while_loop runs every row to the SLOWEST row's iteration
    count — 2x B=1 measured 94 ms vs 132 ms batched at production shapes —
    and this also matches the reference, which matches each direction
    independently (matching.py driver).

    ``init (2B, N)`` int32 warm-start rows (identity rows where no warm
    start exists — identical semantics to ``matching.match``'s ``None``).
    Returns ``(idx_1_to_2 (2B, N), valid (2B, N, 1), Q (4, B, h, w, 1))``.
    """
    X, _, D, Q = _decode_symmetric_core(params, cfg, feat_i, pos_i, feat_j,
                                        pos_j, img_hw, ds)
    X11 = jnp.concatenate([X[0], X[2]], axis=0)
    X21 = jnp.concatenate([X[1], X[3]], axis=0)
    D11 = jnp.concatenate([D[0], D[2]], axis=0)
    D21 = jnp.concatenate([D[1], D[3]], axis=0)
    kw = dict(kw_items)
    rows = [
        matching.match(X11[r:r + 1], X21[r:r + 1], D11[r:r + 1],
                       D21[r:r + 1], idx_1_to_2_init=init[r:r + 1], **kw)
        for r in range(X11.shape[0])
    ]
    return (jnp.concatenate([r[0] for r in rows]),
            jnp.concatenate([r[1] for r in rows]), Q)
