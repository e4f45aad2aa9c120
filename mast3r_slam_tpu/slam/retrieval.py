"""Loop-closure retrieval: ASMK-style aggregated binarized matching, TPU-native.

Capability parity with the reference retrieval stack (reference:
mast3r_slam/retrieval_database.py + thirdparty/mast3r/{retrieval,asmk}): each
keyframe's encoder features pass through a retrieval head (whiten → projector
→ attention-ranked top-N local descriptor selection), are quantized against a
visual-word codebook, aggregated per word, binarized, and scored against an
inverted file with a selective (power-law) hamming kernel; top-k past
keyframes above a threshold become loop-closure candidates.

TPU-first redesign decisions:
- The head + quantization + per-word aggregation/binarization run as ONE
  jitted function — quantization is a plain (N, D) x (D, K) matmul argmax on
  the MXU instead of faiss, and aggregation is a segment-sum over words.
- The codebook is bootstrapped ONLINE from the first keyframes' descriptors
  (reservoir sample + a few Lloyd iterations on device) instead of loading the
  reference's pretrained faiss pickle — no frozen artifacts required. A
  converted pretrained codebook/head can be dropped in via ``set_codebook`` /
  ``head_params``.
- The inverted file is a host-side structure of packed uint64 signatures
  (scoring ~110 keyframes is host-trivial; numpy popcount via uint8 LUT).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# ---------------------------------------------------------------------------
# Jitted feature path
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nfeat", "residual"))
def select_local_features(feat, head_params, nfeat, residual=False):
    """Retrieval-head feature prep for ONE keyframe's tokens ``feat (N, D)``.

    Mirrors the reference head exactly (retrieval_database.py:25-41 +
    thirdparty/mast3r/retrieval/model.py:55-157): prewhiten ``(x - m) @ P`` →
    projector (Linear → LayerNorm → GELU per hidden layer, final Linear)
    [+ residual] → attention = L2 norm of the projected (pre-postwhiten)
    features → postwhiten → top-``nfeat`` by attention. With
    ``head_params=None`` behavior degrades gracefully to L2-normalized raw
    encoder tokens ranked by pre-norm magnitude (attention proxy) — the same
    structure with identity weights. Returns ``(nfeat, D)`` L2-normalized
    descriptors.
    """
    x = feat
    if head_params is not None:
        x = (x - head_params["prewhiten_m"]) @ head_params["prewhiten_P"]
        h = x
        # layer kind is encoded by dict keys (w=linear, g=layernorm,
        # {}=gelu) so the pytree stays jit-traceable (strings can't be leaves)
        for lyr in head_params["projector"]:
            if "w" in lyr:
                h = h @ lyr["w"] + lyr["b"]
            elif "g" in lyr:
                mu = jnp.mean(h, axis=-1, keepdims=True)
                var = jnp.var(h, axis=-1, keepdims=True)
                h = (h - mu) * lax.rsqrt(var + 1e-5) * lyr["g"] + lyr["b"]
            else:  # gelu
                h = jax.nn.gelu(h, approximate=False)
        x = h + x if residual else h
        attention = jnp.linalg.norm(x, axis=-1)
        x = (x - head_params["postwhiten_m"]) @ head_params["postwhiten_P"]
    else:
        attention = jnp.linalg.norm(x, axis=-1)
    top = jnp.argsort(-attention)[:nfeat]
    sel = x[top]
    return sel / jnp.clip(jnp.linalg.norm(sel, axis=-1, keepdims=True), 1e-8)


@partial(jax.jit, static_argnames=("ma",))
def aggregate_binarize(desc, codebook, ma=1):
    """Quantize + per-word aggregate + binarize (the ASMK signature builder).

    ``desc (M, D)`` L2-normalized; ``codebook (K, D)``. ``ma`` is the
    multiple-assignment count: each descriptor is assigned to its ``ma``
    nearest words and contributes the residual ``desc - centroid[w]`` to each
    (the reference queries with ``multiple_assignment: 5`` and builds the IVF
    with 1 — thirdparty/mast3r/mast3r/retrieval/processor.py:91-96,
    asmk/kernel.py:26-38). The reference assigns by L2 distance
    (retrieval_database.py:96-105) and its pretrained centroids are NOT
    L2-normalized, so plain dot-product top-k would mis-rank; with
    ``‖desc‖=1`` the exact L2 ranking is ``argmax(d·c − ‖c‖²/2)`` — still one
    (M, D) x (D, K) matmul on the MXU + ``lax.top_k``. Returns ``(agg_sign
    (K, D) ±1 float, word_mask (K,) bool)`` where ``agg_sign`` row w is the
    sign of the summed residuals of descriptors assigned to word w.
    """
    scores = desc @ codebook.T - 0.5 * jnp.sum(codebook**2, axis=-1)[None]
    if ma == 1:
        words = jnp.argmax(scores, axis=-1)         # (M,)
    else:
        _, words = lax.top_k(scores, ma)            # (M, ma)
        words = words.reshape(-1)
    resid = jnp.repeat(desc, ma, axis=0) - codebook[words]
    K = codebook.shape[0]
    agg = jnp.zeros_like(codebook).at[words].add(resid)
    counts = jnp.zeros((K,), jnp.int32).at[words].add(1)
    return jnp.sign(agg), counts > 0


@jax.jit
def lloyd_step(desc, codebook):
    """One k-means (Lloyd) iteration of the codebook on device."""
    words = jnp.argmax(desc @ codebook.T, axis=-1)
    K = codebook.shape[0]
    sums = jnp.zeros_like(codebook).at[words].add(desc)
    cnt = jnp.zeros((K, 1), jnp.float32).at[words].add(1.0)
    new = jnp.where(cnt > 0, sums / jnp.clip(cnt, 1.0), codebook)
    return new / jnp.clip(jnp.linalg.norm(new, axis=-1, keepdims=True), 1e-8)


# ---------------------------------------------------------------------------
# Host-side inverted file
# ---------------------------------------------------------------------------

_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)


def _pack_bits(sign_rows: np.ndarray) -> np.ndarray:
    """±1 float (R, D) → packed uint8 (R, ceil(D/8))."""
    bits = (sign_rows > 0).astype(np.uint8)
    return np.packbits(bits, axis=-1)


class RetrievalDatabase:
    """Incremental inverted file over binarized per-word aggregated residuals.

    API parity with the reference ``RetrievalDatabase.update(frame,
    add_after_query, k, min_thresh)`` (retrieval_database.py:43-72).
    """

    def __init__(self, cfg, codebook_size=1024, nfeat=256, desc_dim=1024,
                 alpha=3.0, similarity_thresh=0.0, head_params=None,
                 ma_query=5, ma_build=1):
        self.cfg = cfg
        self.K = codebook_size
        self.nfeat = nfeat
        self.desc_dim = desc_dim
        self.alpha = alpha
        self.similarity_thresh = similarity_thresh
        # multiple-assignment counts: the reference quantizes each QUERY
        # descriptor to its 5 nearest words but builds the IVF with 1
        # (thirdparty/mast3r/mast3r/retrieval/processor.py:91-96)
        self.ma_query = int(ma_query)
        self.ma_build = int(ma_build)
        # residual is a STRUCTURAL property (selects the compute graph), so
        # it rides as a static jit arg, not a traced pytree leaf
        self.head_residual = False
        if head_params is not None:
            head_params = dict(head_params)
            self.head_residual = bool(head_params.pop("residual", False))
            head_params = jax.tree.map(jnp.asarray, head_params)
        self.head_params = head_params
        # one-entry signature cache: relocalization calls update() twice on
        # the SAME frame (query, then insert-after-success) back to back
        # under the keyframe lock — don't recompute the head + quantization
        self._sig_cache = None

        self.codebook: jnp.ndarray | None = None
        self._bootstrap_pool: list[np.ndarray] = []
        self._bootstrap_target = 4 * codebook_size
        self._pending: list[tuple[int, np.ndarray]] = []

        # inverted file: word → (list of internal ids, list of packed sigs)
        self.ivf_ids: list[list[int]] = [[] for _ in range(self.K)]
        self.ivf_sig: list[list[np.ndarray]] = [[] for _ in range(self.K)]
        self.kf_counter = 0
        # internal insertion id → keyframe-buffer index. The two diverge as
        # soon as insertion order differs from buffer order (--resume starts
        # with a populated buffer and an empty database; reloc can insert
        # out of order), so query results are mapped through this table.
        self.id_to_kf: list[int] = []
        # per-image normalization: number of non-empty words per image
        self.image_norms: list[float] = []

    # -- codebook bootstrap -------------------------------------------------

    def _ensure_codebook(self, desc_np: np.ndarray):
        if self.codebook is not None:
            return
        self._bootstrap_pool.append(desc_np)
        total = sum(p.shape[0] for p in self._bootstrap_pool)
        if total >= self._bootstrap_target or len(self._bootstrap_pool) >= 8:
            pool = np.concatenate(self._bootstrap_pool, axis=0)
            rng = np.random.default_rng(0)
            if pool.shape[0] >= self.K:
                sel = rng.choice(pool.shape[0], self.K, replace=False)
            else:
                sel = rng.choice(pool.shape[0], self.K, replace=True)
            cb = jnp.asarray(pool[sel])
            cb = cb / jnp.clip(jnp.linalg.norm(cb, axis=-1, keepdims=True), 1e-8)
            pool_j = jnp.asarray(pool)
            for _ in range(4):
                cb = lloyd_step(pool_j, cb)
            self.codebook = cb
            self.desc_dim = int(cb.shape[1])
            self._bootstrap_pool = []

    def set_codebook(self, cb):
        cb = jnp.asarray(cb, dtype=jnp.float32)
        if cb.shape[0] != self.K:
            if self.kf_counter > 0:
                raise ValueError(
                    f"cannot swap codebook size {self.K} -> {cb.shape[0]} "
                    "after keyframes were indexed")
            self.K = int(cb.shape[0])
            self.ivf_ids = [[] for _ in range(self.K)]
            self.ivf_sig = [[] for _ in range(self.K)]
        self.codebook = cb
        self.desc_dim = int(cb.shape[1])  # signature bit width = residual dim
        self._flush_pending()

    # -- signature construction ---------------------------------------------

    def _signature_from_desc(self, desc, ma=1):
        agg_sign, mask = aggregate_binarize(jnp.asarray(desc), self.codebook,
                                            ma=ma)
        mask_np = np.asarray(mask)
        words = np.where(mask_np)[0]
        packed = _pack_bits(np.asarray(agg_sign)[words])
        return words, packed

    def _signature(self, feat):
        """keyframe encoder tokens (1, N, D) → ((build_words, build_packed,
        query_words, query_packed), desc (nfeat, D)).

        Build and query signatures differ by multiple-assignment count, as
        in the reference (build_ivf MA=1, query_ivf MA=5)."""
        desc = select_local_features(feat[0], self.head_params, self.nfeat,
                                     self.head_residual)
        desc_np = np.asarray(desc)
        self._ensure_codebook(desc_np)
        if self.codebook is None:
            # Still bootstrapping; caller keeps the raw descriptors so the
            # keyframe can be indexed retroactively once the codebook exists.
            empty = (np.zeros((0,), np.int64), np.zeros((0, 1), np.uint8))
            return (*empty, *empty), desc_np
        sig_b = self._signature_from_desc(desc_np, self.ma_build)
        sig_q = (sig_b if self.ma_query == self.ma_build
                 else self._signature_from_desc(desc_np, self.ma_query))
        return (*sig_b, *sig_q), desc_np

    def _insert(self, words, packed, kf_idx: int):
        internal = self.kf_counter
        for w, sig in zip(words, packed):
            self.ivf_ids[int(w)].append(internal)
            self.ivf_sig[int(w)].append(sig)
        self.image_norms.append(float(len(words)))
        self.id_to_kf.append(internal if kf_idx is None else int(kf_idx))
        self.kf_counter += 1

    def _flush_pending(self):
        """Retroactively index keyframes seen before the codebook existed —
        otherwise loop closures back to the trajectory START (the ones that
        matter most) would be structurally impossible to retrieve."""
        if self.codebook is None or not self._pending:
            return
        for kf_idx, desc_np in self._pending:
            words, packed = self._signature_from_desc(desc_np, self.ma_build)
            self._insert(words, packed, kf_idx)
        self._pending = []

    # -- scoring --------------------------------------------------------------

    def _score(self, words: np.ndarray, packed: np.ndarray) -> np.ndarray:
        """Selective hamming-kernel ASMK score against all stored keyframes."""
        scores = np.zeros(self.kf_counter, np.float64)
        # reference normalizes hamming distance by the PADDED bit count
        # (uint32-packed, asmk/cython/hamming.pyx c_hamming_dist_uint32_arr:
        # normalization = n_words*32); pad bits are 0 on both sides so they
        # never contribute distance, only scale
        nbits = 32 * ((self.desc_dim + 31) // 32)
        for w, sig in zip(words, packed):
            ids = self.ivf_ids[w]
            if not ids:
                continue
            stored = np.stack(self.ivf_sig[w])           # (R, D/8)
            ham = _POPCNT[np.bitwise_xor(stored, sig[None])].sum(axis=1)
            sim = 1.0 - 2.0 * ham / nbits                # ±1 dot / D
            sim = np.where(sim > 0, sim, 0.0) ** self.alpha
            np.add.at(scores, np.asarray(ids), sim)
        norms = np.sqrt(np.maximum(np.asarray(self.image_norms), 1.0))
        q_norm = np.sqrt(max(len(words), 1))
        return scores / (norms * q_norm)

    # -- public API -----------------------------------------------------------

    def update(self, frame, add_after_query: bool, k: int,
               min_thresh: float = 0.0, kf_idx: int | None = None,
               skip_query: bool = False) -> list[int]:
        """Query top-k loop-closure candidates, then optionally insert.

        ``kf_idx`` is the keyframe-buffer index this frame lives at (used to
        map retrieval hits back to buffer indices); defaults to assuming
        insertion order == buffer order. ``skip_query=True`` inserts without
        the inverted-file scoring sweep (relocalization's insert-after-
        success call discards the query result).
        """
        key = (getattr(frame, "frame_id", None), id(frame.feat))
        if self._sig_cache is not None and self._sig_cache[0] == key:
            sigs, desc_np = self._sig_cache[1]
        else:
            sigs, desc_np = self._signature(frame.feat)
            self._sig_cache = (key, (sigs, desc_np))
        words_b, packed_b, words_q, packed_q = sigs
        self._flush_pending()

        top: list[int] = []
        if not skip_query and self.kf_counter > 0 and len(words_q) > 0:
            scores = self._score(words_q, packed_q)
            order = np.argsort(-scores)[:k]
            top = [self.id_to_kf[int(i)] for i in order
                   if scores[i] > min_thresh]

        if add_after_query:
            if self.codebook is None:
                self._pending.append(
                    (self.kf_counter + len(self._pending)
                     if kf_idx is None else int(kf_idx), desc_np)
                )
            else:
                self._insert(words_b, packed_b, kf_idx)
        return top
