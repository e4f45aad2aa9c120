"""Retrieval IVF scoring parity vs the reference ASMK stack.

Instantiates the ACTUAL reference ASMK kernel + inverted file
(reference: thirdparty/mast3r/asmk/asmk/kernel.py:8-85,
inverted_file.py:8-154) on fixed synthetic descriptors and pins score/rank
agreement of our ``RetrievalDatabase`` quantize → aggregate → binarize →
IVF-hamming scoring path (mast3r_slam_tpu/slam/retrieval.py), with the
reference's production parameters (build MA=1, query MA=5, binary kernel,
alpha=3.0, similarity_threshold=0.0, use_idf=False — reference
thirdparty/mast3r/mast3r/retrieval/processor.py:91-96).

The reference's hamming module is cython (never compiled in this
environment); a numpy stand-in implementing the documented packing/distance
semantics (asmk/cython/hamming.pyx) is injected so kernel.py imports. The
stand-in only has to preserve hamming DISTANCES, which the packing layout
doesn't affect; its normalization (n_uint32_words*32) matches the cython
default exactly.
"""

import sys
import types

import numpy as np
import pytest

REF_ASMK = "/root/reference/thirdparty/mast3r/asmk"


def _make_hamming_stub():
    """Numpy implementation of the cython hamming API used by kernel.py."""
    mod = types.ModuleType("asmk.hamming")

    def binarize_and_pack_2D(arr, threshold=0):
        bits = (np.asarray(arr) > threshold).astype(np.uint8)
        pad = (-bits.shape[1]) % 32
        bits = np.pad(bits, ((0, 0), (0, pad)))
        words = bits.reshape(bits.shape[0], -1, 32).astype(np.uint64)
        weights = (np.uint64(1) << np.arange(31, -1, -1, dtype=np.uint64))
        return (words @ weights).astype(np.uint32)

    def hamming_cdist_packed(arr1, arr2, normalization=0):
        a1 = np.ascontiguousarray(arr1, dtype=np.uint32)
        a2 = np.ascontiguousarray(arr2, dtype=np.uint32)
        if normalization == 0:
            normalization = a1.shape[1] * 32
        x = a1[:, None, :] ^ a2[None, :, :]
        ham = np.unpackbits(x.view(np.uint8).reshape(x.shape[0], x.shape[1], -1),
                            axis=-1).sum(axis=-1)
        return (ham / normalization).astype(np.float32)

    mod.binarize_and_pack_2D = binarize_and_pack_2D
    mod.hamming_cdist_packed = hamming_cdist_packed
    return mod


@pytest.fixture(scope="module")
def ref_asmk():
    if REF_ASMK not in sys.path:
        sys.path.insert(0, REF_ASMK)
    # the asmk package __init__ pulls faiss (codebook training — not under
    # test here) and the cython hamming module; stub both so the pure-numpy
    # kernel/inverted_file modules import
    sys.modules.setdefault("faiss", types.ModuleType("faiss"))
    sys.modules["asmk.hamming"] = _make_hamming_stub()
    from asmk import inverted_file, kernel
    return kernel, inverted_file


# production query/build parameters (reference processor.py:91-96)
ALPHA = 3.0
SIM_THRESH = 0.0
MA_BUILD = 1
MA_QUERY = 5

K = 48          # codebook words
D = 64          # descriptor dim (multiple of 32: packing parity is exact)
M = 40          # descriptors per image
N_IMAGES = 12


def _l2n(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _quantize_ref(desc, centroids, k):
    """Reference L2 multiple-assignment (retrieval_database.py:96-105)."""
    d2 = (np.sum(desc**2, axis=1)[:, None] + np.sum(centroids**2, axis=1)[None]
          - 2.0 * desc @ centroids.T)
    return np.argsort(d2, axis=1)[:, :k]


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    # deliberately UNNORMALIZED centroids: the reference's pretrained
    # codebook is raw faiss k-means output, and L2-vs-dot quantization
    # ranking only diverges on unnormalized centroids — the parity must
    # cover that case
    centroids = rng.normal(size=(K, D)).astype(np.float32) * \
        rng.uniform(0.5, 2.0, (K, 1)).astype(np.float32)
    descs = [_l2n(rng.normal(size=(M, D)).astype(np.float32))
             for _ in range(N_IMAGES)]
    # the query is image 3 re-observed with small noise, so ranking is
    # meaningful (same-place revisit, the loop-closure case)
    query = _l2n(descs[3] + 0.05 * rng.normal(size=(M, D)).astype(np.float32))
    return centroids, descs, query


def _reference_scores(ref_asmk, centroids, descs, query):
    kernel_mod, ivf_mod = ref_asmk

    class _CB:
        pass

    cb = _CB()
    cb.centroids = centroids
    kern = kernel_mod.ASMKKernel(cb, binary=True)
    ivf = ivf_mod.IVF.initialize_empty(codebook_size=K, use_idf=False)
    for i, des in enumerate(descs):
        word_ids = _quantize_ref(des, centroids, MA_BUILD)
        ades, ids = kern.aggregate_image(des, word_ids)
        ivf.add(ades, ids, np.full(ids.shape[0], i))
    qwords = _quantize_ref(query, centroids, MA_QUERY)
    q_ades, q_ids = kern.aggregate_image(query, qwords)
    sim_fn = lambda *x: kern.similarity(  # noqa: E731
        *x, alpha=ALPHA, similarity_threshold=SIM_THRESH)
    ranks, ranked = ivf.search(q_ades, q_ids, topk=None,
                               similarity_func=sim_fn)
    scores = np.zeros(N_IMAGES)
    scores[ranks] = ranked
    return scores


def _ours_scores(centroids, descs, query):
    from mast3r_slam_tpu.slam.retrieval import RetrievalDatabase

    db = RetrievalDatabase(None, codebook_size=K, nfeat=M, desc_dim=D,
                           alpha=ALPHA, similarity_thresh=SIM_THRESH,
                           ma_query=MA_QUERY, ma_build=MA_BUILD)
    db.set_codebook(centroids)
    for i, des in enumerate(descs):
        words, packed = db._signature_from_desc(des, db.ma_build)
        db._insert(words, packed, i)
    qw, qp = db._signature_from_desc(query, db.ma_query)
    return db._score(qw, qp)


def test_scoring_parity(ref_asmk, scene):
    """Full aggregate→binarize→IVF-score parity, scores AND ranks."""
    centroids, descs, query = scene
    ref = _reference_scores(ref_asmk, centroids, descs, query)
    ours = _ours_scores(centroids, descs, query)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)
    assert np.argsort(-ours).tolist() == np.argsort(-ref).tolist()
    # the planted loop-closure target must win
    assert int(np.argmax(ours)) == 3


def test_scoring_parity_nonmultiple32(ref_asmk, scene):
    """D=40 (not a multiple of 32): the reference normalizes hamming by the
    PADDED bit count (64), which our scorer must reproduce."""
    centroids, descs, query = scene
    Dp = 40
    ref = _reference_scores(ref_asmk, centroids[:, :Dp],
                            [_l2n(d[:, :Dp]) for d in descs],
                            _l2n(query[:, :Dp]))
    ours = _ours_scores(centroids[:, :Dp].copy(),
                        [_l2n(d[:, :Dp]) for d in descs],
                        _l2n(query[:, :Dp]))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_aggregate_multiple_assignment_semantics():
    """MA>1 aggregation: each descriptor contributes its residual to each of
    its MA nearest words exactly once (reference kernel.py:26-38 'any')."""
    from mast3r_slam_tpu.slam.retrieval import aggregate_binarize

    rng = np.random.default_rng(0)
    desc = _l2n(rng.normal(size=(6, 16)).astype(np.float32))
    cb = rng.normal(size=(8, 16)).astype(np.float32)
    sign, mask = aggregate_binarize(desc, cb, ma=3)
    sign, mask = np.asarray(sign), np.asarray(mask)
    words = _quantize_ref(desc, cb, 3)
    exp = np.zeros_like(cb)
    hit = np.zeros(8, bool)
    for i in range(6):
        for w in words[i]:
            exp[w] += desc[i] - cb[w]
            hit[w] = True
    assert (mask == hit).all()
    np.testing.assert_array_equal(sign[hit] > 0, exp[hit] > 0)
