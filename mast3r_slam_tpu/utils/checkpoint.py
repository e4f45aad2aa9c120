"""SLAM-state checkpoint / resume.

The reference has NO state checkpointing (SURVEY.md §5.4 — model weights
only; outputs are terminal artifacts). This module adds it: the entire
keyframe ring (poses, pointmaps, confidences, features), the factor-graph
edge store, and the frame counter serialize to one compressed ``.npz`` so a
run can be snapshotted mid-sequence and resumed (``main.py --checkpoint`` /
``--resume``), or a finished map can be reloaded for re-export/inspection.

What is deliberately NOT restored on resume, and why that is safe:

- **Quality-service EWMA coverage state** (quality_async per-kf ``cov_ewma``)
  — an advisory smoothing signal for TSDF scheduling priorities. On resume
  it re-seeds from the first new observation of each keyframe (EWMA
  ``alpha=0.8`` forgets history in ~3 updates anyway); worst case a few
  blocks get refined slightly earlier/later than they would have.
- **Local-TSDF refine registry** (block state machine, retry/backoff
  counters) — pure scheduling memory. Cleared state means blocks become
  eligible for (idempotent) re-refinement; fused geometry already written
  into keyframe pointmaps IS in the snapshot.
- **Global-TSDF volume** — derived data: it is rebuilt by re-integrating the
  restored keyframes (the integrator walks the keyframe ring on startup),
  at the cost of one re-integration sweep, so persisting the voxel hash
  would only trade startup time for snapshot size (~100s of MB).
- **Retrieval inverted file** — rebuilt by re-indexing restored keyframes'
  features on resume (main.py re-runs ``retrieval.update`` per restored
  keyframe), which reproduces the IVF exactly up to codebook bootstrap
  sampling.

Everything that cannot be re-derived (poses, pointmaps, fused confidences,
encoder features, edge topology, frame counter) IS snapshotted.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def save_state(path, keyframes, factor_graph=None, frame_idx: int = 0,
               extra: dict | None = None):
    """Snapshot keyframe buffer (+ optional factor graph) to ``path``."""
    with keyframes.lock:
        n = len(keyframes)
        data = {
            "n_size": np.asarray(n),
            "frame_idx": np.asarray(frame_idx),
            "h": np.asarray(keyframes.h),
            "w": np.asarray(keyframes.w),
            "dataset_idx": keyframes.dataset_idx[:n],
            "T_WC": np.asarray(keyframes.T_WC[:n]),
            "X": np.asarray(keyframes.X[:n]),
            "C": np.asarray(keyframes.C[:n]),
            "N": keyframes.N[:n],
            "N_updates": keyframes.N_updates[:n],
            "feat": np.asarray(keyframes.feat[:n]),
            "pos": np.asarray(keyframes.pos[:n]),
            "version": keyframes.version[:n],
        }
        if keyframes.K is not None:
            data["K"] = np.asarray(keyframes.K)
        uimgs = [keyframes.uimg[i] for i in range(n)]
        if all(u is not None for u in uimgs) and n:
            data["uimg"] = np.stack([np.asarray(u) for u in uimgs])
        imgs = [keyframes.img[i] for i in range(n)]
        if all(im is not None for im in imgs) and n:
            data["img"] = np.stack([np.asarray(im) for im in imgs])
    if factor_graph is not None:
        data["edges_ii"] = factor_graph.ii
        data["edges_jj"] = factor_graph.jj
        data["idx_ii2jj"] = np.asarray(factor_graph.idx_ii2jj)
        data["idx_jj2ii"] = np.asarray(factor_graph.idx_jj2ii)
        data["valid_match_j"] = np.asarray(factor_graph.valid_match_j)
        data["valid_match_i"] = np.asarray(factor_graph.valid_match_i)
        data["Q_ii2jj"] = np.asarray(factor_graph.Q_ii2jj)
        data["Q_jj2ii"] = np.asarray(factor_graph.Q_jj2ii)
    if extra:
        for k, v in extra.items():
            data[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **data)
    return path


def load_state(path, keyframes, factor_graph=None) -> int:
    """Restore into an ALREADY-CONSTRUCTED keyframe buffer (+ factor graph).

    Returns the frame index to resume from.
    """
    z = np.load(path, allow_pickle=False)
    n = int(z["n_size"])
    assert int(z["h"]) == keyframes.h and int(z["w"]) == keyframes.w, (
        "checkpoint resolution mismatch"
    )
    with keyframes.lock:
        keyframes.n_size = n
        keyframes.dataset_idx[:n] = z["dataset_idx"]
        keyframes.T_WC = keyframes.T_WC.at[:n].set(jnp.asarray(z["T_WC"]))
        keyframes.X = keyframes.X.at[:n].set(jnp.asarray(z["X"]))
        keyframes.C = keyframes.C.at[:n].set(jnp.asarray(z["C"]))
        keyframes.N[:n] = z["N"]
        keyframes.N_updates[:n] = z["N_updates"]
        keyframes.feat = keyframes.feat.at[:n].set(jnp.asarray(z["feat"]))
        keyframes.pos = keyframes.pos.at[:n].set(jnp.asarray(z["pos"]))
        keyframes.version[:n] = z["version"]
        # The pointmap buffers were just replaced wholesale: bump the CONTENT
        # version of every restored slot so any consumer keyed on xc_version
        # (the factor graph's measured-channel cache, the TSDF refiner's
        # content hashes) can never serve channels computed from the
        # pre-restore pointmaps.
        keyframes.xc_version[:n] += 1
        if "K" in z:
            keyframes.K = jnp.asarray(z["K"])
        for i in range(n):
            if "uimg" in z:
                keyframes.uimg[i] = z["uimg"][i]
            if "img" in z:
                keyframes.img[i] = jnp.asarray(z["img"][i])
            # (display/working shape, MODEL-crop true shape) — under
            # dataset.img_downsample these differ, and add_factors reads
            # element [1] as the head-unflatten resolution
            keyframes.img_shapes[i] = ((keyframes.h, keyframes.w),
                                       tuple(keyframes.model_hw))
            keyframes.frame_id_to_index[int(z["dataset_idx"][i])] = i
            keyframes.is_dirty[i] = True
    if factor_graph is not None and hasattr(factor_graph, "drop_meas_cache"):
        # Unconditionally: even an edge-less/older checkpoint replaced the
        # keyframe pointmaps above, so a warm measured-channel cache from the
        # pre-restore session must never survive a restore.
        factor_graph.drop_meas_cache()
    if factor_graph is not None and "edges_ii" in z:
        factor_graph.ii = z["edges_ii"]
        factor_graph.jj = z["edges_jj"]
        factor_graph.idx_ii2jj = jnp.asarray(z["idx_ii2jj"])
        factor_graph.idx_jj2ii = jnp.asarray(z["idx_jj2ii"])
        factor_graph.valid_match_j = jnp.asarray(z["valid_match_j"])
        factor_graph.valid_match_i = jnp.asarray(z["valid_match_i"])
        factor_graph.Q_ii2jj = jnp.asarray(z["Q_ii2jj"])
        factor_graph.Q_jj2ii = jnp.asarray(z["Q_jj2ii"])
    return int(z["frame_idx"])
