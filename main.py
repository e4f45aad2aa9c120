"""MASt3R-SLAM-TPU — CLI orchestrator.

Usage (CLI parity with the reference ``main.py:164-618``):

    python main.py --dataset <path> --config config/base.yaml \
        [--calib config/intrinsics.yaml] [--save-as default] [--no-viz] \
        [--weights <converted .npz>] [--max-frames N]

Single-process TPU design (see SURVEY.md §7): one controller; the frontend
loop runs here, the backend factor-graph/BA runs as a host thread dispatching
its own jitted device computations, and the quality + dual-TSDF services are
daemon threads. ``single_thread: True`` in the config turns everything into
deterministic lock-step for evaluation.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

from mast3r_slam_tpu.data import load_dataset
from mast3r_slam_tpu.data.datasets import Intrinsics
from mast3r_slam_tpu import evaluation
from mast3r_slam_tpu.models import mast3r as M
from mast3r_slam_tpu.models.convert import load_params_npz
from mast3r_slam_tpu.models.inference import MASt3RInference
from mast3r_slam_tpu.ops import lie
from mast3r_slam_tpu.services.quality_async import AsynchronousQualityService
from mast3r_slam_tpu.services.tsdf_global import TSDFGlobalManager
from mast3r_slam_tpu.services.tsdf_local import TSDFRefiner
from mast3r_slam_tpu.slam.factor_graph import FactorGraph
from mast3r_slam_tpu.slam.frame import KeyframeBuffer, Mode, States
from mast3r_slam_tpu.slam.pipeline import Backend, create_frame
from mast3r_slam_tpu.slam.retrieval import RetrievalDatabase
from mast3r_slam_tpu.slam.tracker import FrameTracker
from mast3r_slam_tpu.utils.config import config, load_config


def build_model(args, cfg, downsample=1):
    mdl = cfg.get("model", {})
    if mdl.get("preset", "") == "tiny":  # CPU-testable model for smoke runs
        mcfg = M.tiny_config()
    else:
        mcfg = M.MASt3RConfig(dtype=mdl.get("dtype", "bfloat16"),
                              head_dtype=mdl.get("head_dtype", "bfloat16"))
    if args.weights:
        params = load_params_npz(args.weights)
        print(f"loaded converted weights: {args.weights}")
    else:
        print("WARNING: no --weights given; using random-init parameters "
              "(geometry will be meaningless — fine for perf/smoke runs)")
        params = M.init_params(jax.random.PRNGKey(0), mcfg)
    # load-time prep, both numerics-neutral (tests/test_model.py): weights
    # pre-cast to compute dtype (halves per-frame weight HBM reads) + the
    # dual-decoder stacked into one batched two-stream chain
    params = jax.device_put(M.prepare_params(params, mcfg))
    from mast3r_slam_tpu.parallel.topology import plan_topology

    topo = plan_topology()
    if topo.backend_mesh is not None:
        print(f"disjoint device topology: {topo.describe()}")
    model = MASt3RInference(params, mcfg, cfg.get("matching", {}),
                            mesh=topo.backend_mesh, downsample=downsample)
    return model, topo


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--config", default="config/base.yaml")
    ap.add_argument("--save-as", default="default")
    ap.add_argument("--no-viz", action="store_true")
    ap.add_argument("--calib", default="")
    ap.add_argument("--weights", default="")
    ap.add_argument("--retrieval-weights", default="",
                    help="retrieval head: reference .pth checkpoint or a "
                         ".npz saved via models.convert.save_params_npz")
    ap.add_argument("--retrieval-codebook", default="",
                    help="ASMK codebook: reference .pkl, .npy, or .npz "
                         "(omit to bootstrap online from early keyframes)")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--checkpoint", default="",
                    help="write a SLAM-state snapshot here at shutdown")
    ap.add_argument("--resume", default="",
                    help="resume from a SLAM-state snapshot")
    ap.add_argument("--profile", action="store_true",
                    help="per-section timing report at exit (utils.tictoc)")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    single_thread = bool(cfg.get("single_thread", False))

    dataset = load_dataset(args.dataset)
    if args.calib:
        from mast3r_slam_tpu.utils.config import read_yaml

        c = read_yaml(args.calib)
        dataset.set_calibration(Intrinsics(
            c["width"], c["height"], c["fx"], c["fy"], c["cx"], c["cy"],
            (c.get("k1", 0), c.get("k2", 0), c.get("p1", 0), c.get("p2", 0),
             c.get("k3", 0)),
        ))
        config["use_calib"] = True
        cfg["use_calib"] = True
    use_calib = bool(cfg.get("use_calib", False)) and dataset.has_calib()

    img_size = int(cfg.get("dataset", {}).get("img_size", 512))
    (h, w), _ = dataset.get_img_shape(img_size)
    # dataset.img_downsample decimates the WORKING per-pixel state (pointmaps,
    # confidences, descriptors — reference mast3r_utils.py:43-52); the model
    # still runs at the full (h, w) crop. Encoder tokens stay at model res.
    ds = int(cfg.get("dataset", {}).get("img_downsample", 1))
    if ds > 1 and ((h // ds) % 16 or (w // ds) % 16):
        raise SystemExit(
            f"dataset.img_downsample={ds} must keep the working resolution "
            f"({h}//{ds}, {w}//{ds}) divisible by the 16px quality patch")
    h_work, w_work = h // ds, w // ds
    n_frames = len(dataset)
    if args.max_frames:
        n_frames = min(n_frames, args.max_frames)
    print(f"dataset: {args.dataset} ({n_frames} frames @ {h}x{w}; "
          f"calib={'on' if use_calib else 'off'})")

    # Remove this run's stale outputs up front so a crash can't leave a mix
    # of old and new artifacts (reference main.py:232-240).
    if getattr(dataset, "save_results", True):
        stale_dir, seq_name = evaluation.prepare_savedir(args.save_as, dataset)
        for stale in (f"{seq_name}.txt", f"{seq_name}.ply",
                      f"{seq_name}_quality.ply"):
            p = stale_dir / stale
            if p.exists():
                p.unlink()

    model, topo = build_model(args, cfg, downsample=ds)
    keyframes = KeyframeBuffer(h_work, w_work, capacity=110,
                               feat_dim=model.cfg.enc_embed_dim,
                               model_hw=(h, w))
    states = States()
    K = None
    if use_calib:
        K = jnp.asarray(dataset.camera_intrinsics.K_frame)
        if ds > 1:
            # rescale intrinsics to the working resolution (the reference
            # leaves K at crop scale — a latent bug in its unused
            # downsample+calib combination that we do not replicate)
            K = K * jnp.asarray([[1.0 / ds], [1.0 / ds], [1.0]])
        keyframes.set_intrinsics(K)

    quality = (AsynchronousQualityService(
                   cfg, device=topo.quality_device).start()
               if cfg.get("quality", {}).get("enabled", True) else None)
    tracker = FrameTracker(model, keyframes, cfg, quality_service=quality)
    refiner = TSDFRefiner(keyframes, cfg, quality_service=quality,
                          device=topo.tsdf_local_device).start()
    graph = FactorGraph(model, keyframes, cfg, K=K, mesh=topo.backend_mesh,
                        home_device=topo.frontend_device
                        if topo.backend_mesh is not None else None)
    head_params, nfeat = None, 256
    if args.retrieval_weights:
        from mast3r_slam_tpu.models.convert import (
            load_params_npz, load_retrieval_checkpoint)

        if args.retrieval_weights.endswith(".npz"):
            head_params = load_params_npz(args.retrieval_weights)
        else:
            head_params, nfeat = load_retrieval_checkpoint(
                args.retrieval_weights)
        print(f"loaded retrieval head: {args.retrieval_weights}")
    retrieval = RetrievalDatabase(cfg, desc_dim=model.cfg.enc_embed_dim,
                                  nfeat=nfeat, head_params=head_params)
    if args.retrieval_codebook:
        from mast3r_slam_tpu.models.convert import load_retrieval_codebook

        retrieval.set_codebook(load_retrieval_codebook(
            args.retrieval_codebook))
        print(f"loaded retrieval codebook: {args.retrieval_codebook} "
              f"({retrieval.codebook.shape[0]} words)")
    tsdf_manager = TSDFGlobalManager(keyframes, cfg).start()
    backend = Backend(model, keyframes, states, graph, retrieval, cfg,
                      tsdf_manager=tsdf_manager)
    if not single_thread:
        backend.start()

    viewer = None
    if not args.no_viz:
        from mast3r_slam_tpu.viz.viewer import Viewer

        viewer = Viewer(keyframes, states, cfg)
        viewer.start()

    # ---------------- frontend loop (reference main.py:325-446) -------------
    i = 0
    fps_t0, fps_i0 = time.time(), 0
    mode = Mode.INIT
    last_T = lie.identity()
    if args.resume:
        from mast3r_slam_tpu.utils.checkpoint import load_state

        i = load_state(args.resume, keyframes, graph)
        if len(keyframes):
            last_T = keyframes.T_WC[len(keyframes) - 1]
            states.set_mode(Mode.TRACKING)
        # Rebuild the retrieval index from the restored keyframes (feat is
        # checkpointed): without this, loop closures / relocalization against
        # pre-checkpoint keyframes would be structurally impossible.
        for kf_i in range(len(keyframes)):
            retrieval.update(keyframes[kf_i], add_after_query=True, k=0,
                             kf_idx=kf_i)
        print(f"resumed from {args.resume}: {len(keyframes)} keyframes "
              f"(re-indexed for retrieval), frame {i}")
    try:
        while i < n_frames:
            while states.paused:  # viewer space-bar (reference WindowMsg)
                time.sleep(0.05)
            mode = states.get_mode()
            ts, img = dataset[i]
            frame = create_frame(i, img, T_WC=last_T, img_size=img_size)

            if mode == Mode.INIT:
                X, C = model.inference_mono(frame)
                frame.update_pointmap(X[0], C[0])
                keyframes.append(frame)
                states.queue_global_optimization(len(keyframes) - 1)
                states.set_mode(Mode.TRACKING)
                states.set_frame(frame)
                i += 1
                continue

            if mode == Mode.TRACKING:
                if args.profile:
                    from mast3r_slam_tpu.utils import tictoc

                    with tictoc.section("tracker.track", sync_device=True):
                        add_new_kf, _, try_reloc = tracker.track(frame)
                else:
                    add_new_kf, _, try_reloc = tracker.track(frame)
                if try_reloc:
                    states.set_mode(Mode.RELOC)
                states.set_frame(frame)
                last_T = frame.T_WC

            elif mode == Mode.RELOC:
                X, C = model.inference_mono(frame)
                frame.update_pointmap(X[0], C[0])
                states.set_frame(frame)
                states.queue_reloc()
                if single_thread:
                    while states.reloc_sem > 0:
                        backend.step()
                add_new_kf = False

            else:  # TERMINATED
                break

            if mode == Mode.TRACKING and add_new_kf:
                keyframes.append(frame)
                new_idx = len(keyframes) - 1
                if getattr(tracker, "last_kf_match", None) is not None:
                    prev_kf, idx_f2k, vmatch, Qk = tracker.last_kf_match
                    states.set_kf_match_hint(prev_kf, new_idx, idx_f2k[0],
                                             vmatch, Qk)
                    tracker.last_kf_match = None
                states.queue_global_optimization(new_idx)
                if refiner.is_alive():  # health gate (reference main.py:403-408)
                    refiner.maybe_schedule_sliding_window(len(keyframes) - 1)

            if single_thread:
                while not backend.idle():
                    if not backend.step():
                        break

            i += 1
            if i % 30 == 0:
                dt = time.time() - fps_t0
                fps = (i - fps_i0) / max(dt, 1e-9)
                rs = refiner.stats
                print(f"frame {i}/{n_frames}  FPS {fps:5.2f}  "
                      f"kfs {len(keyframes)}  edges {graph.n_edges()}  "
                      f"tsdf ok/rej {rs['refined_blocks']}/"
                      f"{rs['rejected_blocks']}")
                fps_t0, fps_i0 = time.time(), i
    except KeyboardInterrupt:
        print("interrupted")

    # ---------------- shutdown protocol (reference main.py:450-569) ---------
    states.set_mode(Mode.TERMINATED)
    if not single_thread:
        # drain remaining backend tasks
        t0 = time.time()
        while not backend.idle() and time.time() - t0 < 60:
            time.sleep(0.1)
        backend.stop()
    refiner.schedule_final_pass(len(keyframes) - 1)
    refiner.drain(
        max_wait_s=float(cfg.get("tsdf_refine", {}).get("max_shutdown_wait_s",
                                                        60)),
        min_wait_s=float(cfg.get("tsdf_refine", {}).get("min_shutdown_wait_s",
                                                        2)),
    )
    refiner.print_stats()
    tsdf_manager.shutdown()
    if quality:
        quality.shutdown()
    if viewer is not None:
        viewer.should_close.set()

    if args.checkpoint:
        from mast3r_slam_tpu.utils.checkpoint import save_state

        save_state(args.checkpoint, keyframes, graph, frame_idx=i)
        print(f"checkpoint → {args.checkpoint}")

    # ---------------- save results (reference main.py:575-596) --------------
    if getattr(dataset, "save_results", True):
        savedir, seq_name = evaluation.prepare_savedir(args.save_as, dataset)
        traj = evaluation.save_traj(savedir, f"{seq_name}.txt",
                                    dataset.timestamps, keyframes)
        evaluation.save_reconstruction(
            savedir, f"{seq_name}.ply", keyframes, conf_threshold=0.0
        )
        evaluation.save_ply_with_quality(
            savedir, f"{seq_name}_quality.ply", keyframes, quality
        )
        evaluation.save_keyframes(savedir, dataset.timestamps, keyframes)
        print(f"saved results → {savedir} (traj: {traj})")
    if args.profile:
        from mast3r_slam_tpu.utils import tictoc

        tictoc.report()
    print("done")
    # summary for callers (tests / dryrun assert on topology + state);
    # CLI invocation ignores it
    return {"keyframes": keyframes, "graph": graph, "topo": topo,
            "frames_processed": i, "quality": quality,
            "tsdf_manager": tsdf_manager, "refiner": refiner}


if __name__ == "__main__":
    main()
