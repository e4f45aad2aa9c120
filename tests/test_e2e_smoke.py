"""End-to-end smoke test: the full CLI pipeline on a synthetic dataset.

Runs ``main.main()`` with a tiny model preset over a handful of synthetic
TUM-format frames on the CPU mesh — exercising dataset ingestion, mono init,
tracking, keyframing, the backend factor graph + retrieval + global BA,
quality service, TSDF refiner scheduling, shutdown, and result export.
Geometry is meaningless with random weights; the test checks the system runs
end-to-end, stays alive, and produces well-formed outputs.
"""

import os
import pathlib

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_tum_freiburg1")
    (root / "rgb").mkdir()
    import cv2

    rng = np.random.default_rng(0)
    base = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
    rows = []
    for i in range(6):
        img = np.roll(base, shift=4 * i, axis=1)  # synthetic "camera pan"
        cv2.imwrite(str(root / "rgb" / f"{i:04d}.png"), img)
        rows.append(f"{1e9 + i / 30.0:.6f} rgb/{i:04d}.png")
    (root / "rgb.txt").write_text("# ts file\n" + "\n".join(rows) + "\n")
    return root


@pytest.fixture(scope="module")
def tiny_config_file(tmp_path_factory):
    cfgdir = tmp_path_factory.mktemp("cfg")
    repo = pathlib.Path(__file__).resolve().parents[1]
    cfg = {
        "inherit": str(repo / "config" / "base.yaml"),
        "single_thread": True,
        "dataset": {"img_size": 96},  # 64x96 crops keep CPU compiles fast
        "model": {"preset": "tiny"},
        "tracking": {"min_match_frac": 0.0, "match_frac_thresh": 0.9,
                     "Q_conf": 0.0, "max_iters": 3},
        "local_opt": {"min_match_frac": 0.0, "Q_conf": 0.0, "max_iters": 2},
        "matching": {"max_iter": 2, "radius": 1, "dilation_max": 1},
        "tsdf_refine": {"enabled": True, "window_size": 1, "ray_samples": 8,
                        "max_grid_dim": 16},
        "tsdf_global": {"enabled": True, "samples_per_kf": 64,
                        "max_points_per_kf": 256, "table_capacity": 65536},
    }
    path = cfgdir / "tiny.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return path


def test_main_end_to_end(synth_dataset, tiny_config_file, tmp_path,
                         monkeypatch):
    import main as cli

    monkeypatch.chdir(tmp_path)
    cli.main([
        "--dataset", str(synth_dataset),
        "--config", str(tiny_config_file),
        "--no-viz",
        "--save-as", "smoke",
        "--max-frames", "6",
    ])

    out = pathlib.Path("logs") / "smoke" / synth_dataset.name
    traj = out / f"{synth_dataset.name}.txt"
    assert traj.exists(), "trajectory file missing"
    rows = [l for l in traj.read_text().splitlines() if l.strip()]
    assert len(rows) >= 1
    vals = [float(v) for v in rows[0].split()]
    assert len(vals) == 8  # TUM format t x y z qx qy qz qw
    assert np.isfinite(vals).all()

    ply = out / f"{synth_dataset.name}.ply"
    assert ply.exists() and ply.stat().st_size > 100
    qply = out / f"{synth_dataset.name}_quality.ply"
    assert qply.exists()
    header = qply.read_bytes()[:400].decode("ascii", "ignore")
    assert "property float priority" in header
    assert (out / "keyframes").exists()


def test_main_end_to_end_calibrated(synth_dataset, tiny_config_file, tmp_path,
                                    monkeypatch):
    """The calibrated pipeline (constrain-to-ray, calib GN, K rescaling)."""
    import yaml

    import main as cli

    cfg = yaml.safe_load(tiny_config_file.read_text())
    cfg["use_calib"] = True
    calib_cfg = tiny_config_file.parent / "tiny_calib.yaml"
    calib_cfg.write_text(yaml.safe_dump(cfg))
    intr = tiny_config_file.parent / "intr.yaml"
    intr.write_text(yaml.safe_dump({
        "width": 640, "height": 480, "fx": 500.0, "fy": 500.0,
        "cx": 320.0, "cy": 240.0,
    }))

    monkeypatch.chdir(tmp_path)
    cli.main([
        "--dataset", str(synth_dataset),
        "--config", str(calib_cfg),
        "--calib", str(intr),
        "--no-viz", "--save-as", "smoke_calib", "--max-frames", "4",
    ])
    out = pathlib.Path("logs") / "smoke_calib" / synth_dataset.name
    assert (out / f"{synth_dataset.name}.txt").exists()


def test_main_end_to_end_threaded(synth_dataset, tiny_config_file, tmp_path,
                                  monkeypatch):
    """Threaded mode: backend runs as a live thread concurrent with the
    frontend loop (single_thread: false) — exercises the async drain path."""
    import yaml

    import main as cli

    cfg = yaml.safe_load(tiny_config_file.read_text())
    cfg["single_thread"] = False
    threaded_cfg = tiny_config_file.parent / "tiny_threaded.yaml"
    threaded_cfg.write_text(yaml.safe_dump(cfg))

    monkeypatch.chdir(tmp_path)
    cli.main([
        "--dataset", str(synth_dataset),
        "--config", str(threaded_cfg),
        "--no-viz", "--save-as", "smoke_threaded", "--max-frames", "5",
    ])
    out = pathlib.Path("logs") / "smoke_threaded" / synth_dataset.name
    assert (out / f"{synth_dataset.name}.txt").exists()


def test_main_with_retrieval_artifacts(synth_dataset, tiny_config_file,
                                       tmp_path, monkeypatch):
    """--retrieval-weights / --retrieval-codebook load converted artifacts
    and the pipeline runs with the pretrained-head retrieval path active
    (reference: mast3r_utils.py:24-31 loads head + codebook at startup)."""
    import main as cli
    from mast3r_slam_tpu.models.convert import save_params_npz

    rng = np.random.default_rng(9)
    D = 64  # tiny preset enc_embed_dim
    head = {
        "prewhiten_m": rng.normal(size=D).astype(np.float32) * 0.1,
        "prewhiten_P": np.eye(D, dtype=np.float32)
        + 0.05 * rng.normal(size=(D, D)).astype(np.float32),
        "postwhiten_m": np.zeros(D, np.float32),
        "postwhiten_P": np.eye(D, dtype=np.float32),
        "projector": [
            {"w": np.eye(D, dtype=np.float32)
             + 0.05 * rng.normal(size=(D, D)).astype(np.float32),
             "b": np.zeros(D, np.float32)},
        ],
        "residual": True,
    }
    head_npz = tmp_path / "retrieval_head.npz"
    save_params_npz(head, head_npz)
    cb = rng.normal(size=(32, D)).astype(np.float32)
    cb /= np.linalg.norm(cb, axis=-1, keepdims=True)
    cb_npy = tmp_path / "codebook.npy"
    np.save(cb_npy, cb)

    monkeypatch.chdir(tmp_path)
    cli.main([
        "--dataset", str(synth_dataset), "--config", str(tiny_config_file),
        "--no-viz", "--save-as", "smoke_retrieval", "--max-frames", "5",
        "--retrieval-weights", str(head_npz),
        "--retrieval-codebook", str(cb_npy),
    ])
    out = pathlib.Path("logs") / "smoke_retrieval" / synth_dataset.name
    assert (out / f"{synth_dataset.name}.txt").exists()


def test_main_checkpoint_resume_roundtrip(synth_dataset, tiny_config_file,
                                          tmp_path, monkeypatch):
    """--checkpoint writes a snapshot; --resume restores and continues."""
    import main as cli

    monkeypatch.chdir(tmp_path)
    ckpt = tmp_path / "state.npz"
    cli.main([
        "--dataset", str(synth_dataset), "--config", str(tiny_config_file),
        "--no-viz", "--save-as", "ck1", "--max-frames", "3",
        "--checkpoint", str(ckpt),
    ])
    assert ckpt.exists() and ckpt.stat().st_size > 1000
    cli.main([
        "--dataset", str(synth_dataset), "--config", str(tiny_config_file),
        "--no-viz", "--save-as", "ck2", "--resume", str(ckpt),
    ])
    out = pathlib.Path("logs") / "ck2" / synth_dataset.name
    assert (out / f"{synth_dataset.name}.txt").exists()


def test_ate_rmse_self():
    """ATE of a trajectory against itself (after Sim3 alignment) is ~0, and a
    known rigid offset is recovered by alignment."""
    from mast3r_slam_tpu import evaluation as ev

    rng = np.random.default_rng(1)
    ts = np.arange(50, dtype=np.float64) / 10
    pts = np.cumsum(rng.normal(size=(50, 3)) * 0.05, axis=0)
    qs = np.tile([0, 0, 0, 1.0], (50, 1))

    def write(path, offset=0.0, scale=1.0):
        with open(path, "w") as f:
            for t, p, q in zip(ts, pts * scale + offset, qs):
                f.write(f"{t} {p[0]} {p[1]} {p[2]} {q[0]} {q[1]} {q[2]} {q[3]}\n")

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        gt = os.path.join(d, "gt.txt")
        est = os.path.join(d, "est.txt")
        write(gt)
        write(est, offset=np.array([1.0, -2.0, 0.5]), scale=1.7)
        res = ev.ate_rmse(gt, est, align=True, scale=True)
        assert res["rmse"] < 1e-6
        assert res["n_pairs"] == 50


def test_weights_pth_to_npz_to_cli(synth_dataset, tiny_config_file, tmp_path,
                                   monkeypatch):
    """Reference-format .pth → load_checkpoint → save_params_npz →
    ``main.py --weights`` runs end-to-end (the full weight-ingestion path a
    user of the reference checkpoint would take; mast3r_utils.py:14-31)."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from tests.test_convert import synthetic_torch_state_dict
    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.models.convert import (load_checkpoint,
                                                save_params_npz)
    import main as cli

    cfg = M.tiny_config()
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in synthetic_torch_state_dict(cfg).items()}
    pth = tmp_path / "tiny_reference_format.pth"
    torch.save({"model": sd, "args": {}}, pth)

    params = load_checkpoint(pth, enc_depth=cfg.enc_depth,
                             dec_depth=cfg.dec_depth)
    npz = tmp_path / "tiny_converted.npz"
    save_params_npz(params, npz)

    monkeypatch.chdir(tmp_path)
    cli.main([
        "--dataset", str(synth_dataset),
        "--config", str(tiny_config_file),
        "--no-viz",
        "--save-as", "pth_roundtrip",
        "--weights", str(npz),
        "--max-frames", "4",
    ])
    out = pathlib.Path("logs") / "pth_roundtrip" / synth_dataset.name
    traj = out / f"{synth_dataset.name}.txt"
    assert traj.exists()
    rows = [l for l in traj.read_text().splitlines() if l.strip()]
    assert rows and np.isfinite([float(v) for v in rows[0].split()]).all()


def test_main_end_to_end_downsampled(synth_dataset, tiny_config_file,
                                     tmp_path, monkeypatch):
    """dataset.img_downsample=2 runs the whole pipeline at the decimated
    working resolution (pointmaps/matcher/BA/TSDF at (H/2, W/2); model at
    the full crop) — reference mast3r_utils.py:43-52 semantics."""
    import yaml

    import main as cli

    cfg = yaml.safe_load(tiny_config_file.read_text())
    cfg.setdefault("dataset", {})["img_downsample"] = 2
    ds_cfg = tiny_config_file.parent / "tiny_ds.yaml"
    ds_cfg.write_text(yaml.safe_dump(cfg))

    monkeypatch.chdir(tmp_path)
    cli.main([
        "--dataset", str(synth_dataset),
        "--config", str(ds_cfg),
        "--no-viz",
        "--save-as", "smoke_ds",
        "--max-frames", "6",
    ])
    out = pathlib.Path("logs") / "smoke_ds" / synth_dataset.name
    traj = out / f"{synth_dataset.name}.txt"
    assert traj.exists()
    vals = [float(v)
            for v in traj.read_text().splitlines()[0].split()]
    assert len(vals) == 8 and np.isfinite(vals).all()
    assert (out / f"{synth_dataset.name}.ply").stat().st_size > 100


def test_main_long_chain_pipeline(tiny_config_file, tmp_path_factory,
                                  tmp_path, monkeypatch):
    """36-frame CLI run: the PIPELINE-level chain regression.

    Chain-dynamics bugs are invisible to short runs — the quaternion-norm
    explosion (ops/lie.py) only fired after ~33 frames of the tracker's
    per-frame compose/inv chain, which this run crosses through the real
    FrameTracker/pipeline code path. Asserts every exported pose is finite
    with a unit quaternion."""
    import cv2

    import main as cli

    root = tmp_path_factory.mktemp("synth_long")
    (root / "rgb").mkdir()
    rng = np.random.default_rng(1)
    base = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
    rows = []
    n_frames = 36
    for i in range(n_frames):
        img = np.roll(base, shift=3 * i, axis=1)
        cv2.imwrite(str(root / "rgb" / f"{i:04d}.png"), img)
        rows.append(f"{1e9 + i / 30.0:.6f} rgb/{i:04d}.png")
    (root / "rgb.txt").write_text("# ts file\n" + "\n".join(rows) + "\n")

    monkeypatch.chdir(tmp_path)
    cli.main([
        "--dataset", str(root),
        "--config", str(tiny_config_file),
        "--no-viz",
        "--save-as", "longchain",
        "--max-frames", str(n_frames),
    ])
    traj = pathlib.Path("logs") / "longchain" / root.name / f"{root.name}.txt"
    assert traj.exists()
    vals = np.asarray([[float(v) for v in l.split()]
                       for l in traj.read_text().splitlines() if l.strip()])
    assert vals.shape[1] == 8
    assert np.isfinite(vals).all()
    qn = np.linalg.norm(vals[:, 4:8], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)
