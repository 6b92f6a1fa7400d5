"""CLI smoke tests (subprocess, CPU-forced) — flag parity with the reference."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


def _write_bins(tmp_path, n, c, h, w, names=("img", "depth", "amp", "phs")):
    rng = np.random.default_rng(17)
    paths = {}
    for name in names:
        a = rng.random((n, c, h, w)).astype(np.float32)
        p = str(tmp_path / f"{name}.bin")
        a.tofile(p)
        paths[name] = p
    return paths


def test_exr2bin_cli(tmp_path):
    from test_data import write_exr

    root = tmp_path / "root"
    sub = root / "imgs"
    sub.mkdir(parents=True)
    rng = np.random.default_rng(2)
    for i in range(2):
        write_exr(str(sub / f"{i}.exr"), rng.random((3, 6, 6)).astype(np.float32),
                  compression=3)
    r = run_cli(["exr2bin.py", str(root), "--channelsNum", "3",
                 "--height", "6", "--width", "6"])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(root / "imgs.bin")

    # missing-parameter messages match the reference behavior
    r2 = run_cli(["exr2bin.py", str(root)])
    assert r2.returncode == 1
    assert "channelsNum parameter is missing" in r2.stdout


@pytest.mark.slow
def test_generate_poh_cli(tmp_path):
    paths = _write_bins(tmp_path, n=3, c=3, h=32, w=32, names=("img", "depth"))
    poh_out = str(tmp_path / "poh.npy")
    out_dir = str(tmp_path / "recon")
    r = run_cli([
        "generatePOH.py",
        "--img_path", paths["img"], "--depth_path", paths["depth"],
        "--index", "1", "--model_path", str(tmp_path / "missing.msgpack"),
        "--poh_output_path", poh_out,
        "--samplesNum", "3", "--sample_row_num", "32", "--sample_col_num", "32",
        "--pad_size", "8", "--unet_base_features", "2",
        "--propagate", "--num_intervals", "3", "--output_image_dir", out_dir,
    ], timeout=1500)
    assert r.returncode == 0, r.stderr[-2000:]
    poh = np.load(poh_out)
    assert poh.shape == (3, 32, 32)
    assert np.isfinite(poh).all()
    pngs = sorted(os.listdir(out_dir))
    assert pngs == ["0.png", "1.png", "2.png"]


@pytest.mark.slow
def test_training_model_cli(tmp_path):
    h = w = 16
    train = _write_bins(tmp_path / "train", 0, 0, 0, 0) if False else None
    (tmp_path / "train").mkdir()
    (tmp_path / "val").mkdir()
    tr = _write_bins(tmp_path / "train", n=4, c=3, h=h, w=w)
    # validation set must have 100 samples (CLI parity hardcodes samplesNum=100)
    va = _write_bins(tmp_path / "val", n=100, c=3, h=h, w=w)
    r = run_cli([
        "trainingModel.py",
        "--train_img_path", tr["img"], "--train_depth_path", tr["depth"],
        "--train_amp_path", tr["amp"], "--train_phs_path", tr["phs"],
        "--validate_img_path", va["img"], "--validate_depth_path", va["depth"],
        "--validate_amp_path", va["amp"], "--validate_phs_path", va["phs"],
        "--samplesNum", "4", "--channlesNum", "3", "--height", str(h), "--width", str(w),
        "--batch_size", "4", "--epoch_num", "1",
        "--save_path_G", str(tmp_path / "out" / "G.msgpack"),
        "--save_path_D", str(tmp_path / "out" / "D.msgpack"),
        "--loss_metrics_file", str(tmp_path / "out" / "hist.json"),
        "--save_path_img", str(tmp_path / "imgs"),
        "--perceptual", "none", "--unet_base_features", "2",
    ], timeout=3000)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(tmp_path / "out" / "G.msgpack")
    with open(tmp_path / "out" / "hist.json") as f:
        hist = json.load(f)
    assert "train_losses_tensor" in hist


def test_warming_up_asm_example():
    """The educational ASM study (examples/warming_up_asm.py) must pass its
    own assertions: band-limiting wins in the far field, plain ASM accurate
    near field, 2-D band-limit mask changes the far-field recon."""
    r = run_cli(["examples/warming_up_asm.py", "--quick", "--cpu"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "all assertions passed" in r.stdout


def test_warming_up_aperture_example():
    r = run_cli(["examples/warming_up_aperture.py", "--cpu"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "all assertions passed" in r.stdout


@pytest.mark.slow
def test_warming_up_resnet_example():
    r = run_cli(["examples/warming_up_resnet.py", "--cpu", "--steps", "60"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "all assertions passed" in r.stdout


@pytest.mark.slow
def test_finetune_highres_tool(tmp_path):
    """Resolution-transfer workflow (tools/finetune_highres.py): synthesize a
    tiny physically-consistent dataset, fine-tune from random init, and
    evaluate — the same pipeline the 1080p transfer run uses, at smoke shapes."""
    data = tmp_path / "synth"
    r = run_cli([
        "tools/make_synthetic_dataset.py", "--out", str(data),
        "--rows", "32", "--cols", "32", "--pad_size", "8",
        "--train_num", "4", "--val_num", "2", "--batch", "2", "--layers", "4",
    ], timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    out = tmp_path / "ft"
    r = run_cli([
        "tools/finetune_highres.py", "--data", str(data), "--out", str(out),
        "--init", "", "--rows", "32", "--cols", "32", "--pad_size", "8",
        "--train_num", "4", "--val_num", "2", "--batch_size", "2",
        "--epochs", "1", "--distances", "3", "--eval_planes", "3",
        "--unet_base_features", "2", "--dtype", "float32",
    ], timeout=1500)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(out / "generator.msgpack")
    with open(out / "eval" / "summary.json") as f:
        summary = json.load(f)
    assert np.isfinite(summary["val_PSNR"])
    assert len(summary["per_plane_PSNR"]) == 3


@pytest.mark.slow
def test_quality_run_streaming_chunked(tmp_path):
    """The chunked streaming workflow (tools/quality_run.py --streaming
    --start_epoch) end-to-end at smoke shapes: two processes share one
    --out, the second resumes without data replay, and the final eval
    produces finite metrics — the batch-16 quality-run mechanism."""
    data = tmp_path / "synth"
    r = run_cli([
        "tools/make_synthetic_dataset.py", "--out", str(data),
        "--rows", "16", "--cols", "16", "--pad_size", "4",
        "--train_num", "8", "--val_num", "4", "--batch", "4", "--layers", "3",
    ], timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    out = tmp_path / "q"
    common = [
        "tools/quality_run.py", "--out", str(out), "--data", str(data),
        "--rows", "16", "--cols", "16", "--pad_size", "4",
        "--num_planes", "5", "--unet_base_features", "2",
        "--batch_size", "4", "--val_batch", "2", "--train_num", "8",
        "--val_num", "4", "--perceptual", "none", "--dtype", "float32",
        "--skip_stage1", "--skip_stage2", "--streaming",
    ]
    r = run_cli(common + ["--gan_epochs", "1", "--start_epoch", "0",
                          "--skip_eval"], timeout=1500)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(out / "resume" / "history.json") or \
        os.path.exists(out / "generator.msgpack")

    r = run_cli(common + ["--gan_epochs", "2", "--start_epoch", "1"],
                timeout=1500)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Resumed training" in r.stdout
    with open(out / "eval" / "summary.json") as f:
        summary = json.load(f)
    assert np.isfinite(summary["val_PSNR"])
    assert len(summary["per_plane_PSNR"]) == 5
