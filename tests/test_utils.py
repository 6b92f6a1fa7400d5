"""Utility coverage: normalizers, phase loader, fft sizing, plotting, history."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from learned_hologram_gan_tpu.utils import (
    amplitude_normalizor,
    complex_plain,
    phase_tensor_generator,
    tensor_normalizor_2d,
    unzip_file,
)
from learned_hologram_gan_tpu.utils.fftlen import is_smooth, next_fast_len
from learned_hologram_gan_tpu.utils.plotting import (
    extract_nested_value,
    save_rgb_image,
    training_process_visualizer,
)

RNG = np.random.default_rng(71)


def test_amplitude_normalizor_headroom():
    amp = jnp.asarray(RNG.random((2, 3, 8, 8)).astype(np.float32) * 5)
    out = np.asarray(amplitude_normalizor(amp))
    # per-channel max lands at exactly 1/1.01 < 1 (acos stays defined)
    np.testing.assert_allclose(out.max(axis=(-2, -1)), 1 / 1.01, rtol=1e-6)


def test_tensor_normalizor_2d_range():
    x = jnp.asarray(RNG.normal(0, 3, (2, 3, 8, 8)).astype(np.float32))
    out = np.asarray(tensor_normalizor_2d(x))
    np.testing.assert_allclose(out.min(axis=(-2, -1)), 0.0, atol=1e-6)
    np.testing.assert_allclose(out.max(axis=(-2, -1)), 1.0, atol=1e-6)


def test_complex_plain():
    amp = jnp.asarray([[2.0]])
    phs = jnp.asarray([[np.pi / 2]])
    c = np.asarray(complex_plain(amp, phs))
    np.testing.assert_allclose(c, [[2j]], atol=1e-6)


def test_phase_tensor_generator_from_image(tmp_path):
    img = (RNG.random((6, 5, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(img).save(p)
    phase = np.asarray(phase_tensor_generator(p))
    assert phase.shape == (3, 6, 5)
    np.testing.assert_allclose(
        phase, np.transpose(img, (2, 0, 1)) / 255.0 * 2 * np.pi, atol=1e-5
    )
    # array passthrough
    arr = jnp.ones((3, 4, 4))
    np.testing.assert_array_equal(np.asarray(phase_tensor_generator(arr)), np.ones((3, 4, 4)))


def test_next_fast_len():
    assert next_fast_len(4968) == 5000  # the 4K Bluestein case
    assert is_smooth(5000)
    assert next_fast_len(1024) == 1024


def test_unzip_file(tmp_path):
    import zipfile

    z = str(tmp_path / "a.zip")
    with zipfile.ZipFile(z, "w") as f:
        f.writestr("inner.txt", "hello")
    unzip_file(z, str(tmp_path / "out"))
    assert open(tmp_path / "out" / "inner.txt").read() == "hello"


def test_save_rgb_image_and_visualizer(tmp_path):
    img = RNG.random((3, 8, 8)).astype(np.float32)
    p = save_rgb_image(img, str(tmp_path), "sample")
    assert os.path.exists(p)

    hist = {
        "n_train": [2, 4, 6],
        "train_losses_tensor": {"G_loss": [3.0, 2.0, 1.0]},
    }
    hp = str(tmp_path / "h.json")
    with open(hp, "w") as f:
        json.dump(hist, f)
    out = training_process_visualizer(
        [hp], ["train_losses_tensor/G_loss"], str(tmp_path / "curve.png")
    )
    assert os.path.exists(out)
    assert extract_nested_value(hist, ["train_losses_tensor", "G_loss"]) == [3.0, 2.0, 1.0]


def test_multi_channel_plotter(tmp_path):
    """Reference utilities.multi_channel_plotter parity (utilities.py:87-176):
    2-D gray save, 3-D RGB composite + per-channel panel, dim validation."""
    from learned_hologram_gan_tpu.utils.plotting import multi_channel_plotter

    rng = np.random.default_rng(0)
    p = multi_channel_plotter(rng.random((8, 8)), title="t2", save_dir=str(tmp_path))
    assert p.endswith("t2_red.png") and os.path.exists(p)
    p = multi_channel_plotter(
        rng.random((1, 3, 8, 8)), title="t3", save_dir=str(tmp_path)
    )
    assert p.endswith("t3.png") and os.path.exists(p)
    assert multi_channel_plotter(rng.random((8, 8))) is None  # no save_dir
    with pytest.raises(ValueError, match="Only 2-D and 3-D"):
        multi_channel_plotter(rng.random((2, 3, 8, 8)), save_dir=str(tmp_path))
    with pytest.raises(ValueError, match="3 channels"):
        multi_channel_plotter(rng.random((4, 8, 8)), save_dir=str(tmp_path))


def test_package_import_honors_explicit_jax_platforms_env():
    """An explicit JAX_PLATFORMS env request must win over any site hook's
    platform pin once the package is imported (the build image's
    sitecustomize pins jax_platforms via config, silently overriding the
    env var — a subprocess launched with JAX_PLATFORMS=cpu then grabs, or
    blocks on, the TPU relay instead of running on CPU)."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "import learned_hologram_gan_tpu, jax; "
         "print([d.platform for d in jax.devices()])"],
        env=env, capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    assert "'cpu'" in out.stdout and "tpu" not in out.stdout.lower()
