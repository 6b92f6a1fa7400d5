"""Golden regression vs the reference repo's checked-in outputs.

The reference ships the outputs of its README example run
(/root/reference/output/test_output/terminalTest/: ``poh.pt`` + 10
reconstruction PNGs, produced by ``generatePOH.py --propagate
--num_intervals 10`` with the CLI defaults: 384x384, pad 320,
filter_radius_coefficient 0.35, wavelengths [638, 520, 450] nm, distances
linspace(4e-4, 10e-4, 10); reference generatePOH.py:50-79, README.md:121-156).

Reproducing ``poh.pt`` itself needs the pretrained generator weights (gdown
download — not mounted), but the PNGs are a pure function of ``poh.pt``
through the multi-distance propagator + per-channel min-max normalization +
8-bit image dump: running OUR pipeline from the golden POH must reproduce the
golden PNGs to quantization tolerance.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = "/root/reference/output/test_output/terminalTest"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN_DIR, "poh.pt")),
    reason="reference golden outputs not mounted",
)


@pytest.fixture(scope="module")
def golden_poh():
    return torch.load(os.path.join(GOLDEN_DIR, "poh.pt"), map_location="cpu").numpy()


def test_focal_stack_reconstruction_matches_golden_pngs(golden_poh, tmp_path):
    from PIL import Image
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.config import OpticsConfig
    from learned_hologram_gan_tpu.ops import asm
    from learned_hologram_gan_tpu.utils import tensor_normalizor_2d
    from learned_hologram_gan_tpu.utils.plotting import multi_sample_plotter

    optics = OpticsConfig(
        rows=384, cols=384, pad_size=320,
        filter_radius_coefficient=0.35,           # generatePOH.py:133-137
        pixel_pitch=3.74e-6,
        wavelengths=(638e-9, 520e-9, 450e-9),
    )
    distances = np.linspace(4e-4, 10e-4, 10)       # generatePOH.py:57-60
    plan = asm.make_plan(optics, distances=distances)

    poh = jnp.asarray(golden_poh)[None]            # (1, 3, 384, 384)
    amp = asm.propagate_batch_multi(plan, jnp.ones_like(poh), poh)
    imgs = np.asarray(tensor_normalizor_2d(amp))   # (10, 3, 384, 384) in [0,1]

    paths = multi_sample_plotter(imgs, save_dir=str(tmp_path))

    for i in range(10):
        golden = np.asarray(
            Image.open(os.path.join(GOLDEN_DIR, f"{i}.png")).convert("RGB"),
            dtype=np.float32,
        ) / 255.0
        ours = np.asarray(Image.open(paths[i]).convert("RGB"), dtype=np.float32) / 255.0
        assert golden.shape == ours.shape == (384, 384, 3)
        diff = np.abs(golden - ours)
        # 8-bit quantization + complex64-vs-torch rounding: all but a handful
        # of pixels must agree within 2/255, and the mean error must be tiny.
        assert np.mean(diff) < 1e-3, f"image {i}: mean diff {np.mean(diff)}"
        assert np.quantile(diff, 0.999) <= 2.5 / 255.0, (
            f"image {i}: p99.9 diff {np.quantile(diff, 0.999)}"
        )
