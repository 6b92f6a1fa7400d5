"""learned_hologram_gan_tpu — a TPU-native learned-holography framework.

A ground-up JAX / Flax / pjit rebuild with the capabilities of the PyTorch
reference ``WeijieXie/learned_hologram_gan`` (mounted read-only at
``/root/reference``): a two-stage convolutional generator (RGBD -> amplitude/
phase -> phase-only hologram) trained through a differentiable band-limited
angular-spectrum propagator, optionally against a WGAN-GP critic on
multi-plane focal-stack reconstructions.

Layer map (mirrors SURVEY.md section 1, redesigned TPU-first):

=========  ==============================  =====================================
Layer      Here                            Reference equivalent
=========  ==============================  =====================================
ops        ``ops/`` (asm, masks)           angular_spectrum_method.py
nn         ``nn/blocks.py``                neural_network_components.py
models     ``models/``                     watermelon_hologram/{RGBD2AP,AP2POH,
                                           generator,discriminator}.py
losses     ``losses/``                     watermelon_hologram/loss_func.py
data       ``data/``                       data_processor.py + data_loader.py
train      ``train/``                      watermelon_hologram/watermelon.py
parallel   ``parallel/``                   (none in reference — new capability)
utils      ``utils/``                      utilities.py
=========  ==============================  =====================================
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor an EXPLICIT JAX_PLATFORMS environment request even when a site
    # hook has pinned the platform through the jax config (this build
    # image's sitecustomize registers a TPU-relay backend and pins
    # jax_platforms, which silently overrides the env var).  Without this,
    # a subprocess launched with JAX_PLATFORMS=cpu — every CLI test, every
    # CPU smoke — grabs (or blocks on) the relay instead of the CPU.
    # Effective only before the first backend use, which package import
    # always precedes.
    try:
        import jax as _jax

        if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass  # jax unavailable or config API moved: env semantics apply

from . import config
from . import ops
from . import utils

__version__ = "0.1.0"
