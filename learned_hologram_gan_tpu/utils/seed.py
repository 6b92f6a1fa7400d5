"""Reproducibility helpers (reference utilities.set_seed, utilities.py:385-400).

JAX is functional — device randomness is an explicit PRNG key threaded
through the train state, so "determinism" is structural rather than a global
switch.  This helper pins the *host-side* RNGs (numpy shuffling, python
random) and hands back the root JAX key, giving the same
same-seed => same-run guarantee the reference gets from
``torch.manual_seed`` + cudnn-deterministic.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.key(seed)
