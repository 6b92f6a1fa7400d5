"""Training state: one pytree holding both networks + optimizers + RNG.

The reference keeps mutable torch Modules and two torch.optim.Adam instances
(watermelon.py:137-138); here the whole training state is a single immutable
pytree threaded through a pure jitted step — checkpointable with Orbax in one
call (optimizer state included, which the reference never persisted).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import DiscriminatorConfig, GeneratorConfig
from ..models import FakeDiscriminator, Generator, WGANGPDiscriminator192
from ..ops import asm


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    key: jax.Array
    params_G: Any
    batch_stats_G: Any
    params_D: Any
    batch_stats_D: Any
    opt_state_G: Any
    opt_state_D: Any
    vgg_params: Any


def build_modules(gen_config: GeneratorConfig, disc_config: DiscriminatorConfig, use_gan: bool):
    generator = Generator(gen_config)
    if use_gan:
        discriminator = WGANGPDiscriminator192(feature_d=disc_config.feature_d)
    else:
        discriminator = FakeDiscriminator(feature_d=disc_config.feature_d)
    return generator, discriminator


def create_train_state(
    seed: int,
    generator: Generator,
    discriminator,
    gen_plan: asm.PropagatorPlan,
    tx_G: optax.GradientTransformation,
    tx_D: optax.GradientTransformation,
    input_shape=(1, 4, 192, 192),
    vgg_params: Any = None,
) -> TrainState:
    key = jax.random.key(seed)
    key, kg, kd = jax.random.split(key, 3)

    rgbd = jnp.zeros(input_shape, dtype=jnp.float32)
    vars_G = generator.init(kg, gen_plan, rgbd, train=True)
    params_G = vars_G["params"]
    batch_stats_G = vars_G.get("batch_stats", {})

    # critic input: one reconstruction (B, 3, H, W)
    recon = jnp.zeros((input_shape[0], 3, input_shape[2], input_shape[3]))
    vars_D = discriminator.init(kd, recon, train=True)
    params_D = vars_D["params"]
    batch_stats_D = vars_D.get("batch_stats", {})

    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        key=key,
        params_G=params_G,
        batch_stats_G=batch_stats_G,
        params_D=params_D,
        batch_stats_D=batch_stats_D,
        opt_state_G=tx_G.init(params_G),
        opt_state_D=tx_D.init(params_D),
        vgg_params=vgg_params,
    )
