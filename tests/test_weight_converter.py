"""Reference-checkpoint converter: structural + value-placement validation.

Synthesizes a torch state_dict with the reference's exact key names/shapes
(derived from neural_network_components.py:241-315, AP2POH.py:63-65,
discriminator.py:5-51), converts it, and checks (1) the result loads
strictly against our model's parameter template (flax from_bytes validates
every name and shape) and (2) distinctive values land in the right leaves.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import serialization

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from convert_reference_weights import (  # noqa: E402
    convert_discriminator,
    convert_generator,
)

from learned_hologram_gan_tpu.config import GeneratorConfig  # noqa: E402
from learned_hologram_gan_tpu.models import (  # noqa: E402
    Generator,
    WGANGPDiscriminator192,
    make_generator_plan,
)


def _t(*shape, fill=None):
    if fill is None:
        return torch.randn(*shape)
    return torch.full(shape, float(fill))


def _res_block(sd, prefix, cin, cout, with_1x1=True):
    sd[prefix + ".convolution_layer_1.weight"] = _t(cout, cin, 3, 3)
    sd[prefix + ".convolution_layer_1.bias"] = _t(cout)
    sd[prefix + ".convolution_layer_2.weight"] = _t(cout, cout, 3, 3)
    sd[prefix + ".convolution_layer_2.bias"] = _t(cout)
    if with_1x1:
        sd[prefix + ".convolution_layer_3.weight"] = _t(cout, cin, 1, 1)
        sd[prefix + ".convolution_layer_3.bias"] = _t(cout)
    for bn in (".batch_norm_layer_1", ".batch_norm_layer_2"):
        sd[prefix + bn + ".weight"] = _t(cout)
        sd[prefix + bn + ".bias"] = _t(cout)
        sd[prefix + bn + ".running_mean"] = _t(cout)
        sd[prefix + bn + ".running_var"] = torch.abs(_t(cout)) + 0.5


def make_reference_generator_state_dict():
    """Reference Generator state_dict (UNet(6) on 4-ch input + 3 symmetric convs)."""
    sd = {}
    u = "part1.part1."
    chans = [(4, 64), (64, 128), (128, 256), (256, 512)]
    for i, (cin, cout) in enumerate(chans):
        _res_block(sd, f"{u}encoder{i+1}.{0 if i == 0 else 1}.0", cin, cout)
    _res_block(sd, u + "bottleneck.1.0", 512, 1024)
    sd[u + "bottleneck.2.weight"] = _t(1024, 512, 2, 2)
    sd[u + "bottleneck.2.bias"] = _t(512)
    dec = [(1024, 512, 256), (512, 256, 128), (256, 128, 64)]
    for j, (cin, cout, up) in enumerate(dec, start=1):
        _res_block(sd, f"{u}decoder{j}.0.0", cin, cout)
        sd[f"{u}decoder{j}.1.weight"] = _t(cout, up, 2, 2)
        sd[f"{u}decoder{j}.1.bias"] = _t(up)
    _res_block(sd, u + "decoder4.0", 128, 64)
    sd[u + "final_layer.0.weight"] = _t(6, 64, 1, 1)
    sd[u + "final_layer.0.bias"] = _t(6)
    for c in "rgb":
        sd[f"part2.part1.conv_{c}.params"] = _t(3)
        sd[f"part2.part1.conv_{c}.bias"] = _t(1)
    return sd


@pytest.mark.slow
def test_generator_conversion_loads_strictly_and_runs():
    sd = make_reference_generator_state_dict()
    # distinctive values for placement checks
    sd["part1.part1.encoder1.0.0.convolution_layer_1.weight"][0, 1, 2, 0] = 42.0
    sd["part2.part1.conv_g.params"][1] = 7.0

    params, stats = convert_generator(sd)
    blob = serialization.to_bytes({"params": params, "batch_stats": stats})

    cfg = GeneratorConfig(rows=32, cols=32, pad_size=8, unet_base_features=64)
    gen = Generator(cfg)
    plan = make_generator_plan(cfg)
    template = gen.init(jax.random.key(0), plan, jnp.ones((1, 4, 32, 32)))
    loaded = serialization.from_bytes(
        {"params": template["params"], "batch_stats": template["batch_stats"]}, blob
    )

    # placement: torch OIHW (o=0, i=1, kh=2, kw=0) -> flax HWIO [2, 0, 1, 0]
    k = np.asarray(loaded["params"]["part1"]["unet"]["enc_0"]["Conv_0"]["kernel"])
    assert k[2, 0, 1, 0] == 42.0
    rw = np.asarray(
        loaded["params"]["part2"]["modulation"]["conv_g"]["radial_weights"]
    )
    assert rw[1] == 7.0

    # converted weights drive a real forward pass
    poh = gen.apply(
        {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
        plan, jnp.ones((1, 4, 32, 32)), train=False,
    )
    assert poh.shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(poh)).all()


def make_reference_discriminator_state_dict(feature_d=32):
    sd = {}
    sd["block1.0.weight"] = _t(feature_d, 3, 3, 3)
    sd["block1.0.bias"] = _t(feature_d)
    c = feature_d
    for i in range(2, 7):
        sd[f"block{i}.0.weight"] = _t(c * 2, c, 3, 3)
        sd[f"block{i}.0.bias"] = _t(c * 2)
        sd[f"block{i}.1.weight"] = _t(c * 2)
        sd[f"block{i}.1.bias"] = _t(c * 2)
        sd[f"block{i}.1.running_mean"] = _t(c * 2)
        sd[f"block{i}.1.running_var"] = torch.abs(_t(c * 2)) + 0.5
        c *= 2
    sd["conv.weight"] = _t(1, c, 3, 3)
    sd["conv.bias"] = _t(1)
    return sd


def test_discriminator_conversion_loads_strictly():
    sd = make_reference_discriminator_state_dict(feature_d=4)
    params, stats = convert_discriminator(sd)
    blob = serialization.to_bytes({"params": params, "batch_stats": stats})

    d = WGANGPDiscriminator192(feature_d=4)
    template = d.init(jax.random.key(0), jnp.ones((1, 3, 32, 32)))
    loaded = serialization.from_bytes(
        {"params": template["params"], "batch_stats": template["batch_stats"]}, blob
    )
    out = d.apply(
        {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
        jnp.ones((2, 3, 32, 32)), train=False,
    )
    assert out.shape == (2, 16)
