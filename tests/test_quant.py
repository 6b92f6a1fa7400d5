"""Post-training int8 UNet quantization (nn/quant.py).

Three layers of evidence:
  1. the quantization arithmetic itself is exact when weights/activations
     already sit on the int8 grid (no rounding -> bit-faithful dequant);
  2. the walker reproduces the float fused path exactly when every conv is
     carved out as float (structure equivalence, independent of scales);
  3. end-to-end on a random-init UNet the int8 output stays within the
     quantization-noise band of the float path (the real-checkpoint quality
     delta is measured separately by tools/eval_quant.py — see BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from learned_hologram_gan_tpu.nn.blocks import UNet
from learned_hologram_gan_tpu.nn.fused_unet import unet_apply_fused
from learned_hologram_gan_tpu.nn.quant import (
    _quantize_act,
    quantize_unet,
    quantized_bytes,
    unet_apply_quant,
)

RNG = np.random.default_rng(7)


def _tiny_unet(base=8, levels=2, hw=16, batch=2):
    unet = UNet(output_channels=6, base_features=base, levels=levels)
    x = jnp.asarray(RNG.random((batch, hw, hw, 4)), jnp.float32)
    variables = unet.init(jax.random.key(0), x, True)
    # BN stats away from the (0, 1) init so the folding legs are exercised
    stats = jax.tree.map(
        lambda a: jnp.asarray(0.25 + 0.5 * RNG.random(a.shape), a.dtype),
        variables["batch_stats"],
    )
    return variables["params"], stats, x


def test_quantize_act_exact_on_grid():
    # values already on the int8 grid round-trip bit-exactly
    scale = jnp.float32(0.037)
    grid = jnp.arange(-127, 128, dtype=jnp.float32)
    xq = _quantize_act(grid * scale, scale)
    np.testing.assert_array_equal(np.asarray(xq, np.int32), np.arange(-127, 128))


def test_float_carveout_matches_fused_path():
    params, stats, x = _tiny_unet()
    # carve EVERY conv out as float -> walker must equal the fused oracle
    all_paths = []
    for name in list(params):
        if name.startswith(("enc_", "dec_")) or name == "bottleneck":
            all_paths += [f"{name}.c0", f"{name}.c1", f"{name}.sc"]
        if name.startswith("ConvTranspose"):
            all_paths.append(name)
    all_paths.append("head")
    qtree = quantize_unet(params, stats, x, float_paths=tuple(all_paths))
    want = np.asarray(unet_apply_fused(params, stats, x), np.float32)
    got = np.asarray(
        unet_apply_quant(qtree, params, stats, x, dtype=jnp.float32),
        np.float32,
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_int8_unet_within_quant_noise():
    params, stats, x = _tiny_unet()
    qtree = quantize_unet(params, stats, x)
    want = np.asarray(unet_apply_fused(params, stats, x), np.float32)
    got = np.asarray(
        unet_apply_quant(qtree, params, stats, x, dtype=jnp.float32),
        np.float32,
    )
    # post-sigmoid outputs in [0, 1]: int8 PTQ noise stays small
    assert np.mean(np.abs(got - want)) < 0.01
    assert np.max(np.abs(got - want)) < 0.12


def test_q8_static_pipeline_within_quant_noise():
    from learned_hologram_gan_tpu.nn.quant import (
        quantize_unet_q8,
        unet_apply_q8,
    )

    for levels in (2, 3):  # 3 exercises the mid-decoder up-conv edges
        params, stats, x = _tiny_unet(levels=levels)
        qtree = quantize_unet_q8(params, stats, x)
        want = np.asarray(unet_apply_fused(params, stats, x), np.float32)
        got = np.asarray(unet_apply_q8(qtree, x), np.float32)
        # every inter-op tensor int8: noise compounds vs the dynamic mode,
        # but post-sigmoid it must stay within the 8-bit band
        assert np.mean(np.abs(got - want)) < 0.02, levels
        assert np.max(np.abs(got - want)) < 0.2, levels


def test_qtree_save_load_roundtrip_bitwise(tmp_path):
    """save_qtree/load_qtree (the serve_poh --quantize int8 deployment
    artifact) must round-trip every leaf bitwise: int8 weight codes, f32
    scales/biases, and the requant edge scalars."""
    from learned_hologram_gan_tpu.nn.quant import (
        load_qtree,
        quantize_unet_q8,
        save_qtree,
        unet_apply_q8,
    )

    params, stats, x = _tiny_unet(levels=2)
    qtree = quantize_unet_q8(params, stats, x)
    path = str(tmp_path / "qtree.npz")
    save_qtree(qtree, path)
    loaded = load_qtree(path)

    assert set(loaded) == set(qtree)
    assert set(loaded["edges"]) == set(qtree["edges"])
    for group, q in qtree.items():
        for leaf, v in q.items():
            got = np.asarray(loaded[group][leaf])
            want = np.asarray(v)
            assert got.dtype == want.dtype, (group, leaf)
            np.testing.assert_array_equal(got, want)
    # and the loaded tree drives the apply identically
    np.testing.assert_array_equal(
        np.asarray(unet_apply_q8(loaded, x)),
        np.asarray(unet_apply_q8(qtree, x)),
    )


def test_q8_int8_tensors_end_to_end():
    # the packed tree really is int8 weights (not a float fallback)
    from learned_hologram_gan_tpu.nn.quant import quantize_unet_q8

    params, stats, x = _tiny_unet()
    qtree = quantize_unet_q8(params, stats, x)
    n_int8 = sum(
        1 for k, q in qtree.items()
        if k != "edges" and q["w"].dtype == jnp.int8
    )
    assert n_int8 == len(qtree) - 1  # every conv/GEMM packed


def test_quantized_bytes_compression():
    params, stats, x = _tiny_unet()
    qtree = quantize_unet(params, stats, x)
    fbytes = sum(
        int(np.prod(a.shape)) * 4
        for a in jax.tree.leaves(params)
    )
    # int8 weights + f32 scales/biases: well under half the f32 tree
    assert quantized_bytes(qtree) < 0.45 * fbytes


def test_calibration_batch_independence():
    # scales come from max-abs: a superset batch can only widen them
    params, stats, x = _tiny_unet(batch=4)
    q_small = quantize_unet(params, stats, x[:1])
    q_big = quantize_unet(params, stats, x)
    for path, q in q_big.items():
        if "xs" in q:
            assert float(q["xs"]) >= float(q_small[path]["xs"]) - 1e-12


def test_generator_apply_quant_rejects_fourier_tree():
    """The quant walker assumes the plain UNet layout; a fourier checkpoint
    must be rejected with a clear error, not a deep KeyError (ADVICE r3)."""
    import pytest

    from learned_hologram_gan_tpu.config import GeneratorConfig
    from learned_hologram_gan_tpu.models import (
        Generator,
        generator_apply_quant,
        make_generator_plan,
    )

    cfg = GeneratorConfig(rows=16, cols=16, pad_size=4, unet_base_features=4)
    gen = Generator(cfg)
    plan = make_generator_plan(cfg)
    rgbd = jnp.zeros((1, 4, 16, 16))
    # a fourier UNet nests ResidualBlocks one level deeper; splice its tree
    # under part1/unet (the guard must fire before anything else is touched)
    funet = UNet(output_channels=6, base_features=4, levels=2, fourier=True)
    fv = funet.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4)), True)
    variables = {"params": {"part1": {"unet": fv["params"]}}}
    with pytest.raises(ValueError, match="standard UNet parameter layout"):
        generator_apply_quant(gen, variables, {}, plan, rgbd)
