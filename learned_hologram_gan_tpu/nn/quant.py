"""Post-training int8 quantization of the eval-mode UNet.

The reference has no quantization story (pure float32 torch,
neural_network_components.py:241-315); serving 8-bit is a TPU-native
capability this framework adds: v5e's MXU runs int8 x int8 -> int32 at 2x
its bf16 rate (394 vs 197 TOPS) and int8 parameters are 4x smaller than f32
on the wire/in HBM (the serving tool already ships u8/u16 *outputs*; this
quantizes the *model*).

Scheme (standard symmetric PTQ):
  * BatchNorm folded into the preceding conv first (exact — the same
    ``fold_conv_bn`` the fused inference path uses), so only convs remain.
  * Weights: per-output-channel symmetric int8 (``scale = max|w| / 127``).
  * Activations: per-tensor symmetric int8, scale calibrated offline as the
    max-abs seen at each conv input over a calibration batch (one float
    forward; no retraining).
  * Compute: int8 x int8 -> int32 on the MXU, dequantized in the conv
    epilogue (XLA fuses the rescale+bias), residual adds / pools / sigmoid
    in the float compute dtype.  In the *dynamic* path (``quantize_unet`` /
    ``unet_apply_quant``) the first conv (raw RGBD input) and the 1x1 head
    (sigmoid input) stay float — the standard PTQ carve-out
    (``_FLOAT_PATHS``).  The *full-integer* path (``quantize_unet_q8`` /
    ``unet_apply_q8``) deliberately drops those carve-outs: every conv,
    stem and head included, is int8 so the inter-op chain stays integer
    end to end; its quality cost is what tools/eval_quant.py measures.

Quality is measured, not assumed: ``tools/eval_quant.py`` re-runs the full
20-plane focal-stack evaluation of BASELINE.md's quality run with the
quantized stage 1 and reports the PSNR/SSIM delta vs the bf16 path.

Structure mirrors :func:`~learned_hologram_gan_tpu.nn.fused_unet.
unet_apply_fused` — one walker parameterized by a conv executor runs both
the calibration pass (float math, records per-tensor max-abs) and the
quantized pass, so the two can never drift apart.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.pallas.conv_block import fold_conv_bn

Dtype = Any

_INT8_MAX = 127.0


# ---------------------------------------------------------------------------
# The structural walker: eval-mode UNet from its param tree, with every conv
# routed through an executor callback.  Mirrors fused_unet.unet_apply_fused
# (and therefore blocks.UNet.__call__ at train=False) op for op.
# ---------------------------------------------------------------------------


def _walk_unet(
    params: Dict,
    batch_stats: Dict,
    x: jnp.ndarray,
    conv: Callable[[str, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    gemm: Callable[[str, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """``conv(path, x, w_folded, b_folded)`` for 3x3/1x1 convs; ``gemm(path,
    x2d, wmat, bias)`` for the pixel-shuffle up-conv GEMMs.  NHWC in/out."""

    def block(name: str, xin: jnp.ndarray) -> jnp.ndarray:
        p, bs = params[name], batch_stats[name]
        w1, b1 = fold_conv_bn(p["Conv_0"], p["BatchNorm_0"], bs["BatchNorm_0"])
        w2, b2 = fold_conv_bn(p["Conv_1"], p["BatchNorm_1"], bs["BatchNorm_1"])
        y = nn.relu(conv(f"{name}.c0", xin, w1, b1))
        y = conv(f"{name}.c1", y, w2, b2)
        sc = conv(f"{name}.sc", xin, p["Conv_2"]["kernel"], p["Conv_2"]["bias"])
        return nn.relu(y + sc)

    def up(name: str, xin: jnp.ndarray) -> jnp.ndarray:
        kernel, bias = params[name]["kernel"], params[name]["bias"]
        n, h, w, cin = xin.shape
        cout = kernel.shape[-1]
        wmat = jnp.transpose(kernel[::-1, ::-1], (2, 0, 1, 3)).reshape(
            cin, 4 * cout
        )
        y = gemm(name, xin, wmat, bias)
        y = y.reshape(n, h, w, 2, 2, cout)
        return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            n, 2 * h, 2 * w, cout
        )

    levels = sum(1 for k in params if k.startswith("enc_"))
    skips = []
    y = x
    for i in range(levels):
        y = block(f"enc_{i}", y)
        skips.append(y)
        y = nn.max_pool(y, (2, 2), strides=(2, 2))
    y = block("bottleneck", y)
    if levels > 1:
        y = up("ConvTranspose_0", y)
    for i in reversed(range(1, levels)):
        y = jnp.concatenate([skips[i], y], axis=-1)
        y = block(f"dec_{i}", y)
        if i > 1:
            y = up(f"ConvTranspose_{levels - i}", y)
    y = up(f"ConvTranspose_{levels - 1}", y)
    y = jnp.concatenate([skips[0], y], axis=-1)
    y = block("dec_0", y)
    head = params["Conv_0"]
    y = conv("head", y, head["kernel"], head["bias"])
    return nn.sigmoid(y)


# ---------------------------------------------------------------------------
# Quantization: calibrate, pack, apply.
# ---------------------------------------------------------------------------

#: conv paths kept in float (standard PTQ carve-outs): the raw-input stem
#: conv and the sigmoid head.  The enc_0 shortcut also sees the raw input.
_FLOAT_PATHS = ("enc_0.c0", "enc_0.sc", "head")


def quantize_unet(
    params: Dict,
    batch_stats: Dict,
    calib_x: jnp.ndarray,
    *,
    float_paths: tuple = _FLOAT_PATHS,
) -> Dict:
    """Calibrate + pack an int8 UNet from a trained eval-mode param tree.

    ``calib_x`` is a representative NHWC input batch (a handful of samples
    suffices for max-abs calibration).  Returns a pytree of device arrays:
    per conv path either ``{"w": int8 (kh,kw,cin,cout), "ws": f32 (cout,),
    "b": f32 (cout,), "xs": f32 ()}`` or ``{"w": f32, "b": f32}`` for the
    float carve-outs; up-conv GEMMs quantize the same way with ``w`` as the
    packed ``(cin, 4*cout)`` matrix.
    """
    absmax: Dict[str, float] = {}
    folded: Dict[str, tuple] = {}

    def conv_calib(path, xin, w, b):
        absmax[path] = max(
            absmax.get(path, 0.0), float(jnp.max(jnp.abs(xin)))
        )
        folded[path] = (w, b)
        return jax.lax.conv_general_dilated(
            xin.astype(jnp.float32), jnp.asarray(w, jnp.float32),
            (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(b, jnp.float32)

    def gemm_calib(path, xin, wmat, bias):
        absmax[path] = max(
            absmax.get(path, 0.0), float(jnp.max(jnp.abs(xin)))
        )
        folded[path] = (wmat, bias)
        y = jnp.dot(xin.astype(jnp.float32), jnp.asarray(wmat, jnp.float32))
        # bias per output channel, repeated over the 4 shuffle phases (the
        # packed columns are ordered (2, 2, cout) with cout fastest, so
        # tile(bias, 4) lines up channel-for-channel)
        return y + jnp.tile(jnp.asarray(bias, jnp.float32), 4)

    _walk_unet(params, batch_stats, calib_x.astype(jnp.float32),
               conv_calib, gemm_calib)

    qtree: Dict[str, Dict] = {}
    for path, (w, b) in folded.items():
        w = jnp.asarray(w, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        if path in float_paths:
            qtree[path] = {"w": w, "b": b}
            continue
        # per-output-channel weight scale (last axis = cout for both the
        # HWIO conv kernels and the packed (cin, 4*cout) GEMM matrices)
        reduce_axes = tuple(range(w.ndim - 1))
        ws = jnp.maximum(
            jnp.max(jnp.abs(w), axis=reduce_axes), 1e-12
        ) / _INT8_MAX
        wq = jnp.clip(jnp.round(w / ws), -_INT8_MAX, _INT8_MAX).astype(
            jnp.int8
        )
        xs = jnp.float32(max(absmax[path], 1e-12) / _INT8_MAX)
        qtree[path] = {"w": wq, "ws": ws, "b": b, "xs": xs}
    return qtree


def _quantize_act(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -_INT8_MAX, _INT8_MAX
    ).astype(jnp.int8)


def unet_apply_quant(
    qtree: Dict,
    params: Dict,
    batch_stats: Dict,
    x: jnp.ndarray,
    *,
    dtype: Dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Eval-mode UNet forward with int8 convs (NHWC in/out).

    ``params`` / ``batch_stats`` provide the tree *structure* (level count,
    up-conv kernels' original layout); all conv/GEMM arithmetic uses the
    packed ``qtree``.  Inter-op tensors stay in ``dtype`` — the int8 win is
    MXU rate + 4x weight bytes; see the module docstring.
    """

    def conv(path, xin, w_unused, b_unused):
        q = qtree[path]
        if "ws" not in q:  # float carve-out
            y = jax.lax.conv_general_dilated(
                xin.astype(dtype), q["w"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + q["b"].astype(dtype)
        xq = _quantize_act(xin, q["xs"])
        y = jax.lax.conv_general_dilated(
            xq, q["w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (q["xs"] * q["ws"]) + q["b"]
        return y.astype(dtype)

    def gemm(path, xin, wmat_unused, bias):
        q = qtree[path]
        if "ws" not in q:
            return (
                jnp.dot(xin.astype(dtype), q["w"].astype(dtype))
                + jnp.tile(q["b"], 4).astype(dtype)
            )
        xq = _quantize_act(xin, q["xs"])
        y = jax.lax.dot_general(
            xq, q["w"],
            (((xin.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (q["xs"] * q["ws"]) + jnp.tile(q["b"], 4)
        return y.astype(dtype)

    return _walk_unet(
        params, batch_stats, x.astype(dtype), conv, gemm
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Full-integer pipeline ("static" int8): activations live in HBM as int8
# between ops, with per-edge scales calibrated offline and folded into the
# consuming conv's weights.
#
# Why: the UNet's hot stages are *bandwidth*-bound at 64 channels (BASELINE.md
# round-3 audit: enc_0/dec_0/up_1 run 4-11x their rooflines from bf16
# half-tile lane waste).  Measured on the chip (tools/probe_int8_conv.py):
# int8 conv -> int32 output buys nothing (0.84-1.01x — the 4-byte write eats
# the MXU gain), but int8 conv with a FUSED requantize epilogue writes int8
# and runs 1.39-1.61x bf16 at exactly those geometries.  So the win requires
# every inter-op tensor to *stay* int8 — this pipeline.
#
# Scale algebra: a conv is linear in its input, so each input edge's scale
# folds into the weights before weight quantization (w~ = w * s_in per input
# channel).  The int32 accumulator then dequantizes by the weight scale
# alone, and concatenated inputs with different branch scales cost nothing:
# the fold is per-input-channel.  Requantization targets each edge's own
# calibrated scale; ReLU folds into the requant clip (post-ReLU tensors are
# non-negative, and max-pool preserves the max of non-negatives, so a pooled
# edge reuses its producer's scale exactly).
# ---------------------------------------------------------------------------


def _edge_scales(params: Dict, in_absmax: Dict, gemm_out_absmax: Dict) -> Dict:
    """Per-tensor int8 scales for every inter-op edge, from calibration.

    Every tensor in the eval UNet is consumed by some conv/GEMM whose input
    max-abs the calibration walker recorded; pooling preserves the max of
    the non-negative block outputs, so consumer-side records equal
    producer-side scales.  Up-conv outputs are only seen concatenated, so
    the calibration records their output max-abs directly.
    """
    levels = sum(1 for k in params if k.startswith("enc_"))
    s = lambda v: max(float(v), 1e-12) / _INT8_MAX  # noqa: E731
    edges = {"in": s(in_absmax["enc_0.c0"])}
    for name in [f"enc_{i}" for i in range(levels)] + ["bottleneck"] + [
        f"dec_{i}" for i in range(levels - 1, -1, -1)
    ]:
        edges[f"{name}.mid"] = s(in_absmax[f"{name}.c1"])  # post-ReLU conv1 out
    for i in range(levels - 1):
        edges[f"enc_{i}.out"] = s(in_absmax[f"enc_{i + 1}.c0"])
    edges[f"enc_{levels - 1}.out"] = s(in_absmax["bottleneck.c0"])
    edges["bottleneck.out"] = s(in_absmax["ConvTranspose_0"])
    for i in range(levels - 1, 0, -1):
        up = f"ConvTranspose_{levels - i}" if i > 1 else f"ConvTranspose_{levels - 1}"
        edges[f"dec_{i}.out"] = s(in_absmax[up])
    edges["dec_0.out"] = s(in_absmax["head"])
    for name, v in gemm_out_absmax.items():
        edges[f"{name}.out"] = s(v)
    return edges


def quantize_unet_q8(
    params: Dict,
    batch_stats: Dict,
    calib_x: jnp.ndarray,
) -> Dict:
    """Calibrate + pack the full-integer ("static") int8 UNet.

    Returns a pytree: per conv path ``{"w": int8, "ws": f32 (cout,),
    "b": f32 (cout,)}`` with every input-edge scale already folded into
    ``w``/``ws``; plus ``"edges"``: the per-tensor requantization scales;
    plus ``"meta"``: {"levels", "skip_channels"} for the apply walker.
    """
    in_absmax: Dict[str, float] = {}
    gemm_out_absmax: Dict[str, float] = {}
    folded: Dict[str, tuple] = {}

    def conv_calib(path, xin, w, b):
        in_absmax[path] = max(
            in_absmax.get(path, 0.0), float(jnp.max(jnp.abs(xin)))
        )
        folded[path] = (np.asarray(w, np.float32), np.asarray(b, np.float32))
        return jax.lax.conv_general_dilated(
            xin.astype(jnp.float32), jnp.asarray(w, jnp.float32),
            (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(b, jnp.float32)

    def gemm_calib(path, xin, wmat, bias):
        in_absmax[path] = max(
            in_absmax.get(path, 0.0), float(jnp.max(jnp.abs(xin)))
        )
        folded[path] = (np.asarray(wmat, np.float32), np.asarray(bias, np.float32))
        y = jnp.dot(xin.astype(jnp.float32), jnp.asarray(wmat, jnp.float32))
        y = y + jnp.tile(jnp.asarray(bias, jnp.float32), 4)
        gemm_out_absmax[path] = max(
            gemm_out_absmax.get(path, 0.0), float(jnp.max(jnp.abs(y)))
        )
        return y

    _walk_unet(params, batch_stats, calib_x.astype(jnp.float32),
               conv_calib, gemm_calib)

    edges = _edge_scales(params, in_absmax, gemm_out_absmax)
    levels = sum(1 for k in params if k.startswith("enc_"))

    def in_edge_scale_vec(path: str, cin: int) -> np.ndarray:
        """Per-input-channel scale vector for a conv/GEMM input edge."""
        block, _, leaf = path.partition(".")
        if path == "enc_0.c0" or path == "enc_0.sc":
            return np.full(cin, edges["in"], np.float32)
        if leaf == "c1":
            return np.full(cin, edges[f"{block}.mid"], np.float32)
        if block.startswith("enc_") and leaf in ("c0", "sc"):
            prev = int(block[4:]) - 1
            return np.full(cin, edges[f"enc_{prev}.out"], np.float32)
        if block == "bottleneck":
            return np.full(cin, edges[f"enc_{levels - 1}.out"], np.float32)
        if block.startswith("dec_") and leaf in ("c0", "sc"):
            i = int(block[4:])
            skip_scale = edges[f"enc_{i}.out"]
            up = ("ConvTranspose_0" if i == levels - 1
                  else f"ConvTranspose_{levels - 1 - i}")
            up_scale = edges[f"{up}.out"]
            c_up = cin // 2  # decoder concats are half skip, half up
            return np.concatenate([
                np.full(cin - c_up, skip_scale, np.float32),
                np.full(c_up, up_scale, np.float32),
            ])
        if path == "head":
            return np.full(cin, edges["dec_0.out"], np.float32)
        if path.startswith("ConvTranspose_"):
            k = int(path.split("_")[1])
            src = ("bottleneck" if k == 0
                   else f"dec_{levels - k}" if k < levels - 1
                   else "dec_1")
            return np.full(cin, edges[f"{src}.out"], np.float32)
        raise KeyError(path)

    # Edge scales ship as jnp scalars (pure multiplicands — safe to trace
    # when the qtree rides through jit as an argument); the level count is
    # recovered from the static tree *structure* by the apply fn.
    qtree: Dict[str, Any] = {
        "edges": {k: jnp.float32(v) for k, v in edges.items()}
    }
    for path, (w, b) in folded.items():
        cin_axis = w.ndim - 2  # HWIO convs: axis 2; (cin, 4cout) GEMMs: axis 0
        cin = w.shape[cin_axis]
        svec = in_edge_scale_vec(path, cin)
        w_t = w * svec.reshape(
            tuple(cin if a == cin_axis else 1 for a in range(w.ndim))
        )
        ws = np.maximum(
            np.max(np.abs(w_t), axis=tuple(range(w.ndim - 1))), 1e-30
        ) / _INT8_MAX
        wq = np.clip(np.round(w_t / ws), -_INT8_MAX, _INT8_MAX).astype(np.int8)
        qtree[path] = {
            "w": jnp.asarray(wq),
            "ws": jnp.asarray(ws, jnp.float32),
            "b": jnp.asarray(b, jnp.float32),
        }
    return qtree


def unet_apply_q8(qtree: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Eval-mode UNet forward, full-integer int8 pipeline (NHWC in/out).

    Self-contained: structure and scales all come from ``qtree``
    (:func:`quantize_unet_q8`).  Inter-op tensors are int8 in HBM; convs run
    int8 x int8 -> int32 on the MXU with the dequant/bias/ReLU/requant chain
    fused into the epilogue (the measured 1.4-1.6x win at the 384^2
    stages).  Output is float (post-sigmoid).
    """
    edges = qtree["edges"]
    levels = sum(1 for k in qtree if k.endswith(".c0") and k.startswith("enc_"))

    def requant(v: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip(
            jnp.round(v * (1.0 / scale)), -_INT8_MAX, _INT8_MAX
        ).astype(jnp.int8)

    def qconv(path: str, xq: jnp.ndarray) -> jnp.ndarray:
        q = qtree[path]
        y = jax.lax.conv_general_dilated(
            xq, q["w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.float32) * q["ws"] + q["b"]

    def block(name: str, xq: jnp.ndarray) -> jnp.ndarray:
        y1 = requant(nn.relu(qconv(f"{name}.c0", xq)), edges[f"{name}.mid"])
        y2 = qconv(f"{name}.c1", y1)
        sc = qconv(f"{name}.sc", xq)
        return requant(nn.relu(y2 + sc), edges[f"{name}.out"])

    def up(name: str, xq: jnp.ndarray) -> jnp.ndarray:
        q = qtree[name]
        n, h, w, cin = xq.shape
        cout = q["w"].shape[-1] // 4
        y = jax.lax.dot_general(
            xq, q["w"], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * q["ws"] + jnp.tile(q["b"], 4)
        y = requant(y, edges[f"{name}.out"])
        y = y.reshape(n, h, w, 2, 2, cout)
        return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            n, 2 * h, 2 * w, cout
        )

    def pool(xq: jnp.ndarray) -> jnp.ndarray:
        # reduce-window max on the int8 codes == pooled tensor's own codes
        # (monotone; post-ReLU scale preserved — see _edge_scales).  Explicit
        # integer init: flax max_pool's -inf initializer is float-only.
        return jax.lax.reduce_window(
            xq, jnp.int8(-128), jax.lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
        )

    xq = requant(x.astype(jnp.float32), edges["in"])
    skips = []
    y = xq
    for i in range(levels):
        y = block(f"enc_{i}", y)
        skips.append(y)
        y = pool(y)
    y = block("bottleneck", y)
    if levels > 1:
        y = up("ConvTranspose_0", y)
    for i in reversed(range(1, levels)):
        y = jnp.concatenate([skips[i], y], axis=-1)
        y = block(f"dec_{i}", y)
        if i > 1:
            y = up(f"ConvTranspose_{levels - i}", y)
    y = up(f"ConvTranspose_{levels - 1}", y)
    y = jnp.concatenate([skips[0], y], axis=-1)
    y = block("dec_0", y)
    return nn.sigmoid(qconv("head", y))


def quantized_bytes(qtree: Dict) -> int:
    """Total parameter bytes of the packed tree (the 4x-compression claim)."""
    return sum(
        int(np.prod(v.shape)) * v.dtype.itemsize
        for q in qtree.values()
        for v in q.values()
    )


def save_qtree(qtree: Dict, path: str) -> None:
    """Persist a :func:`quantize_unet_q8` tree as a flat ``.npz``.

    Lets a server load the committed quantized model (int8 weights + f32
    scales/biases + requant edge scales) without re-running calibration —
    the deployment artifact `tools/serve_poh.py --quantize int8` consumes.
    Keys: ``edges/<name>`` scalars and ``<conv path>/{w,ws,b}`` arrays.
    """
    flat = {f"edges/{k}": np.asarray(v) for k, v in qtree["edges"].items()}
    for path_key, q in qtree.items():
        if path_key == "edges":
            continue
        for leaf, v in q.items():
            flat[f"{path_key}/{leaf}"] = np.asarray(v)
    np.savez(path, **flat)


def load_qtree(path: str) -> Dict:
    """Inverse of :func:`save_qtree`: rebuild the jnp qtree from ``.npz``."""
    with np.load(path) as z:
        qtree: Dict[str, Any] = {"edges": {}}
        for key in z.files:
            group, _, leaf = key.partition("/")
            if group == "edges":
                qtree["edges"][leaf] = jnp.float32(z[key])
            else:
                qtree.setdefault(group, {})[leaf] = jnp.asarray(z[key])
    return qtree
