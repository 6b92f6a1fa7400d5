#!/usr/bin/env python
"""Probe: int8 vs bf16 conv throughput at the UNet's lane-waste stages.

The round-3 per-stage audit (tools/profile_unet.py, BASELINE.md) found the
384^2 64-channel stages (enc_0, dec_0, up_1, head) running 4-11x their paper
rooflines from bf16 half-tile lane waste, and every *structural* fix lost to
XLA's emitter.  This probe prices the remaining orthogonal lever: dtype.
v5e's MXU does int8 at 2x its bf16 rate (394 vs 197 TOPS) and int8 halves
the HBM bytes of every activation read/write, so if XLA lowers
int8xint8->int32 convs onto the MXU cleanly these stages could halve.

Run on the real chip:  python tools/probe_int8_conv.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def fetch(x):
    return float(jnp.sum(x[..., ::64, ::64].astype(jnp.float32)))


def time_fn(fn, *args, reps=20):
    fetch(fn(*args))
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / reps * 1e3


def conv(x, w, out_dtype):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def main():
    rng = np.random.default_rng(0)
    batch = 16
    cases = [
        ("enc_0 conv2 384^2 64->64", (batch, 384, 384, 64), (3, 3, 64, 64)),
        ("dec_0 conv1 384^2 128->64", (batch, 384, 384, 128), (3, 3, 128, 64)),
        ("enc_1 192^2 64->128", (batch, 192, 192, 64), (3, 3, 64, 128)),
        ("head 384^2 64->6", (batch, 384, 384, 64), (1, 1, 64, 6)),
    ]
    print(f"devices: {jax.devices()}")
    for name, xs, ws in cases:
        x_f = rng.standard_normal(xs).astype(np.float32)
        w_f = rng.standard_normal(ws).astype(np.float32) * 0.1
        x_bf = jnp.asarray(x_f, jnp.bfloat16)
        w_bf = jnp.asarray(w_f, jnp.bfloat16)
        x_i8 = jnp.asarray(np.clip(x_f * 16, -127, 127).astype(np.int8))
        w_i8 = jnp.asarray(np.clip(w_f * 127, -127, 127).astype(np.int8))

        bf = jax.jit(lambda a, b: conv(a, b, jnp.bfloat16))
        i8 = jax.jit(lambda a, b: conv(a, b, jnp.int32))
        # int8 in, int8 out via requantize epilogue (scale + clip + cast):
        def i8q(a, b):
            y = conv(a, b, jnp.int32)
            return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

        i8q = jax.jit(i8q)

        try:
            t_bf = time_fn(bf, x_bf, w_bf)
        except Exception as e:
            t_bf = None
            print(f"{name}: bf16 FAILED {type(e).__name__}: {str(e)[:100]}")
        # format the bf16 column outside the int8 try so a bf16 failure
        # (t_bf=None) cannot mislabel a *successful* int8 timing as FAILED
        bf_str = f"{t_bf:.2f} ms" if t_bf is not None else "n/a"
        for label, fn, a, b in [("int8->i32", i8, x_i8, w_i8),
                                ("int8->i8 requant", i8q, x_i8, w_i8)]:
            try:
                t = time_fn(fn, a, b)
                ratio = f"{t_bf / t:.2f}x" if t_bf else "?"
                print(f"{name}: bf16 {bf_str} | {label} {t:.2f} ms ({ratio} vs bf16)")
            except Exception as e:
                print(f"{name}: {label} FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
