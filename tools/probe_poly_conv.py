#!/usr/bin/env python
"""Isolate where the polyphase 3x3 conv loses: conv emitter vs glue.

Variants at the dec_0 conv-1 geometry (batch 16, 384^2, 128->64 std;
192^2, 512->256 phase domain), all bf16:

  std3x3        one standard NHWC 3x3 SAME conv
  poly4         4 asym-padded 2x2 convs + stack            (the current path)
  poly4_prepad  jnp.pad once + 4 VALID 2x2 convs (slices)  (pad-op hypothesis)
  poly1_sparse  one 3x3 conv, sparse (3,3,4cin,4cout)      (4x FLOP, 1x reads)
  gemm_taps     4 taps x shifted-GEMM dot_general          (pure-MXU form)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--cin", type=int, default=128)
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--reps", type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.nn.polyphase import (
        poly_conv3x3,
        space_to_depth,
    )

    dt = jnp.bfloat16
    h2 = args.size // 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.batch, args.size, args.size, args.cin)), dt)
    x4 = space_to_depth(x)
    k = jnp.asarray(rng.random((3, 3, args.cin, args.cout)) - 0.5, jnp.float32)

    @jax.jit
    def _absum(o):
        return jnp.sum(jnp.abs(o[..., ::64, ::64, :].astype(jnp.float32)))

    def timeit(name, fn, *xs):
        out = fn(*xs)
        float(_absum(out))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*xs)
            float(_absum(out))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:14s} {best * 1e3:8.2f} ms", flush=True)
        return out

    @jax.jit
    def std3x3(x, k):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @jax.jit
    def poly4(x4, k):
        return poly_conv3x3(x4, k)

    def _poly_kernel(k, do, dj):
        cin, cout = k.shape[2], k.shape[3]
        kp = jnp.zeros((2, 2, 4, cin, cout), k.dtype)
        for u in (-1, 0, 1):
            qi = (do + u) % 2
            pi = (do + u) // 2 - (do - 1)
            for v in (-1, 0, 1):
                qj = (dj + v) % 2
                pj = (dj + v) // 2 - (dj - 1)
                kp = kp.at[pi, pj, qi * 2 + qj].set(k[u + 1, v + 1])
        return kp.reshape(2, 2, 4 * cin, cout)

    @jax.jit
    def poly4_prepad(x4, k):
        n, h, w, c4 = x4.shape
        xp = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (0, 0)))
        outs = []
        for do in (0, 1):
            for dj in (0, 1):
                xs = jax.lax.slice(
                    xp, (0, do, dj, 0), (n, do + h + 1, dj + w + 1, c4)
                )
                o = jax.lax.conv_general_dilated(
                    xs, _poly_kernel(k, do, dj).astype(x4.dtype), (1, 1),
                    "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                outs.append(o)
        y = jnp.stack(outs, axis=3)
        return y.reshape(n, h, w, 4 * k.shape[3])

    @jax.jit
    def poly1_sparse(x4, k):
        cin, cout = k.shape[2], k.shape[3]
        # big kernel (3,3,4cin,4cout): output phase (do,dj) group = channel
        # block; tap (u,v) of the original lands at s2d position
        # (p+1, q) per the alignment derivation
        kb = jnp.zeros((3, 3, 4, cin, 4, cout), k.dtype)
        for do in (0, 1):
            for dj in (0, 1):
                for u in (-1, 0, 1):
                    qi = (do + u) % 2
                    pi = (do + u) // 2 + 1  # SAME pad: p in {-1,0,1} -> {0,1,2}
                    for v in (-1, 0, 1):
                        qj = (dj + v) % 2
                        pj = (dj + v) // 2 + 1
                        kb = kb.at[pi, pj, qi * 2 + qj, :, do * 2 + dj].set(
                            k[u + 1, v + 1]
                        )
        kb = kb.reshape(3, 3, 4 * cin, 4 * cout)
        return jax.lax.conv_general_dilated(
            x4, kb.astype(x4.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @jax.jit
    def gemm_taps(x4, k):
        n, h, w, c4 = x4.shape
        cin, cout = k.shape[2], k.shape[3]
        xp = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        # one GEMM per s2d tap position (p_i, p_j): shifted input window x
        # (4cin -> 4cout) weight slice assembled from the original kernel
        for pi in (0, 1, 2):
            for pj in (0, 1, 2):
                wmat = jnp.zeros((4, cin, 4, cout), k.dtype)
                used = False
                for do in (0, 1):
                    for dj in (0, 1):
                        for u in (-1, 0, 1):
                            if (do + u) // 2 + 1 != pi:
                                continue
                            qi = (do + u) % 2
                            for v in (-1, 0, 1):
                                if (dj + v) // 2 + 1 != pj:
                                    continue
                                qj = (dj + v) % 2
                                wmat = wmat.at[qi * 2 + qj, :, do * 2 + dj].set(
                                    k[u + 1, v + 1]
                                )
                                used = True
                if not used:
                    continue
                xs = jax.lax.slice(
                    xp, (0, pi, pj, 0), (n, pi + h, pj + w, c4)
                )
                o = jnp.dot(xs, wmat.reshape(4 * cin, 4 * cout).astype(x4.dtype))
                acc = o if acc is None else acc + o
        return acc

    ref = timeit("std3x3", std3x3, x, k)
    o1 = timeit("poly4", poly4, x4, k)
    o2 = timeit("poly4_prepad", poly4_prepad, x4, k)
    o3 = timeit("poly1_sparse", poly1_sparse, x4, k)
    o4 = timeit("gemm_taps", gemm_taps, x4, k)

    from learned_hologram_gan_tpu.nn.polyphase import depth_to_space

    want = np.asarray(ref[:1], np.float32)
    for name, o in (("poly4", o1), ("poly4_prepad", o2),
                    ("poly1_sparse", o3), ("gemm_taps", o4)):
        got = np.asarray(depth_to_space(o)[:1], np.float32)
        err = float(np.max(np.abs(got - want)))
        print(f"{name:14s} max|diff| = {err:.3e}")


if __name__ == "__main__":
    main()
