#!/usr/bin/env python
"""Decompose the training-mode generator forward (steps 1-4) stage by stage.

Measures per-dispatch relay overhead with an identity jit and subtracts it,
so stages are comparable even though each is a separate dispatch.

Usage: python tools/profile_g_fwd.py [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=10):
    """Host-fetch-anchored best-of-N; fetches |sum| so complex outputs never
    cross the relay raw (complex device->host transfers are UNIMPLEMENTED
    through axon)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _absum(x):
        return jnp.sum(jnp.abs(x[..., ::64, ::64]))

    def fetch(out):
        return float(_absum(jax.tree.leaves(out)[0]))

    out = fn(*args)
    fetch(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.train import Watermelon
    from learned_hologram_gan_tpu.ops import asm

    b = args.batch
    trainer = Watermelon(
        filter_radius_coefficient=0.45, pad_size=320,
        distance_stack=np.linspace(-4e-4, 0.0, 21)[:-1],
        input_shape=(b, 4, 384, 384), use_gan=True, perceptual="none",
        dtype="bfloat16",
    )
    trainer._init_state(seed=0, lr_G=1e-3, lr_D=1e-3)
    st = trainer.state
    G = trainer.generator
    gen_plan, multi_plan = trainer.gen_plan, trainer.multi_plan
    rng = np.random.default_rng(0)
    rgbd = jnp.asarray(rng.random((b, 4, 384, 384)).astype(np.float32))
    amp = jnp.asarray(rng.random((b, 3, 384, 384)).astype(np.float32))
    phs = jnp.asarray(rng.random((b, 3, 384, 384)).astype(np.float32))
    key = jax.random.key(1)

    # dispatch overhead estimate
    @jax.jit
    def ident(x):
        return x + 1.0

    overhead = timeit(ident, jnp.zeros((8, 8), jnp.float32))

    @jax.jit
    def g_full(p, bs, plan, x):
        out, mut = G.apply({"params": p, "batch_stats": bs}, plan, x,
                           train=True, mutable=["batch_stats"])
        return out

    # part1 (UNet) and part2 (AP2POH) separately
    @jax.jit
    def part1(p, bs, x):
        out, mut = G.part1_apply({"params": p, "batch_stats": bs}, x, train=True) \
            if hasattr(G, "part1_apply") else (None, None)
        return out

    @jax.jit
    def poh2freq(plan, poh):
        return asm.propagate_poh2freq_forward(plan, poh)

    @jax.jit
    def filt(plan, a, p):
        return asm.filter_ap2filtered_freq(plan, a, p)

    @jax.jit
    def rand_recon(plan, g0, k):
        return asm.freq2ap_random_distances(plan, g0, k)

    poh = g_full(st.params_G, st.batch_stats_G, gen_plan, rgbd)
    hat_freq = poh2freq(gen_plan, poh)
    target_freq = filt(multi_plan, amp, phs)
    both = jnp.concatenate([hat_freq, target_freq], axis=0)

    print(f"dispatch overhead              {overhead:8.1f} ms")
    rows = [
        ("G fwd train=True (UNet+AP2POH)",
         lambda: g_full(st.params_G, st.batch_stats_G, gen_plan, rgbd)),
        ("poh2freq (fixed plan)", lambda: poh2freq(gen_plan, poh)),
        ("filter_ap2freq (multi plan)", lambda: filt(multi_plan, amp, phs)),
        ("freq2ap_random (2B planes)", lambda: rand_recon(multi_plan, both, key)),
    ]
    for name, thunk in rows:
        ms = timeit(lambda *_: thunk())
        print(f"{name:30s} {ms:8.1f} ms   (-overhead: {ms - overhead:7.1f})")

    # train=False comparison for the generator forward
    @jax.jit
    def g_eval(p, bs, plan, x):
        return G.apply({"params": p, "batch_stats": bs}, plan, x, train=False)

    ms = timeit(g_eval, st.params_G, st.batch_stats_G, gen_plan, rgbd)
    print(f"{'G fwd train=False':30s} {ms:8.1f} ms   (-overhead: {ms - overhead:7.1f})")


if __name__ == "__main__":
    main()
