#!/usr/bin/env python
"""Isolate the slow backward in the generator path: UNet vs AP2POH vs each
spectral primitive's VJP.  All jitted with plans as args; complex-safe
fetches.

Usage: python tools/profile_bwd.py [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, reps=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _absum(x):
        return jnp.sum(jnp.abs(x.ravel()[::97]))

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
    rng = np.random.default_rng(0)
    rgbd = jnp.asarray(rng.random((b, 4, 384, 384)).astype(np.float32))
    amp = jnp.asarray(rng.random((b, 3, 384, 384)).astype(np.float32))
    phs = jnp.asarray(rng.random((b, 3, 384, 384)).astype(np.float32))
    key = jax.random.key(1)

    @jax.jit
    def full_fwd(p, bs, plan, x):
        out, _ = G.apply({"params": p, "batch_stats": bs}, plan, x,
                         train=True, mutable=["batch_stats"])
        return out

    @jax.jit
    def full_bwd(p, bs, plan, x):
        def loss(p):
            out, _ = G.apply({"params": p, "batch_stats": bs}, plan, x,
                             train=True, mutable=["batch_stats"])
            return jnp.mean(out)
        return jax.grad(loss)(p)

    gen_plan, multi_plan = trainer.gen_plan, trainer.multi_plan
    print(f"G fwd           {bench(full_fwd, (st.params_G, st.batch_stats_G, gen_plan, rgbd)):8.1f} ms")
    print(f"G fwd+bwd       {bench(full_bwd, (st.params_G, st.batch_stats_G, gen_plan, rgbd)):8.1f} ms")

    # spectral primitives: fwd and vjp
    poh = jnp.asarray(rng.random((b, 3, 384, 384)).astype(np.float32))

    @jax.jit
    def s1(plan, x):
        return asm.propagate_poh2freq_forward(plan, x)

    @jax.jit
    def s1b(plan, x):
        return jax.grad(lambda x: jnp.sum(jnp.abs(
            asm.propagate_poh2freq_forward(plan, x))))(x)

    @jax.jit
    def s2(plan, a, p):
        return asm.filter_ap2filtered_freq(plan, a, p)

    @jax.jit
    def s2b(plan, a, p):
        return jax.grad(lambda a: jnp.sum(jnp.abs(
            asm.filter_ap2filtered_freq(plan, a, p))))(a)

    g0 = s1(gen_plan, poh)
    both = jnp.concatenate([g0, s2(multi_plan, amp, phs)], axis=0)

    @jax.jit
    def s3(plan, g, k):
        a, p = asm.freq2ap_random_distances(plan, g, k)
        return a

    @jax.jit
    def s3b(plan, g, k):
        def f(g):
            a, p = asm.freq2ap_random_distances(plan, g, k)
            return jnp.sum(a) + jnp.sum(p)
        return jax.grad(f)(g)

    print(f"poh2freq fwd    {bench(s1, (gen_plan, poh)):8.1f} ms")
    print(f"poh2freq bwd    {bench(s1b, (gen_plan, poh)):8.1f} ms")
    print(f"filter fwd      {bench(s2, (multi_plan, amp, phs)):8.1f} ms")
    print(f"filter bwd      {bench(s2b, (multi_plan, amp, phs)):8.1f} ms")
    print(f"rand_recon fwd  {bench(s3, (multi_plan, both, key)):8.1f} ms")
    print(f"rand_recon bwd  {bench(s3b, (multi_plan, both, key)):8.1f} ms")




def stages(batch=4):
    """Stage-level: RGBD2AP (UNet) vs AP2POH fwd/bwd."""
    import jax
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.train import Watermelon

    b = batch
    trainer = Watermelon(
        filter_radius_coefficient=0.45, pad_size=320,
        distance_stack=np.linspace(-4e-4, 0.0, 21)[:-1],
        input_shape=(b, 4, 384, 384), use_gan=True, perceptual="none",
        dtype="bfloat16",
    )
    trainer._init_state(seed=0, lr_G=1e-3, lr_D=1e-3)
    st = trainer.state
    G = trainer.generator
    gen_plan = trainer.gen_plan
    rng = np.random.default_rng(0)
    rgbd = jnp.asarray(rng.random((b, 4, 384, 384)).astype(np.float32))
    amp = jnp.asarray(rng.random((b, 3, 384, 384)).astype(np.float32))
    phs = jnp.asarray(rng.random((b, 3, 384, 384)).astype(np.float32))

    @jax.jit
    def s1_fwd(p, bs, x):
        (a, ph), _ = G.apply({"params": p, "batch_stats": bs}, x, train=True,
                             mutable=["batch_stats"], method="stage1")
        return a

    @jax.jit
    def s1_bwd(p, bs, x):
        def loss(p):
            (a, ph), _ = G.apply({"params": p, "batch_stats": bs}, x,
                                 train=True, mutable=["batch_stats"],
                                 method="stage1")
            return jnp.mean(a) + jnp.mean(ph)
        return jax.grad(loss)(p)

    @jax.jit
    def s2_fwd(p, bs, plan, a, ph):
        return G.apply({"params": p, "batch_stats": bs}, plan, a, ph,
                       method="stage2")

    @jax.jit
    def s2_bwd(p, bs, plan, a, ph):
        def loss(p, a, ph):
            out = G.apply({"params": p, "batch_stats": bs}, plan, a, ph,
                          method="stage2")
            return jnp.mean(out)
        return jax.grad(loss, argnums=(0, 1, 2))(p, a, ph)

    print(f"stage1 UNet fwd   {bench(s1_fwd, (st.params_G, st.batch_stats_G, rgbd)):8.1f} ms")
    print(f"stage1 UNet bwd   {bench(s1_bwd, (st.params_G, st.batch_stats_G, rgbd)):8.1f} ms")
    print(f"stage2 AP2POH fwd {bench(s2_fwd, (st.params_G, st.batch_stats_G, gen_plan, amp, phs)):8.1f} ms")
    print(f"stage2 AP2POH bwd {bench(s2_bwd, (st.params_G, st.batch_stats_G, gen_plan, amp, phs)):8.1f} ms")


if __name__ == "__main__":
    if "--stages" in sys.argv:
        stages()
    else:
        main()
