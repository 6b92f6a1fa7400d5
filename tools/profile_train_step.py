#!/usr/bin/env python
"""Decompose the full-GAN train step into timed components on real hardware.

Components timed separately (each jitted, host-fetch anchored, best of N):
  D_fwd        critic forward, batch 2B (real+fake equivalents)
  D_fwd_bwd    critic value_and_grad w.r.t. params (batch 2B)
  GP           gradient penalty incl. its double backward, batch B
  critic_iter  one full critic update (the lax.scan body)
  G_fwd        generator forward + recon (steps 1-4)
  G_fwd_bwd    full generator update path (vjp pullback + loss grads)

Usage: python tools/profile_train_step.py [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=8):
    import jax

    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--rows", type=int, default=384)
    ap.add_argument("--cols", type=int, default=384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.train import Watermelon
    from learned_hologram_gan_tpu.train.steps import (
        _apply_d,
        _reconstruct,
        gradient_penalty,
    )

    trainer = Watermelon(
        filter_radius_coefficient=0.45,
        pad_size=320,
        distance_stack=np.linspace(-4e-4, 0.0, 21)[:-1],
        input_shape=(args.batch, 4, args.rows, args.cols),
        use_gan=True,
        perceptual="none",
        dtype="bfloat16",
    )
    trainer._init_state(seed=0, lr_G=1e-3, lr_D=1e-3)
    st = trainer.state
    rng = np.random.default_rng(0)
    batch = tuple(
        jnp.asarray(rng.random((args.batch, c, args.rows, args.cols)).astype(np.float32))
        for c in (4, 3, 3)
    )
    imgs = jnp.asarray(
        rng.random((2 * args.batch, 3, args.rows, args.cols)).astype(np.float32)
    )
    real, fake = imgs[: args.batch], imgs[args.batch :]
    D, G = trainer.discriminator, trainer.generator

    @jax.jit
    def d_fwd(p, bs, x):
        out, _ = _apply_d(D, p, bs, x)
        return out

    @jax.jit
    def d_fwd_bwd(p, bs, x):
        def loss(p):
            out, _ = _apply_d(D, p, bs, x)
            return jnp.mean(out)
        return jax.grad(loss)(p)

    @jax.jit
    def gp(p, bs, r, f, k):
        return gradient_penalty(D, p, bs, r, f, k)

    @jax.jit
    def gp_bwd(p, bs, r, f, k):
        return jax.grad(
            lambda p: gradient_penalty(D, p, bs, r, f, k)
        )(p)

    @jax.jit
    def critic_iter(p, bs, r, f, k):
        def d_loss_fn(p, bs_in):
            real_v, bs1 = _apply_d(D, p, bs_in, r)
            fake_v, bs2 = _apply_d(D, p, bs1, f)
            pen = gradient_penalty(D, p, bs2, r, f, k)
            return -jnp.mean(real_v) + jnp.mean(fake_v) + 10.0 * pen, bs2
        (l, bs2), g = jax.value_and_grad(d_loss_fn, has_aux=True)(p, bs)
        return l

    @jax.jit
    def g_fwd(p_G, bs_G, gen_plan, multi_plan, batch, k):
        outs, _ = _reconstruct(G, p_G, bs_G, gen_plan, multi_plan, batch, k)
        return outs[0]

    @jax.jit
    def g_fwd_bwd(p_G, bs_G, gen_plan, multi_plan, batch, k):
        def loss(p_G):
            (h_amps, t_amps, h_phs, t_phs), _ = _reconstruct(
                G, p_G, bs_G, gen_plan, multi_plan, batch, k
            )
            return jnp.mean((h_amps - t_amps) ** 2) + jnp.mean(h_phs)
        return jax.grad(loss)(p_G)

    k = jax.random.key(1)
    rows = [
        ("D_fwd b%d" % (2 * args.batch),
         lambda: d_fwd(st.params_D, st.batch_stats_D, imgs)),
        ("D_fwd_bwd b%d" % (2 * args.batch),
         lambda: d_fwd_bwd(st.params_D, st.batch_stats_D, imgs)),
        ("GP b%d" % args.batch,
         lambda: gp(st.params_D, st.batch_stats_D, real, fake, k)),
        ("GP_bwd b%d" % args.batch,
         lambda: gp_bwd(st.params_D, st.batch_stats_D, real, fake, k)),
        ("critic_iter",
         lambda: critic_iter(st.params_D, st.batch_stats_D, real, fake, k)),
        ("G_fwd (recon steps 1-4)",
         lambda: g_fwd(st.params_G, st.batch_stats_G, trainer.gen_plan,
                       trainer.multi_plan, batch, k)),
        ("G_fwd_bwd",
         lambda: g_fwd_bwd(st.params_G, st.batch_stats_G, trainer.gen_plan,
                           trainer.multi_plan, batch, k)),
    ]
    for name, thunk in rows:
        try:
            ms = timeit(lambda *_: thunk())
            print(f"{name:28s} {ms:8.1f} ms")
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
