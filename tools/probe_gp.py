#!/usr/bin/env python
"""Decompose the WGAN-GP critic iteration and price each proposed lever.

Round-3 profile: the critic update is ~80% of the 395 ms config-of-record
step — ratio 5 x ~64.5 ms/iteration, of which the gradient-penalty double
backward is ~35 ms (reference compute_gradient_penalty, watermelon.py:
458-477).  Round-3's verdict asks for direct measurements of (a) the GP in
bf16 with f32 norm arithmetic, (b) jax.checkpoint policies on the inner
grad, and (c) whether anything can overlap the generator vjp with the
critic scan.  Note on (c): a v5e TensorCore executes one fused region at a
time — there is no intra-chip op-level concurrency to exploit, so
"overlap" can only reorder, not hide, work; measured here anyway via the
fused-step comparison.

Usage: python tools/probe_gp.py [--batch 4] [--hw 384]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


REPS = 10


def make_timed(fn):
    """REPS calls inside one jit: serial dependence (params perturbed by the
    accumulator) prevents hoisting; reducing EVERY output leaf prevents XLA
    from dead-code-eliminating any of the gradient tree (see the harness
    notes in tools/probe_channel_pad.py)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(p):
        def body(i, acc):
            p2 = jax.tree.map(
                lambda a: a * (1.0 + acc * 1e-30).astype(a.dtype), p
            )
            out = fn(p2)
            s = jnp.float32(0.0)
            for leaf in jax.tree.leaves(out):
                s = s + jnp.mean(leaf.astype(jnp.float32))
            return acc + s * 1e-30

        return lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    return run


def time_fn(fn, p, trials=4):
    run = make_timed(fn)
    float(run(p))  # compile
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        v = float(run(p))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(v)
    return best / REPS * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", type=int, default=384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.models.discriminator import WGANGPDiscriminator192
    from learned_hologram_gan_tpu.train.steps import _apply_d

    rng = np.random.default_rng(0)
    B, HW = args.batch, args.hw
    disc = WGANGPDiscriminator192(feature_d=32, dtype=jnp.bfloat16)
    real = jnp.asarray(rng.random((B, 3, HW, HW)).astype(np.float32))
    fake = jnp.asarray(rng.random((B, 3, HW, HW)).astype(np.float32))
    variables = disc.init(jax.random.key(0), real[:1], train=True)
    p_D = variables["params"]
    bs_D = variables.get("batch_stats", {})
    alpha = jnp.asarray(rng.random((B, 1, 1, 1)).astype(np.float32))

    def critic_pair_loss(p, x2b):
        out, bs1 = _apply_d(disc, p, bs_D, x2b)
        return -jnp.mean(out[:B]) + jnp.mean(out[B:]), bs1

    def gp_core(p, interp, *, remat=False, policy=None, cast_bf16=False):
        if cast_bf16:
            p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
            interp = interp.astype(jnp.bfloat16)

        def critic_sum(x):
            out, _ = _apply_d(disc, p, bs_D, x, train=True)
            return jnp.sum(out)

        if remat:
            critic_sum = jax.checkpoint(critic_sum, policy=policy)
        grads = jax.grad(critic_sum)(interp)
        # norm/penalty arithmetic stays f32 in every variant
        g = grads.reshape(grads.shape[0], -1).astype(jnp.float32)
        norms = jnp.sqrt(jnp.sum(g ** 2, axis=1) + 1e-12)
        return jnp.mean((norms - 1.0) ** 2)

    from jax.ad_checkpoint import checkpoint_policies as cp

    probes = {}

    # 1. pair apply fwd only
    probes["pair apply fwd (2B)"] = (
        lambda p: critic_pair_loss(p, jnp.concatenate([real, fake]))[0]
    )
    # 2. pair apply value+grad (no GP)
    probes["pair value_and_grad (no GP)"] = (
        lambda p: jax.value_and_grad(
            lambda q: critic_pair_loss(q, jnp.concatenate([real, fake]))[0]
        )(p)[1]
    )
    # 3. GP fwd only (inner grad, no outer backward)
    interp = alpha * real + (1 - alpha) * fake
    probes["GP forward (inner grad only)"] = (
        lambda p: gp_core(p, interp)
    )
    # 4. GP value+grad wrt params — the double backward, as shipped
    probes["GP value_and_grad (baseline)"] = (
        lambda p: jax.grad(lambda q: gp_core(q, interp))(p)
    )
    # 5. + remat on the inner critic
    probes["GP v&g remat"] = (
        lambda p: jax.grad(lambda q: gp_core(q, interp, remat=True))(p)
    )
    # 6. + remat with dots_saveable policy (keep matmuls, recompute the rest)
    probes["GP v&g remat dots_saveable"] = (
        lambda p: jax.grad(
            lambda q: gp_core(q, interp, remat=True, policy=cp.checkpoint_dots)
        )(p)
    )
    # 7. params+interp cast bf16, norm f32
    probes["GP v&g bf16 params/interp"] = (
        lambda p: jax.grad(lambda q: gp_core(q, interp, cast_bf16=True))(p)
    )
    # 8. full d-iteration (pair + GP), as in the train step
    lam = 10.0

    def d_iter(p):
        loss1, _ = critic_pair_loss(p, jnp.concatenate([real, fake]))
        return loss1 + lam * gp_core(p, interp)

    probes["full d-iter value_and_grad"] = (
        lambda p: jax.value_and_grad(d_iter)(p)[1]
    )
    # 9. full d-iter with the bf16 GP
    def d_iter_bf16gp(p):
        loss1, _ = critic_pair_loss(p, jnp.concatenate([real, fake]))
        return loss1 + lam * gp_core(p, interp, cast_bf16=True)

    probes["full d-iter, bf16 GP"] = (
        lambda p: jax.value_and_grad(d_iter_bf16gp)(p)[1]
    )

    for label, fn in probes.items():
        try:
            t = time_fn(fn, p_D)
            print(f"{label:34s} {t:7.2f} ms", flush=True)
        except Exception as e:  # pragma: no cover
            print(f"{label:34s} FAILED {type(e).__name__}: {str(e)[:110]}",
                  flush=True)


if __name__ == "__main__":
    main()
