#!/usr/bin/env python
"""Bisect the ratio-0 (generator-only) train step cost by ablating pieces.

Variants, all jitted as ONE program (so dispatch overhead is constant):
  full        the real ratio-0 step (G update incl losses, metrics, Adam)
  no_metrics  skip PSNR/SSIM
  pixel_only  loss = MSE only (no phase-gradient family, no TV, no critic)
  no_opt      compute grads but skip Adam update
  fwd_bwd     grads of a trivial loss through the recon only

Usage: python tools/profile_g_path.py [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from learned_hologram_gan_tpu.losses import psnr, ssim
    from learned_hologram_gan_tpu.losses.losses import (
        focal_sincos_phase_gradient_loss,
        mse,
        total_variation_loss,
    )
    from learned_hologram_gan_tpu.train import Watermelon
    from learned_hologram_gan_tpu.train.steps import _reconstruct

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
    tx = trainer.tx_G
    rng = np.random.default_rng(0)
    batch = tuple(
        jnp.asarray(rng.random((b, c, 384, 384)).astype(np.float32))
        for c in (4, 3, 3)
    )

    def make_step(with_metrics=True, loss_mode="full", with_opt=True):
        # NOTE: plans and batch are jit *arguments* — closed-over complex
        # device arrays are constant-folded at lowering, forcing a complex
        # device->host transfer that the relay cannot do (UNIMPLEMENTED).
        def step(p_G, bs_G, opt, key, gen_plan, multi_plan, batch):
            kd = jax.random.fold_in(key, 0)

            def loss_fn(p):
                (h_amps, t_amps, h_phs, t_phs), bs_new = _reconstruct(
                    G, p, bs_G, gen_plan, multi_plan, batch, kd
                )
                t_amps = jax.lax.stop_gradient(t_amps)
                t_phs = jax.lax.stop_gradient(t_phs)
                if loss_mode == "pixel":
                    loss = mse(h_amps, t_amps)
                elif loss_mode == "trivial":
                    loss = jnp.mean(h_amps) + jnp.mean(h_phs)
                else:
                    loss = (
                        focal_sincos_phase_gradient_loss(h_phs, t_phs)
                        + mse(h_amps, t_amps)
                        + 1e-3 * total_variation_loss(h_amps, t_amps)
                    )
                return loss, (h_amps, t_amps, bs_new)

            (loss, (h_amps, t_amps, bs_new)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(p_G)
            out = {"loss": loss}
            if with_metrics:
                out["psnr"] = psnr(h_amps, t_amps)
                out["ssim"] = ssim(h_amps, t_amps)
            if with_opt:
                updates, opt = tx.update(grads, opt, p_G)
                p_G = optax.apply_updates(p_G, updates)
            else:
                out["gsum"] = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads))
            return p_G, opt, out

        return jax.jit(step)

    variants = [
        ("full", make_step()),
        ("no_metrics", make_step(with_metrics=False)),
        ("pixel_only", make_step(with_metrics=False, loss_mode="pixel")),
        ("no_opt", make_step(with_metrics=False, loss_mode="pixel", with_opt=False)),
        ("fwd_bwd_trivial", make_step(with_metrics=False, loss_mode="trivial",
                                      with_opt=False)),
    ]
    key = jax.random.key(3)
    for name, step in variants:
        a = (st.params_G, st.batch_stats_G, st.opt_state_G, key,
             gen_plan, multi_plan, batch)
        p, opt, out = step(*a)
        float(out["loss"])
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            p, opt, out = step(*a)
            float(out["loss"])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:18s} {best * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
