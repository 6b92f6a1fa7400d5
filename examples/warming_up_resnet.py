#!/usr/bin/env python
"""Warming-up study: a ResNet-18-shaped classifier from this package's blocks.

Executable counterpart of `/root/reference/warmingUp/aboutResNet18.ipynb`
(a torch ResNet-18 tutorial on FashionMNIST): builds the classic
[2, 2, 2, 2]-stage residual classifier out of this package's
:class:`~learned_hologram_gan_tpu.nn.blocks.ResidualBlock` — the same block
the hologram UNet/critic use — and fits a synthetic 4-class texture problem
in a few hundred jitted steps.  Demonstrates the blocks are general, and the
TPU-idiomatic training idiom (pure step via value_and_grad + optax) in ~60
lines.

Run: python examples/warming_up_resnet.py [--cpu] [--steps 150]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_textures(rng, n, size=32):
    """4 classes: vertical stripes, horizontal stripes, checks, blobs."""
    x = np.zeros((n, size, size, 1), np.float32)
    y = rng.integers(0, 4, size=n)
    g = np.arange(size)
    for i, cls in enumerate(y):
        phase = rng.uniform(0, 2 * np.pi)
        f = rng.uniform(2, 5)
        if cls == 0:
            img = np.sin(f * 2 * np.pi * g[None, :] / size + phase)
            img = np.repeat(img, size, axis=0)
        elif cls == 1:
            img = np.sin(f * 2 * np.pi * g[:, None] / size + phase)
            img = np.repeat(img, size, axis=1)
        elif cls == 2:
            img = np.sin(f * 2 * np.pi * g[None, :] / size + phase) * np.sin(
                f * 2 * np.pi * g[:, None] / size + phase
            )
        else:
            img = rng.normal(size=(size, size))
            from numpy.fft import fft2, ifft2

            k = np.exp(-0.5 * ((g - size / 2) / 2.0) ** 2)
            img = np.real(ifft2(fft2(img) * np.outer(k, k)))
            img /= max(np.abs(img).max(), 1e-6)
        x[i, :, :, 0] = img + 0.05 * rng.normal(size=(size, size))
    return x, y.astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from learned_hologram_gan_tpu.nn.blocks import ResidualBlock

    class ResNet18(nn.Module):
        """[2,2,2,2] residual stages, 64->512, GAP head — the notebook's
        architecture, assembled from the package's ResidualBlock."""

        num_classes: int = 4
        width: int = 16  # 64 in the real ResNet-18; smaller for the demo

        @nn.compact
        def __call__(self, x, train=True):
            w = self.width
            x = nn.Conv(w, (3, 3), padding="SAME")(x)  # stem (CIFAR-style)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            for stage, feats in enumerate([w, 2 * w, 4 * w, 8 * w]):
                for blk in range(2):
                    stride = 2 if stage > 0 and blk == 0 else 1
                    x = ResidualBlock(
                        feats, use_1x1conv=(stride != 1 or blk == 0 and stage > 0),
                        strides=stride,
                    )(x, train)
            x = jnp.mean(x, axis=(1, 2))  # global average pool
            return nn.Dense(self.num_classes)(x)

    rng = np.random.default_rng(0)
    x_train, y_train = synthetic_textures(rng, 512)
    x_test, y_test = synthetic_textures(rng, 256)

    model = ResNet18()
    variables = model.init(jax.random.key(0), jnp.asarray(x_train[:2]))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt, xb, yb):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, xb,
                train=True, mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, yb
            ).mean()
            return loss, mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), bs, opt, loss

    @jax.jit
    def accuracy(params, batch_stats, xb, yb):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, xb, train=False
        )
        return jnp.mean(jnp.argmax(logits, -1) == yb)

    bsz = 64
    first_loss = None
    for i in range(args.steps):
        idx = rng.integers(0, len(x_train), bsz)
        params, batch_stats, opt, loss = step(
            params, batch_stats, opt, jnp.asarray(x_train[idx]),
            jnp.asarray(y_train[idx]),
        )
        if first_loss is None:
            first_loss = float(loss)
        if (i + 1) % 50 == 0:
            print(f"step {i + 1}: loss {float(loss):.4f}")

    acc = float(accuracy(params, batch_stats,
                         jnp.asarray(x_test), jnp.asarray(y_test)))
    print(f"test accuracy after {args.steps} steps: {acc:.3f} "
          f"(loss {first_loss:.3f} -> {float(loss):.3f})")
    assert float(loss) < first_loss, "training must reduce the loss"
    assert acc > 0.6, f"ResNet18 should separate the 4 textures, got {acc}"
    print("warming-up ResNet study: all assertions passed")


if __name__ == "__main__":
    main()
