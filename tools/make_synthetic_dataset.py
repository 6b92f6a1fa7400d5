"""Physically-consistent synthetic RGBD -> (amp, phs) dataset, MIT-CGH-4K style.

The real MIT-CGH-4K ``.bin`` files are unreachable from this host (no egress),
so the config-of-record training run (reference README.md:47-67) needs a
stand-in whose targets are *physically consistent* with the optics: here the
target image-plane field is derived from each RGBD sample through this repo's
own band-limited ASM propagator (the same construction idea as the reference
dataset, which renders per-depth-layer holograms; reference README.md:28-38).

Construction per sample:
  1. a procedural RGBD scene: textured background plus 4-8 textured objects
     at distinct depths, near-occludes-far compositing (textures matter —
     focal-stack sharpness cues live in high spatial frequencies);
  2. the depth map [0,1] is quantized into L layer bins mapped onto
     z in [-4e-4, -2e-5] m — exactly the span of the training distance stack
     ``linspace(-4e-4, 0, 21)[:-1]`` (reference trainingModel.py:63-66), with
     depth 1 (near) landing closest to the image plane;
  3. each layer's complex field  img * e^{i phi0}  is propagated from its
     depth plane to the image plane by the plan's ASM transfer function, and
     the fields are summed IN THE SPECTRAL DOMAIN (linearity: L forward FFTs,
     one inverse);
  4. the summed field's |.| and wrapped angle/2pi become (amp, phs) — phase
     stored normalized to [0,1] like the reference bins (data_loader.py:83).

Because step 3 uses the same propagator the trainer supervises through, a
focal-stack reconstruction of the *target* field at a layer's z refocuses
exactly that layer's content — the property the trained generator is then
graded on (VERDICT r2, "Next round" item 1).

Outputs raw float32 C-order bins (N,3,H,W) — ``ndarray.tofile`` layout,
reference data_processor.py:93-106 — under --out:
    train/{img,depth,amp,phs}.bin   val/{img,depth,amp,phs}.bin
plus a preview PNG grid (RGB, depth, target amp, and 3 refocused planes).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from learned_hologram_gan_tpu.config import OpticsConfig
from learned_hologram_gan_tpu.ops import asm

REF_WAVELENGTH = 638e-9  # phase heights are specified at the red wavelength


# ---------------------------------------------------------------------------
# procedural scenes (numpy, per-sample seeded)
# ---------------------------------------------------------------------------


def _smooth_noise(rng: np.random.Generator, h: int, w: int, kmax: int) -> np.ndarray:
    """Sum of a few random low-frequency Fourier modes, roughly unit range."""
    yy, xx = np.meshgrid(np.arange(h) / h, np.arange(w) / w, indexing="ij")
    out = np.zeros((h, w), np.float32)
    for _ in range(6):
        fx, fy = rng.uniform(-kmax, kmax, 2)
        ph = rng.uniform(0, 2 * np.pi)
        out += rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * (fx * xx + fy * yy) + ph)
    out -= out.min()
    return (out / max(out.max(), 1e-6)).astype(np.float32)


def _grating(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """High-frequency texture (random-orientation grating) in [0,1]."""
    yy, xx = np.meshgrid(np.arange(h) / h, np.arange(w) / w, indexing="ij")
    f = rng.uniform(15.0, 60.0)
    th = rng.uniform(0, np.pi)
    ph = rng.uniform(0, 2 * np.pi)
    g = 0.5 + 0.5 * np.sin(2 * np.pi * f * (np.cos(th) * xx + np.sin(th) * yy) + ph)
    return g.astype(np.float32)


def make_scene(rng: np.random.Generator, h: int, w: int):
    """One RGBD sample: img (3,h,w) in [0.03,1], depth (h,w) in [0,1]."""
    yy, xx = np.meshgrid(np.arange(h) / h, np.arange(w) / w, indexing="ij")

    # background: far-ish ramp depth + textured color
    a, b = rng.uniform(-0.4, 0.4, 2)
    depth = 0.08 + 0.30 * np.clip(a * xx + b * yy + 0.5, 0, 1)
    depth += 0.08 * _smooth_noise(rng, h, w, 3)
    base = rng.uniform(0.15, 0.55, 3).astype(np.float32)
    tex = 0.65 + 0.35 * _grating(rng, h, w)
    noise = 0.85 + 0.15 * _smooth_noise(rng, h, w, 8)
    img = base[:, None, None] * tex[None] * noise[None]

    for _ in range(int(rng.integers(4, 9))):
        kind = rng.integers(0, 2)
        cx, cy = rng.uniform(0.12, 0.88, 2)
        if kind == 0:  # feathered disc
            r = rng.uniform(0.06, 0.2)
            dist = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
            alpha = np.clip((r - dist) / (0.015 + 0.1 * r), 0, 1)
        else:  # rotated feathered rectangle
            th = rng.uniform(0, np.pi)
            u = np.cos(th) * (xx - cx) + np.sin(th) * (yy - cy)
            v = -np.sin(th) * (xx - cx) + np.cos(th) * (yy - cy)
            ru, rv = rng.uniform(0.05, 0.22, 2)
            alpha = np.clip((ru - np.abs(u)) / 0.01, 0, 1) * np.clip(
                (rv - np.abs(v)) / 0.01, 0, 1
            )
        obj_depth = float(rng.uniform(0.3, 1.0))
        color = rng.uniform(0.25, 1.0, 3).astype(np.float32)
        gr = 0.6 + 0.4 * _grating(rng, h, w)
        obj_rgb = color[:, None, None] * gr[None]
        # near occludes far where the object is (mostly) opaque
        sel = (alpha > 0.5) & (obj_depth > depth)
        img = np.where(sel[None], obj_rgb, img)
        depth = np.where(sel, obj_depth, depth)

    img = np.clip(img, 0.03, 1.0).astype(np.float32)
    return img, np.clip(depth, 0.0, 1.0).astype(np.float32)


# ---------------------------------------------------------------------------
# layered ASM target synthesis (on device)
# ---------------------------------------------------------------------------


def build_synth_fn(optics: OpticsConfig, num_layers: int, z_near: float, z_far: float):
    """Jitted (img, depth, phs0) -> (amp, phs01) target-field synthesizer.

    ``z_far < z_near < 0`` are offsets from the image plane; propagating the
    *image-plane* field by z_k (what training's focal-stack recon does,
    reference watermelon.py:39 + angular_spectrum_method.py:533-546) must
    refocus layer k, so each layer is propagated here by -z_k to the image
    plane first.
    """
    z_planes = np.linspace(z_far, z_near, num_layers).astype(np.float32)
    plan = asm.make_plan(optics, distances=-z_planes, cache_h=True)
    wl = np.asarray(optics.wavelengths, np.float32)
    phase_scale = jnp.asarray(REF_WAVELENGTH / wl, jnp.float32)  # phi ~ 1/lambda

    @jax.jit
    def _synth(p, img: jnp.ndarray, depth: jnp.ndarray, phs0: jnp.ndarray):
        # img (B,3,H,W), depth (B,H,W) in [0,1], phs0 (B,H,W) radians
        plan = p  # plan rides in as a jit ARG: closing over its complex H
        # stack would constant-fold it at lowering, forcing a complex
        # device->host transfer the axon relay cannot do (UNIMPLEMENTED)
        num = num_layers
        idx = jnp.clip((depth * num).astype(jnp.int32), 0, num - 1)  # (B,H,W)
        onehot = jax.nn.one_hot(idx, num, axis=1, dtype=img.dtype)  # (B,L,H,W)
        phi = phs0[:, None] * phase_scale[None, :, None, None]  # (B,3,H,W)
        amp_layers = img[:, None] * onehot[:, :, None]  # (B,L,3,H,W)
        g = asm.field(amp_layers, jnp.broadcast_to(phi[:, None], amp_layers.shape))
        g0 = asm._fft2(asm.pad(plan, g))  # (B,L,3,Rp,Cp)
        h_stack = asm._h_stack(plan)  # (L,3,Rp,Cp) — layer k's -z_k transfer fn
        gz = jnp.sum(g0 * (h_stack[None] * plan.mask), axis=1)  # (B,3,Rp,Cp)
        out = asm.crop(plan, asm._ifft2(gz))
        amp = jnp.abs(out)
        # normalize like the reference's amplitude_normalizor idiom
        # (utilities.py:53-66): per-sample-per-channel max * 1.01
        peak = jnp.max(amp, axis=(-2, -1), keepdims=True) * 1.01
        amp = amp / jnp.maximum(peak, 1e-6)
        ang = jnp.arctan2(jnp.imag(out), jnp.real(out))
        phs01 = jnp.mod(ang, 2.0 * np.pi) / (2.0 * np.pi)
        return amp, phs01

    def synth(img, depth, phs0):
        return _synth(plan, img, depth, phs0)

    return synth, z_planes


def generate_split(
    out_dir: str,
    n: int,
    h: int,
    w: int,
    synth,
    seed: int,
    batch: int = 4,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    shape = (n, 3, h, w)
    files = {
        k: np.memmap(os.path.join(out_dir, f"{k}.bin"), dtype=np.float32,
                     mode="w+", shape=shape)
        for k in ("img", "depth", "amp", "phs")
    }
    for start in range(0, n, batch):
        size = min(batch, n - start)
        imgs, depths, phs0s = [], [], []
        for i in range(size):
            rng = np.random.default_rng(seed + start + i)
            img, depth = make_scene(rng, h, w)
            imgs.append(img)
            depths.append(depth)
            phs0s.append(2.5 * _smooth_noise(rng, h, w, 5))
        amp, phs = synth(
            jnp.asarray(np.stack(imgs)),
            jnp.asarray(np.stack(depths)),
            jnp.asarray(np.stack(phs0s)),
        )
        amp = np.asarray(amp, np.float32)
        phs = np.asarray(phs, np.float32)
        sl = slice(start, start + size)
        files["img"][sl] = np.stack(imgs)
        files["depth"][sl] = np.repeat(
            np.stack(depths)[:, None], 3, axis=1
        )  # 3-channel depth, loaders take channel 0 (data_loader.py:30)
        files["amp"][sl] = amp
        files["phs"][sl] = phs
        if (start // batch) % 10 == 0:
            print(f"  {out_dir}: {start + size}/{n}")
    for f in files.values():
        f.flush()


def save_preview(out_dir: str, optics: OpticsConfig, png_path: str) -> None:
    """Sample-0 sanity grid: RGB, depth, |target|, refocused planes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    h, w = optics.rows, optics.cols
    img = np.memmap(os.path.join(out_dir, "img.bin"), np.float32, "r")[: 3 * h * w]
    dep = np.memmap(os.path.join(out_dir, "depth.bin"), np.float32, "r")[: 3 * h * w]
    amp = np.memmap(os.path.join(out_dir, "amp.bin"), np.float32, "r")[: 3 * h * w]
    phs = np.memmap(os.path.join(out_dir, "phs.bin"), np.float32, "r")[: 3 * h * w]
    img, dep, amp, phs = (x.reshape(3, h, w).copy() for x in (img, dep, amp, phs))

    # pure-numpy ASM for the preview: one sample x 3 planes is seconds on the
    # host, and avoids relay round trips / device backends entirely.  Same
    # math as ops/asm.propagate: crop(ifft2(fft2(pad(A e^{i phi})) H mask)).
    zs = np.asarray([-3.8e-4, -2.0e-4, -4.0e-5], np.float32)
    rp, cp = optics.padded_rows, optics.padded_cols
    pr, pc = optics.pad_rows, optics.pad_cols
    fx = asm._fftfreq_f32(rp, optics.pixel_pitch)[:, None]
    fy = asm._fftfreq_f32(cp, optics.pixel_pitch)[None, :]
    inv_wl_sq = 1.0 / np.asarray(optics.wavelengths, np.float32) ** 2
    w_grid = np.sqrt(
        np.clip(inv_wl_sq[:, None, None] - (fx * fx + fy * fy)[None], 0, None)
    ).astype(np.float32)
    u = np.fft.fftfreq(rp).astype(np.float32)[:, None]
    v = np.fft.fftfreq(cp).astype(np.float32)[None, :]
    radial = np.sqrt(u * u + v * v) * min(rp, cp)
    mask = (radial <= min(rp, cp) * optics.filter_radius_coefficient).astype(
        np.float32
    )
    fpad = np.zeros((3, rp, cp), np.complex64)
    fpad[:, pr : pr + h, pc : pc + w] = amp * np.exp(2j * np.pi * phs)
    g0 = np.fft.fft2(fpad)
    recon = np.empty((len(zs), 3, h, w), np.float32)
    for i, z in enumerate(zs):
        gz = g0 * (np.exp(-2j * np.pi * z * w_grid) * mask)
        out = np.fft.ifft2(gz)[:, pr : pr + h, pc : pc + w]
        recon[i] = np.abs(out)
    recon /= max(recon.max(), 1e-6)

    fig, axes = plt.subplots(2, 3, figsize=(12, 8))
    panels = [
        (img.transpose(1, 2, 0), "RGB input"),
        (dep[0], "depth (1 = near/in-focus-late)"),
        (amp.transpose(1, 2, 0) / max(amp.max(), 1e-6), "|target field|"),
    ] + [
        (recon[i].transpose(1, 2, 0), f"refocus z={zs[i]*1e3:.2f} mm")
        for i in range(3)
    ]
    for ax, (p, title) in zip(axes.ravel(), panels):
        ax.imshow(np.clip(p, 0, 1), cmap="viridis" if p.ndim == 2 else None)
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(png_path, dpi=110)
    print(f"preview saved to {png_path}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default="data/synth384")
    ap.add_argument("--train_num", type=int, default=500)  # README.md:47-67
    ap.add_argument("--val_num", type=int, default=100)
    ap.add_argument("--rows", type=int, default=384)
    ap.add_argument("--cols", type=int, default=384)
    ap.add_argument("--pad_size", type=int, default=320)  # trainingModel.py:62
    ap.add_argument("--pad_cols", type=int, default=None,
                    help="column-pad override (4K: pick with "
                         "utils/fftlen.good_fft_pads)")
    ap.add_argument("--filter_radius_coefficient", type=float, default=0.45)
    ap.add_argument("--layers", type=int, default=10)
    ap.add_argument("--z_far", type=float, default=-4e-4)
    ap.add_argument("--z_near", type=float, default=-2e-5)
    ap.add_argument("--seed", type=int, default=20260817)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--preview_only", action="store_true",
                    help="only (re)render the preview PNG from existing bins")
    args = ap.parse_args()

    optics = OpticsConfig(
        rows=args.rows,
        cols=args.cols,
        pad_size=args.pad_size,
        filter_radius_coefficient=args.filter_radius_coefficient,
        pad_cols_override=args.pad_cols,
    )
    if args.preview_only:
        save_preview(
            os.path.join(args.out, "train"), optics,
            os.path.join(args.out, "preview_train0.png"),
        )
        return
    synth, z_planes = build_synth_fn(optics, args.layers, args.z_near, args.z_far)
    print(f"layer planes (m): {z_planes}")
    generate_split(
        os.path.join(args.out, "train"), args.train_num, args.rows, args.cols,
        synth, args.seed, args.batch,
    )
    generate_split(
        os.path.join(args.out, "val"), args.val_num, args.rows, args.cols,
        synth, args.seed + 10_000_000, args.batch,
    )
    save_preview(
        os.path.join(args.out, "train"), optics,
        os.path.join(args.out, "preview_train0.png"),
    )


if __name__ == "__main__":
    main()
