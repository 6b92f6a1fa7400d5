#!/usr/bin/env python
"""Measure the PyTorch reference pipeline's throughput on this host (baseline).

The reference repo publishes no benchmark numbers (BASELINE.md), so the
anchor is self-measured: this harness re-creates the reference's
*architecture* (UNet-6 generator at the reference's exact channel widths,
backward band-limited ASM at pad 320, double-phase encoding, 3-plane
focal-stack reconstruction — all torch ops, as the reference computes them)
and times single-sample 384x384 generation + reconstruction.  Weights are
random: throughput does not depend on them.

Writes the measured POHs/sec to stdout; paste into bench.py's
TORCH_CPU_BASELINE_POH_PER_SEC and BASELINE.md.
"""

import time

import numpy as np
import torch
import torch.nn as nn


def res_block(cin, cout):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU(),
        nn.Conv2d(cout, cout, 3, padding=1), nn.BatchNorm2d(cout),
    )


class RefUNet(nn.Module):
    """Channel plan of the reference UNet (neural_network_components.py:241-315)."""

    def __init__(self, cin=4, cout=6):
        super().__init__()
        f = [64, 128, 256, 512, 1024]
        self.enc = nn.ModuleList()
        c = cin
        for feats in f[:4]:
            self.enc.append(nn.ModuleDict({
                "block": res_block(c, feats),
                "skip": nn.Conv2d(c, feats, 1),
            }))
            c = feats
        self.pool = nn.MaxPool2d(2, 2)
        self.bottleneck = res_block(c, f[4])
        self.bottleneck_skip = nn.Conv2d(c, f[4], 1)
        self.up0 = nn.ConvTranspose2d(f[4], 512, 2, stride=2)
        self.dec = nn.ModuleList()
        dec_plan = [(1024, 512, 256), (512, 256, 128), (256, 128, 64)]
        for cat_c, feats, up_c in dec_plan:
            self.dec.append(nn.ModuleDict({
                "block": res_block(cat_c, feats),
                "skip": nn.Conv2d(cat_c, feats, 1),
                "up": nn.ConvTranspose2d(feats, up_c, 2, stride=2),
            }))
        self.final_block = res_block(128, 64)
        self.final_skip = nn.Conv2d(128, 64, 1)
        self.head = nn.Conv2d(64, cout, 1)

    def forward(self, x):
        skips = []
        for stage in self.enc:
            x = torch.relu(stage["block"](x) + stage["skip"](x))
            skips.append(x)
            x = self.pool(x)
        x = torch.relu(self.bottleneck(x) + self.bottleneck_skip(x))
        x = self.up0(x)
        for i, stage in enumerate(self.dec):
            x = torch.cat([skips[3 - i], x], dim=1)
            x = torch.relu(stage["block"](x) + stage["skip"](x))
            x = stage["up"](x)
        x = torch.cat([skips[0], x], dim=1)
        x = torch.relu(self.final_block(x) + self.final_skip(x))
        return torch.sigmoid(self.head(x))


def make_asm(rows, cols, pad, pitch, wavelengths, frc):
    pr, pc = pad, int(pad * cols / rows)
    rp, cp = rows + 2 * pr, cols + 2 * pc
    fx = torch.fft.fftfreq(rp, pitch)
    fy = torch.fft.fftfreq(cp, pitch)
    sq = fx[:, None] ** 2 + fy[None, :] ** 2
    wl = torch.tensor(wavelengths)
    w = torch.sqrt(torch.clamp((1 / wl**2)[:, None, None] - sq[None], min=0))
    shorter = min(rp, cp)
    u = torch.fft.fftfreq(rp)[:, None]
    v = torch.fft.fftfreq(cp)[None, :]
    mask = (torch.sqrt(u**2 + v**2) * shorter <= shorter * frc).float()
    return w, mask, (pr, pc)


def main():
    torch.set_num_threads(torch.get_num_threads())
    rows = cols = 384
    unet = RefUNet().eval()
    w, mask, (pr, pc) = make_asm(rows, cols, 320, 3.74e-6,
                                 [638e-9, 520e-9, 450e-9], 0.45)
    H1 = torch.exp(-2j * torch.pi * 1e-3 * w)
    ds = torch.linspace(4e-4, 10e-4, 3)
    H3 = torch.exp(-2j * torch.pi * ds[:, None, None, None] * w)
    board = torch.tensor(
        (np.add.outer(np.arange(rows), np.arange(cols)) % 2).astype(np.float32)
    )

    def pipeline(rgbd):
        y = unet(rgbd)
        amp, phs = 1.1 * y[:, :3], 2 * torch.pi * y[:, 3:]
        g = torch.nn.functional.pad(amp * torch.exp(1j * phs), (pc, pc, pr, pr))
        g0 = torch.fft.ifft2(torch.fft.fft2(g) / H1)[..., pr:-pr, pc:-pc]
        a = torch.abs(g0)
        a = a / (a.amax(-1, True).amax(-2, True) * 1.01)
        p = torch.angle(g0)
        acos = torch.acos(a)
        poh = (1 - board) * (p + acos) + board * (p - acos)
        # 3-plane recon with unit amplitude
        gp = torch.nn.functional.pad(torch.exp(1j * poh), (pc, pc, pr, pr))
        G = torch.fft.fft2(gp)
        Gz = (G.unsqueeze(1) * (H3 * mask)).reshape(-1, 3, G.shape[-2], G.shape[-1])
        recon = torch.abs(torch.fft.ifft2(Gz)[..., pr:-pr, pc:-pc])
        return poh, recon

    rgbd = torch.rand(1, 4, rows, cols)
    with torch.no_grad():
        pipeline(rgbd)  # warmup
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            pipeline(rgbd)
        dt = time.perf_counter() - t0
    print(f"torch-cpu reference pipeline: {reps / dt:.4f} POHs/sec "
          f"({dt / reps * 1e3:.1f} ms/sample), threads={torch.get_num_threads()}")


if __name__ == "__main__":
    main()
