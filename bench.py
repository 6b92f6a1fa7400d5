#!/usr/bin/env python
"""Headline benchmark: 384x384 RGBD -> POH generation + 3-plane ASM recon.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline"}
LAST (the r01..r05-continuous bf16 series the driver records), preceded by
a second JSON line for the int8 full-integer stage-1 pipeline — the fastest
measured configuration (BASELINE.md round 4), tracked as its own series.

The metric matches BASELINE.json config #2: generator forward (UNet ->
backward ASM -> double-phase) plus a 3-wavelength x 3-plane band-limited ASM
focal-stack reconstruction, at 384x384 with pad 320 (padded FFT size
1024x1024).  ``vs_baseline`` compares against the PyTorch reference measured
on this host's CPU (the only reference hardware available; see BASELINE.md) —
the stored constant below was produced by ``tools/baseline_torch.py``.
"""

import json
import time

# PyTorch reference pipeline on this host CPU (tools/baseline_torch.py,
# measured 2026-08-16 on the single-core build host): single-sample 384x384
# generation + 3-plane recon.  The only reference hardware available —
# BASELINE.md records the context.
TORCH_CPU_BASELINE_POH_PER_SEC = 0.3342


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from learned_hologram_gan_tpu.config import GeneratorConfig
    from learned_hologram_gan_tpu.models import Generator, make_generator_plan
    from learned_hologram_gan_tpu.ops import asm

    cfg = GeneratorConfig(
        rows=384, cols=384, pad_size=320, filter_radius_coefficient=0.45,
        dtype="bfloat16",
    )
    generator = Generator(cfg)
    gen_plan = make_generator_plan(cfg)
    recon_plan = asm.make_plan(
        cfg.optics(), distances=np.linspace(4e-4, 10e-4, 3)
    )

    batch = 16
    rgbd = jnp.asarray(
        np.random.default_rng(0).random((batch, 4, 384, 384)).astype(np.float32)
    )
    variables = generator.init(jax.random.key(0), gen_plan, rgbd[:1], train=False)

    # NOTE: plans are jit *arguments*, not closures — closed-over complex
    # device arrays would be embedded as compile-time constants, forcing a
    # complex device->host transfer during lowering.
    @jax.jit
    def pipeline(params, batch_stats, gen_plan, recon_plan, rgbd):
        # NOTE: the module apply IS the fast path here.  The fused-UNet
        # alternative (nn/fused_unet.py: BN folded, optional whole-block
        # Pallas kernel) measured 56.0 vs 55.1 ms/batch-16 — XLA already
        # fuses the eval-BN epilogues, and the Pallas block kernel cannot
        # fit the 384-wide level-0/1 stripes in VMEM (see BASELINE.md
        # round-3 conv-path study).
        poh = generator.apply(
            {"params": params, "batch_stats": batch_stats},
            gen_plan, rgbd, train=False,
        )
        recon = asm.propagate_batch_multi(
            recon_plan, jnp.ones_like(poh), poh
        )
        return poh, recon

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def fetch(out):
        # Force a real device->host round trip: on some transports
        # block_until_ready resolves before execution finishes, so timing
        # must anchor on materialized data.  TPU streams execute in order,
        # so fetching the last result waits for everything queued before it.
        return float(jnp.sum(out[1][:, :, ::64, ::64]))

    # warmup / compile
    fetch(pipeline(params, batch_stats, gen_plan, recon_plan, rgbd))
    fetch(pipeline(params, batch_stats, gen_plan, recon_plan, rgbd))

    # The relay adds run-to-run noise (round 3's single-trial capture moved
    # -6% with no code change on the path).  Run several independent trials
    # and report the median; the spread makes the number self-defending.
    reps, trials = 10, 5
    rates = []
    for _ in range(trials):
        start = time.perf_counter()
        for _ in range(reps):
            out = pipeline(params, batch_stats, gen_plan, recon_plan, rgbd)
        fetch(out)
        elapsed = time.perf_counter() - start
        rates.append(reps * batch / elapsed)
    rates.sort()
    poh_per_sec = rates[len(rates) // 2]
    spread = rates[-1] - rates[0]
    vs = (
        poh_per_sec / TORCH_CPU_BASELINE_POH_PER_SEC
        if TORCH_CPU_BASELINE_POH_PER_SEC
        else None
    )

    # ---- second series: full-integer int8 stage-1 (nn/quant.py q8 chain,
    # the fastest measured configuration and the serve_poh --quantize int8
    # deployment path; round-4 VERDICT asked for it as its own series).
    # Printed FIRST so the driver's tail-parse keeps the bf16 line below as
    # the r01..r05-continuous headline.  A failure here must not lose the
    # headline record, hence the broad except.
    try:
        from learned_hologram_gan_tpu.models.generator import (
            generator_apply_quant,
            nchw_to_nhwc,
        )
        from learned_hologram_gan_tpu.nn.quant import quantize_unet_q8

        qtree = quantize_unet_q8(
            params["part1"]["unet"], batch_stats["part1"]["unet"],
            nchw_to_nhwc(rgbd[:8]),
        )

        @jax.jit
        def pipeline_q8(params, batch_stats, qtree, gen_plan, recon_plan, rgbd):
            poh = generator_apply_quant(
                generator, {"params": params, "batch_stats": batch_stats},
                qtree, gen_plan, rgbd,
            )
            recon = asm.propagate_batch_multi(
                recon_plan, jnp.ones_like(poh), poh
            )
            return poh, recon

        args_q8 = (params, batch_stats, qtree, gen_plan, recon_plan, rgbd)
        fetch(pipeline_q8(*args_q8))
        fetch(pipeline_q8(*args_q8))
        rates_q8 = []
        for _ in range(trials):
            start = time.perf_counter()
            for _ in range(reps):
                out = pipeline_q8(*args_q8)
            fetch(out)
            rates_q8.append(reps * batch / (time.perf_counter() - start))
        rates_q8.sort()
        q8 = rates_q8[len(rates_q8) // 2]
        print(
            json.dumps(
                {
                    "metric": "384x384 POH generation + 3-plane ASM recon "
                              "(int8 full-integer stage-1)",
                    "value": round(q8, 3),
                    "unit": "POHs/sec",
                    "vs_baseline": round(
                        q8 / TORCH_CPU_BASELINE_POH_PER_SEC, 2
                    ),
                    "trials": [round(r, 1) for r in rates_q8],
                    "spread": round(rates_q8[-1] - rates_q8[0], 1),
                }
            ),
            flush=True,
        )
    except Exception:  # pragma: no cover
        import traceback

        traceback.print_exc()

    print(
        json.dumps(
            {
                "metric": "384x384 POH generation + 3-plane ASM recon",
                "value": round(poh_per_sec, 3),
                "unit": "POHs/sec",
                "vs_baseline": round(vs, 2) if vs else None,
                "trials": [round(r, 1) for r in rates],
                "spread": round(spread, 1),
            }
        )
    )


def _run_inner_with_retries():
    # The TPU relay occasionally wedges a process (UNIMPLEMENTED on valid
    # ops); a fresh attempt usually succeeds.  Retry before giving up so a
    # transient doesn't lose the benchmark record.
    import traceback

    last = None
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # pragma: no cover
            last = e
            traceback.print_exc()
            time.sleep(10)
    else:
        raise last


def _supervise():
    """Re-exec the benchmark in a child and watch for a silent relay wedge.

    The relay also wedges processes NON-raising (futex-blocked, ~0 host CPU
    accrual, typically right after a compile — observed at ~50% of fresh
    chip processes on 2026-08-20).  An in-process retry can't recover that,
    and the driver runs this script unsupervised, so the top-level process
    supervises a child instead: child stdout flows through untouched (the
    driver parses it); on a CPU-accrual stall the child is killed by
    explicit PID and relaunched.  Same detector as tools/watchdog_run.py.
    """
    import os
    import subprocess
    import sys

    hz = os.sysconf("SC_CLK_TCK")

    def cpu(pid):
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
            return int(parts[11]) + int(parts[12])
        except OSError:
            return -1

    for attempt in range(4):
        child = subprocess.Popen([sys.executable, __file__, "--_inner"])
        mark_t, mark_c = time.time(), cpu(child.pid)
        stalled = False
        while True:
            try:
                child.wait(timeout=20)
                break
            except subprocess.TimeoutExpired:
                pass
            c = cpu(child.pid)
            if c > mark_c + hz:  # >1 CPU-second since the mark
                mark_t, mark_c = time.time(), c
            elif time.time() - mark_t > 900:
                # window > the longest remote-side XLA compile: with
                # PALLAS_AXON_REMOTE_COMPILE=1 the host is quiet while the
                # relay compiles, and a tight window would kill a healthy
                # compiling child
                print(f"bench: relay wedge detected (no CPU for 900s), "
                      f"killing pid {child.pid} and retrying",
                      file=sys.stderr, flush=True)
                child.kill()
                child.wait()
                stalled = True
                break
        if not stalled:
            raise SystemExit(child.returncode)
    raise SystemExit("bench: gave up after repeated relay wedges")


if __name__ == "__main__":
    import sys

    if "--_inner" in sys.argv:
        _run_inner_with_retries()
    else:
        _supervise()
