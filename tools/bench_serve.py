#!/usr/bin/env python
"""Measure served POH throughput through tools/serve_poh.py, bf16 vs int8.

Round-4 VERDICT #2 second half: the int8 model path is wired into the
server (--quantize int8); this tool measures what it actually serves.
For each precision it starts the real server process on the chip, drives
batch-16 requests over HTTP from localhost, and records two numbers:

* wire POH/s — what this host's client sees end to end.  Through the axon
  relay this is host-link-bound (~78 MB/s tunnel; BASELINE.md round 2), so
  it mostly prices the link, identically for both precisions.
* device batch ms (healthz ``mean_batch_ms``) — wall time of one fused
  batch inside the server, transfer included; the model-precision-sensitive
  number, comparable with the bench.py pipeline (batch 16).

Writes one summary JSON and prints it.

    python tools/bench_serve.py --model_path output/quality_run/generator.msgpack \
        --calib_data data/synth384 --out output/serving/summary.json
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def start_server(args, port, quantize, calib_path, qtree_path, log_path):
    cmd = [
        sys.executable, "tools/serve_poh.py",
        "--model_path", args.model_path,
        "--rows", str(args.rows), "--cols", str(args.cols),
        "--pad_size", str(args.pad_size),
        "--unet_base_features", str(args.unet_base_features),
        "--dtype", "bfloat16",
        "--port", str(port),
        "--buckets", str(args.batch),
        "--batch_timeout_ms", "1",
    ]
    if args.cpu:
        cmd.append("--cpu")
    if quantize == "int8":
        cmd += ["--quantize", "int8", "--calib_path", calib_path,
                "--qtree_path", qtree_path]
    log = open(log_path, "w")
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=log, stderr=subprocess.STDOUT)
    # wait for the serving line (compile included)
    deadline = time.time() + args.startup_timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(
                f"server ({quantize}) exited; see {log_path}")
        with open(log_path) as f:
            if "serving POH" in f.read():
                return proc
        time.sleep(2)
    proc.terminate()
    raise RuntimeError(f"server ({quantize}) failed to start; see {log_path}")


def drive(port, rgbd, reqs, wire_quant=None):
    """Sequential batch requests; returns (wire POH/s, healthz dict)."""
    body = np.ascontiguousarray(rgbd, np.float32).tobytes()
    # warmup request (first fetch may include lazy relay setup)
    _post(port, body, rgbd.shape[0], wire_quant)
    t0 = time.perf_counter()
    for _ in range(reqs):
        _post(port, body, rgbd.shape[0], wire_quant)
    dt = time.perf_counter() - t0
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/healthz")
    health = json.loads(conn.getresponse().read())
    return reqs * rgbd.shape[0] / dt, health


def _post(port, body, batch, wire_quant=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    headers = {"X-Batch": str(batch), "Content-Length": str(len(body))}
    if wire_quant:
        headers["X-Quantize"] = wire_quant
    conn.request("POST", "/poh", body=body, headers=headers)
    resp = conn.getresponse()
    data = resp.read()
    if resp.status != 200:
        raise RuntimeError(data.decode())
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default="output/quality_run/generator.msgpack")
    ap.add_argument("--calib_data", default="data/synth384",
                    help="dataset dir; 8 train RGBD samples calibrate int8")
    ap.add_argument("--rows", type=int, default=384)
    ap.add_argument("--cols", type=int, default=384)
    ap.add_argument("--pad_size", type=int, default=320)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reqs", type=int, default=8)
    ap.add_argument("--port", type=int, default=8811)
    ap.add_argument("--startup_timeout", type=float, default=1800)
    ap.add_argument("--out", default="output/serving/summary.json")
    ap.add_argument("--modes", nargs="*", default=["none", "int8"])
    ap.add_argument("--unet_base_features", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (use tiny --rows/--cols/--pad_size)")
    args = ap.parse_args()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    work = os.path.dirname(args.out)

    # calibration batch from real train samples (committed dataset recipe)
    from learned_hologram_gan_tpu.data import ImgDepthAmpPhsDataset

    ds = ImgDepthAmpPhsDataset(
        img_path=f"{args.calib_data}/train/img.bin",
        depth_path=f"{args.calib_data}/train/depth.bin",
        amp_path=f"{args.calib_data}/train/amp.bin",
        phs_path=f"{args.calib_data}/train/phs.bin",
        samples_num=8, height=args.rows, width=args.cols,
    )
    calib = np.stack([ds.get(i)[0] for i in range(8)]).astype(np.float32)
    calib_path = os.path.join(work, "calib.npy")
    np.save(calib_path, calib)
    qtree_path = os.path.join(work, "qtree_int8.npz")

    rng = np.random.default_rng(0)
    rgbd = np.stack(
        [ds.get(i % 8)[0] for i in range(args.batch)]
    ).astype(np.float32)
    del rng

    summary = {"batch": args.batch, "reqs": args.reqs,
               "rows": args.rows, "cols": args.cols}
    for mode in args.modes:
        label = "bf16" if mode == "none" else mode
        log_path = os.path.join(work, f"server_{label}.log")
        proc = start_server(args, args.port, mode, calib_path, qtree_path,
                            log_path)
        try:
            wire_rate, health = drive(args.port, rgbd, args.reqs)
            mean_ms = health["mean_batch_ms"]  # f32-wire drive only
            # wire-quantized reply (phase as u8: 1/4 the egress) on the same
            # server — the deployment combo for link-bound clients
            wire_rate_u8, _ = drive(args.port, rgbd, args.reqs,
                                    wire_quant="u8")
            summary[label] = {
                "wire_poh_per_s": round(wire_rate, 2),
                "wire_poh_per_s_u8": round(wire_rate_u8, 2),
                "mean_batch_ms": mean_ms,
                "device_poh_per_s": round(1e3 * args.batch / mean_ms, 1),
                "quantize": health["quantize"],
            }
            print(json.dumps({label: summary[label]}), flush=True)
        finally:
            proc.terminate()
            proc.wait(timeout=60)
        time.sleep(3)

    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
