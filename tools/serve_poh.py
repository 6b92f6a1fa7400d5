#!/usr/bin/env python
"""POH inference server: micro-batched RGBD -> phase-only hologram serving.

Production-deployment counterpart of `generatePOH.py` (which is offline,
one-shot).  Design, TPU-first:

* **Shape-bucketed jit**: the generator is compiled ONCE per (bucket batch,
  rows, cols) at startup — request traffic never triggers an XLA compile.
* **Micro-batching**: concurrent requests are queued and fused into one
  device call (up to ``--max_batch``, waiting at most ``--batch_timeout_ms``)
  — the MXU sees large batches even when clients send singles.  Short
  batches are padded up to the bucket and sliced on the way out.
* **Zero dependencies**: stdlib ``http.server`` (threaded); tensors travel
  as raw little-endian float32 bytes with shape headers.

API:
  POST /poh     body = raw f32 bytes of shape (B, 4, rows, cols);
                headers: X-Batch: B.  Response: raw f32 POH bytes
                (B, 3, rows, cols), X-Shape header.
  POST /focal_stack  body = raw f32 POH bytes (B, 3, rows, cols);
                headers: X-Batch: B, X-Distances: comma-separated relative
                depths in meters (applied to the image-plane spectrum, same
                semantics as the reference's multi-distance reconstruction,
                watermelon.py:216-234).  Response: raw f32 amplitude bytes
                (B, D, 3, rows, cols), X-Shape header.  Distance VALUES are
                a traced argument (`asm.freq2amp_at`) — only the distance
                COUNT picks a compiled bucket, so sweeping focus never
                recompiles.
  GET  /healthz JSON: uptime, request/batch counters, mean batch ms.

Run:  python tools/serve_poh.py --model_path G.msgpack --rows 384 --cols 384
Test: tests/test_serve.py drives it over HTTP on CPU.
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class PohService:
    """Jitted, bucketed, micro-batching generator service."""

    def __init__(self, model_path, rows, cols, pad_size,
                 filter_radius_coefficient=0.45, unet_base_features=64,
                 dtype="float32", buckets=(1, 2, 4, 8), batch_timeout_ms=5.0,
                 cpu=False, quantize="none", qtree_path=None, calib_path=None,
                 calib_num=8):
        if cpu:
            import jax

            jax.config.update("jax_platforms", "cpu")
        import jax
        import jax.numpy as jnp

        from learned_hologram_gan_tpu.config import GeneratorConfig
        from learned_hologram_gan_tpu.models import (
            Generator,
            make_generator_plan,
        )
        from flax import serialization

        self.rows, self.cols = rows, cols
        self.buckets = tuple(sorted(buckets))
        self.max_batch = self.buckets[-1]
        self.batch_timeout = batch_timeout_ms / 1e3

        cfg = GeneratorConfig(
            rows=rows, cols=cols, pad_size=pad_size,
            filter_radius_coefficient=filter_radius_coefficient,
            unet_base_features=unet_base_features, dtype=dtype,
        )
        gen = Generator(cfg)
        self.plan = make_generator_plan(cfg)
        dummy = jnp.zeros((1, 4, rows, cols), jnp.float32)
        variables = gen.init(jax.random.key(0), self.plan, dummy, train=False)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        if model_path and os.path.exists(model_path):
            with open(model_path, "rb") as f:
                loaded = serialization.from_bytes(
                    {"params": params, "batch_stats": batch_stats}, f.read()
                )
            params, batch_stats = loaded["params"], loaded["batch_stats"]
            print(f"loaded generator weights from {model_path}")
        else:
            print(f"WARNING: model path {model_path!r} not found; random init")
        self._params, self._bs = params, batch_stats

        # ---- optional int8 model quantization (nn/quant.py q8 chain) ----
        # The measured deployment option (BASELINE.md round 4: 240.6 POH/s,
        # |dPSNR| <= 0.004 dB vs bf16): stage-1 UNet runs the full-integer
        # int8 pipeline; stage 2 (spectral, parameter-light) stays float.
        # Scales come from a committed qtree artifact (--qtree_path) or are
        # calibrated at startup from a committed RGBD batch (--calib_path).
        self.quantize = quantize
        qtree = None
        if quantize == "int8":
            from learned_hologram_gan_tpu.nn.quant import (
                load_qtree,
                quantize_unet_q8,
                quantized_bytes,
                save_qtree,
            )

            if qtree_path and os.path.exists(qtree_path):
                qtree = load_qtree(qtree_path)
                print(f"loaded int8 qtree from {qtree_path} "
                      f"({quantized_bytes(qtree) / 1e6:.1f} MB packed)")
            elif calib_path and os.path.exists(calib_path):
                from learned_hologram_gan_tpu.models.generator import (
                    nchw_to_nhwc,
                )

                calib = np.load(calib_path)[:calib_num]
                if calib.ndim != 4 or calib.shape[1] != 4:
                    raise SystemExit(
                        f"--calib_path must hold an (N,4,R,C) f32 RGBD "
                        f"array, got {calib.shape}"
                    )
                qtree = quantize_unet_q8(
                    params["part1"]["unet"], batch_stats["part1"]["unet"],
                    nchw_to_nhwc(jnp.asarray(calib, jnp.float32)),
                )
                print(f"calibrated int8 qtree from {calib.shape[0]} samples "
                      f"({quantized_bytes(qtree) / 1e6:.1f} MB packed)")
                if qtree_path:
                    save_qtree(qtree, qtree_path)
                    print(f"saved int8 qtree to {qtree_path}")
            else:
                raise SystemExit(
                    "--quantize int8 needs --qtree_path (a saved quantized "
                    "model) or --calib_path (an (N,4,R,C) f32 RGBD .npy "
                    "calibration batch)"
                )
        elif quantize != "none":
            raise SystemExit(f"unknown --quantize mode {quantize!r}")
        self._qtree = qtree

        if quantize == "int8":
            from learned_hologram_gan_tpu.models.generator import (
                generator_apply_quant,
            )

            @jax.jit
            def infer(params, bs, qtree, plan, rgbd):
                return generator_apply_quant(
                    gen, {"params": params, "batch_stats": bs}, qtree, plan,
                    rgbd,
                )
        else:

            @jax.jit
            def infer(params, bs, qtree, plan, rgbd):
                del qtree
                return gen.apply(
                    {"params": params, "batch_stats": bs}, plan, rgbd,
                    train=False,
                )

        self._infer = infer
        self._jnp = jnp

        from learned_hologram_gan_tpu.ops import asm

        @jax.jit
        def stack(plan, poh, dists):
            freq = asm.propagate_poh2freq_forward(plan, poh)
            return asm.freq2amp_at(plan, freq, dists)

        self._stack = stack
        # Focal-stack D buckets: requests pad their distance list up to the
        # nearest bucket (repeating the last depth) and slice the reply, so
        # only len-bucket changes compile.  (1, D) per D bucket is warmed at
        # startup; other (batch, D) combos compile on first use — logged.
        self.stack_buckets = (1, 3, 8, 21)

        # warmup: compile every bucket up front so traffic never compiles
        for b in self.buckets:
            x = jnp.zeros((b, 4, rows, cols), jnp.float32)
            np.asarray(infer(params, batch_stats, qtree, self.plan, x))
        for d in self.stack_buckets:
            poh = jnp.zeros((1, 3, rows, cols), jnp.float32)
            np.asarray(stack(self.plan, poh, jnp.zeros((d,), jnp.float32)))
        print(f"compiled buckets {self.buckets} at {rows}x{cols} "
              f"(+focal-stack D buckets {self.stack_buckets})")

        self._q: queue.Queue = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "batch_ms_total": 0.0,
                      "started": time.time()}
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # -- request side ------------------------------------------------------
    def submit(self, rgbd: np.ndarray) -> np.ndarray:
        """Blocking: enqueue one request array (B,4,R,C), await its POH."""
        done = threading.Event()
        slot = {}
        self._q.put((rgbd, slot, done))
        done.wait()
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["poh"]

    # -- batching worker ---------------------------------------------------
    def _bucket_for(self, n):
        for b in self.buckets:
            if n <= b:
                return b
        return self.max_batch

    def _loop(self):
        jnp = self._jnp
        while True:
            first = self._q.get()
            items = [first]
            total = first[0].shape[0]
            deadline = time.time() + self.batch_timeout
            while total < self.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                items.append(nxt)
                total += nxt[0].shape[0]
            try:
                concat = np.concatenate([it[0] for it in items], axis=0)
                n = concat.shape[0]
                bucket = self._bucket_for(n)
                if n < bucket:
                    pad = np.repeat(concat[-1:], bucket - n, axis=0)
                    concat = np.concatenate([concat, pad], axis=0)
                elif n > bucket:  # larger than max bucket: chunk
                    outs = []
                    for lo in range(0, n, self.max_batch):
                        chunk = concat[lo : lo + self.max_batch]
                        outs.append(self._run(chunk))
                    self._deliver(items, np.concatenate(outs, axis=0))
                    continue
                poh = self._run(concat)[:n]
                self._deliver(items, poh)
            except Exception as e:  # deliver the failure to every waiter
                for _, slot, done in items:
                    slot["error"] = f"{type(e).__name__}: {e}"
                    done.set()

    def _run(self, x: np.ndarray) -> np.ndarray:
        b = x.shape[0]
        bucket = self._bucket_for(b)
        if b < bucket:
            x = np.concatenate([x, np.repeat(x[-1:], bucket - b, axis=0)], 0)
        t0 = time.perf_counter()
        out = np.asarray(
            self._infer(self._params, self._bs, self._qtree, self.plan,
                        self._jnp.asarray(x))
        )[:b]
        self.stats["batches"] += 1
        self.stats["batch_ms_total"] += (time.perf_counter() - t0) * 1e3
        return out

    # -- focal-stack reconstruction ---------------------------------------
    def focal_stack(self, poh: np.ndarray, distances) -> np.ndarray:
        """POH (B,3,R,C) + depths (D,) -> amplitude focal stack (B,D,3,R,C).

        Unlike /poh, requests are not cross-fused (each carries its own
        depth list); batch and depth-count are padded to buckets so the
        compile cache stays tiny.
        """
        b, d = poh.shape[0], len(distances)
        bb = self._bucket_for(b)
        db = next((s for s in self.stack_buckets if d <= s),
                  self.stack_buckets[-1])
        if d > db:
            raise ValueError(
                f"at most {db} distances per request (got {d})")
        dv = np.asarray(
            list(distances) + [distances[-1]] * (db - d), np.float32)
        if b < bb:
            poh = np.concatenate(
                [poh, np.repeat(poh[-1:], bb - b, axis=0)], 0)
        t0 = time.perf_counter()
        amp = np.asarray(self._stack(
            self.plan, self._jnp.asarray(poh), self._jnp.asarray(dv)
        ))[:b, :d]
        self.stats["batches"] += 1
        self.stats["batch_ms_total"] += (time.perf_counter() - t0) * 1e3
        self.stats["requests"] += 1
        return amp

    def _deliver(self, items, poh: np.ndarray):
        lo = 0
        for arr, slot, done in items:
            b = arr.shape[0]
            slot["poh"] = poh[lo : lo + b]
            lo += b
            self.stats["requests"] += 1
            done.set()


def make_handler(service: PohService):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            s = service.stats
            batches = max(s["batches"], 1)
            body = json.dumps({
                "uptime_s": round(time.time() - s["started"], 1),
                "requests": s["requests"],
                "batches": s["batches"],
                # wall time of one fused batch incl. host<->device transfer
                "mean_batch_ms": round(s["batch_ms_total"] / batches, 2),
                "rows": service.rows, "cols": service.cols,
                "buckets": list(service.buckets),
                "quantize": service.quantize,
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path == "/focal_stack":
                self._do_focal_stack()
                return
            if self.path != "/poh":
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                b = int(self.headers.get("X-Batch", "1"))
                raw = self.rfile.read(n)
                expect = b * 4 * service.rows * service.cols * 4
                if n != expect:
                    raise ValueError(
                        f"body is {n} bytes, expected {expect} for "
                        f"({b},4,{service.rows},{service.cols}) f32"
                    )
                rgbd = np.frombuffer(raw, np.float32).reshape(
                    b, 4, service.rows, service.cols
                )
                poh = service.submit(rgbd)
                # wire format: f32 (default) or phase-quantized u16/u8 —
                # POH is a phase map, so k/2^bits * 2pi reconstructs it
                # (u16 ~ 1e-4 rad error); halves/quarters the egress for
                # bandwidth-bound links (SLM drivers rarely need f32 anyway)
                quant = (self.headers.get("X-Quantize") or "f32").lower()
                if quant in ("u8", "u16"):
                    dt = np.uint8 if quant == "u8" else np.uint16
                    levels = 256 if quant == "u8" else 65536
                    wrapped = np.mod(poh, 2 * np.pi) / (2 * np.pi)
                    q = np.minimum(
                        np.round(wrapped * levels), levels - 1
                    ).astype(dt)
                    body = np.ascontiguousarray(q).tobytes()
                elif quant == "f32":
                    body = np.ascontiguousarray(poh, np.float32).tobytes()
                else:
                    raise ValueError(f"unknown X-Quantize {quant!r}")
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("X-Shape", ",".join(map(str, poh.shape)))
                self.send_header("X-Quantize", quant)
                if quant != "f32":
                    self.send_header("X-Scale", "6.283185307179586")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:
                msg = f"{type(e).__name__}: {e}".encode()
                self.send_response(400)
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

        def _do_focal_stack(self):
            try:
                n = int(self.headers.get("Content-Length", "0"))
                b = int(self.headers.get("X-Batch", "1"))
                dists_hdr = self.headers.get("X-Distances", "")
                if not dists_hdr:
                    raise ValueError(
                        "X-Distances header required: comma-separated "
                        "depths in meters, e.g. '-0.005,0,0.005'"
                    )
                dists = [float(t) for t in dists_hdr.split(",") if t.strip()]
                raw = self.rfile.read(n)
                expect = b * 3 * service.rows * service.cols * 4
                if n != expect:
                    raise ValueError(
                        f"body is {n} bytes, expected {expect} for "
                        f"({b},3,{service.rows},{service.cols}) f32 POH"
                    )
                poh = np.frombuffer(raw, np.float32).reshape(
                    b, 3, service.rows, service.cols
                )
                amp = service.focal_stack(poh, dists)
                body = np.ascontiguousarray(amp, np.float32).tobytes()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("X-Shape", ",".join(map(str, amp.shape)))
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:
                msg = f"{type(e).__name__}: {e}".encode()
                self.send_response(400)
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", type=str, default="")
    ap.add_argument("--rows", type=int, default=384)
    ap.add_argument("--cols", type=int, default=384)
    ap.add_argument("--pad_size", type=int, default=320)
    ap.add_argument("--filter_radius_coefficient", type=float, default=0.45)
    ap.add_argument("--unet_base_features", type=int, default=64)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--port", type=int, default=8470)
    ap.add_argument("--buckets", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--batch_timeout_ms", type=float, default=5.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quantize", choices=("none", "int8"), default="none",
                    help="int8: serve the full-integer stage-1 UNet "
                         "(nn/quant.py q8 chain; measured +7%% POH/s at "
                         "|dPSNR| <= 0.004 dB, BASELINE.md round 4)")
    ap.add_argument("--qtree_path", type=str, default="",
                    help="saved quantized model (.npz from nn.quant."
                         "save_qtree); also written here after --calib_path "
                         "calibration")
    ap.add_argument("--calib_path", type=str, default="",
                    help="(N,4,R,C) f32 RGBD .npy batch for startup "
                         "activation-scale calibration")
    ap.add_argument("--calib_num", type=int, default=8)
    args = ap.parse_args()

    service = PohService(
        args.model_path, args.rows, args.cols, args.pad_size,
        args.filter_radius_coefficient, args.unet_base_features,
        args.dtype, tuple(args.buckets), args.batch_timeout_ms, args.cpu,
        quantize=args.quantize, qtree_path=args.qtree_path,
        calib_path=args.calib_path, calib_num=args.calib_num,
    )
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(service))
    print(f"serving POH on http://127.0.0.1:{srv.server_address[1]} "
          f"(POST /poh, GET /healthz)", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
