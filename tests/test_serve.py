"""POH serving (tools/serve_poh.py): HTTP round trip, micro-batching, parity."""

import http.client
import os
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

# the module fixture compiles the full serving generator (~2 min on the CPU
# test mesh) — slow tier (run with: pytest -m "slow or not slow")
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 8791
ROWS = COLS = 16


@pytest.fixture(scope="module")
def server():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, "tools/serve_poh.py", "--cpu", "--rows", str(ROWS),
         "--cols", str(COLS), "--pad_size", "4", "--unet_base_features", "2",
         "--port", str(PORT), "--buckets", "1", "2", "4",
         "--batch_timeout_ms", "30"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    # wait for the "serving" line (compile incl.)
    deadline = time.time() + 300
    for line in proc.stdout:
        if "serving POH" in line:
            break
        if time.time() > deadline or proc.poll() is not None:
            raise RuntimeError(f"server failed to start: {line}")
    yield proc
    proc.terminate()
    proc.wait(timeout=30)


def _post(rgbd: np.ndarray):
    conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=120)
    body = np.ascontiguousarray(rgbd, np.float32).tobytes()
    conn.request("POST", "/poh", body=body,
                 headers={"X-Batch": str(rgbd.shape[0]),
                          "Content-Length": str(len(body))})
    resp = conn.getresponse()
    data = resp.read()
    if resp.status != 200:
        raise RuntimeError(data.decode())
    shape = tuple(int(v) for v in resp.getheader("X-Shape").split(","))
    return np.frombuffer(data, np.float32).reshape(shape)


def test_healthz_and_single_request(server):
    conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=60)
    conn.request("GET", "/healthz")
    health = conn.getresponse().read()
    assert b"buckets" in health

    rng = np.random.default_rng(0)
    rgbd = rng.random((1, 4, ROWS, COLS)).astype(np.float32)
    poh = _post(rgbd)
    assert poh.shape == (1, 3, ROWS, COLS)
    assert np.isfinite(poh).all()
    # phase map range (double-phase encode output)
    assert poh.min() >= -2 * np.pi - 1e-3 and poh.max() <= 4 * np.pi + 1e-3


def test_concurrent_requests_are_batched_and_deterministic(server):
    rng = np.random.default_rng(1)
    reqs = [rng.random((1, 4, ROWS, COLS)).astype(np.float32) for _ in range(4)]
    outs = [None] * 4

    def call(i):
        outs[i] = _post(reqs[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # same input => same output regardless of which micro-batch carried it
    again = _post(reqs[2])
    np.testing.assert_allclose(outs[2], again, atol=1e-5)

    # batch-of-2 request equals two singles stacked
    pair = np.concatenate([reqs[0], reqs[1]], axis=0)
    both = _post(pair)
    np.testing.assert_allclose(both[0], outs[0][0], atol=1e-5)
    np.testing.assert_allclose(both[1], outs[1][0], atol=1e-5)


def test_bad_request_is_a_400(server):
    conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=60)
    conn.request("POST", "/poh", body=b"short",
                 headers={"X-Batch": "1", "Content-Length": "5"})
    resp = conn.getresponse()
    assert resp.status == 400
    assert b"expected" in resp.read()


def test_focal_stack_endpoint(server):
    """POST /focal_stack: POH -> amplitude stack at client-chosen depths,
    checked against an in-process `asm.freq2amp_at` oracle with the same
    generator plan."""
    rng = np.random.default_rng(5)
    rgbd = rng.random((1, 4, ROWS, COLS)).astype(np.float32)
    poh = _post(rgbd)

    dists = [-5e-4, 0.0, 5e-4]
    conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=120)
    body = np.ascontiguousarray(poh, np.float32).tobytes()
    conn.request("POST", "/focal_stack", body=body,
                 headers={"X-Batch": "1", "Content-Length": str(len(body)),
                          "X-Distances": ",".join(map(str, dists))})
    resp = conn.getresponse()
    data = resp.read()
    assert resp.status == 200, data.decode()
    shape = tuple(int(v) for v in resp.getheader("X-Shape").split(","))
    amp = np.frombuffer(data, np.float32).reshape(shape)
    assert amp.shape == (1, 3, 3, ROWS, COLS)
    assert np.isfinite(amp).all() and amp.max() > 0

    # in-process oracle with the identical plan config
    import jax.numpy as jnp

    from learned_hologram_gan_tpu.config import GeneratorConfig
    from learned_hologram_gan_tpu.models import make_generator_plan
    from learned_hologram_gan_tpu.ops import asm

    plan = make_generator_plan(GeneratorConfig(
        rows=ROWS, cols=COLS, pad_size=4, filter_radius_coefficient=0.45,
        unet_base_features=2))
    freq = asm.propagate_poh2freq_forward(plan, jnp.asarray(poh))
    want = asm.freq2amp_at(plan, freq, jnp.asarray(dists, jnp.float32))
    np.testing.assert_allclose(amp, np.asarray(want), atol=1e-4)

    # missing X-Distances is a clean 400
    conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=60)
    conn.request("POST", "/focal_stack", body=body,
                 headers={"X-Batch": "1", "Content-Length": str(len(body))})
    resp = conn.getresponse()
    assert resp.status == 400
    assert b"X-Distances" in resp.read()


INT8_PORT = PORT + 1


@pytest.fixture(scope="module")
def server_int8(tmp_path_factory):
    """A second server with --quantize int8: startup calibration from a
    committed-style RGBD batch, qtree saved to disk (the deployment flow)."""
    tmp = tmp_path_factory.mktemp("int8_serve")
    calib = str(tmp / "calib.npy")
    qtree = str(tmp / "qtree.npz")
    rng = np.random.default_rng(11)
    np.save(calib, rng.random((4, 4, ROWS, COLS)).astype(np.float32))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, "tools/serve_poh.py", "--cpu", "--rows", str(ROWS),
         "--cols", str(COLS), "--pad_size", "4", "--unet_base_features", "2",
         "--port", str(INT8_PORT), "--buckets", "1", "2",
         "--batch_timeout_ms", "30", "--quantize", "int8",
         "--calib_path", calib, "--qtree_path", qtree],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    deadline = time.time() + 300
    for line in proc.stdout:
        if "serving POH" in line:
            break
        if time.time() > deadline or proc.poll() is not None:
            raise RuntimeError(f"int8 server failed to start: {line}")
    yield proc, qtree
    proc.terminate()
    proc.wait(timeout=30)


def _post_to(port, rgbd: np.ndarray):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    body = np.ascontiguousarray(rgbd, np.float32).tobytes()
    conn.request("POST", "/poh", body=body,
                 headers={"X-Batch": str(rgbd.shape[0]),
                          "Content-Length": str(len(body))})
    resp = conn.getresponse()
    data = resp.read()
    if resp.status != 200:
        raise RuntimeError(data.decode())
    shape = tuple(int(v) for v in resp.getheader("X-Shape").split(","))
    return np.frombuffer(data, np.float32).reshape(shape)


def test_int8_server_serves_and_persists_qtree(server_int8):
    proc, qtree_path = server_int8
    # healthz reports the model precision
    conn = http.client.HTTPConnection("127.0.0.1", INT8_PORT, timeout=60)
    conn.request("GET", "/healthz")
    health = conn.getresponse().read()
    assert b'"quantize": "int8"' in health
    # startup calibration wrote the reusable deployment artifact
    assert os.path.exists(qtree_path)

    rng = np.random.default_rng(2)
    rgbd = rng.random((1, 4, ROWS, COLS)).astype(np.float32)
    poh = _post_to(INT8_PORT, rgbd)
    assert poh.shape == (1, 3, ROWS, COLS)
    assert np.isfinite(poh).all()
    assert poh.min() >= -2 * np.pi - 1e-3 and poh.max() <= 4 * np.pi + 1e-3
    # deterministic across micro-batches
    again = _post_to(INT8_PORT, rgbd)
    np.testing.assert_allclose(poh, again, atol=1e-5)


def test_quantized_wire_format(server):
    """X-Quantize: u16 returns phase quantized to 2pi/65536 — reconstruct
    and compare against the f32 response mod 2pi."""
    rng = np.random.default_rng(3)
    rgbd = rng.random((1, 4, ROWS, COLS)).astype(np.float32)
    f32 = _post(rgbd)

    conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=120)
    body = np.ascontiguousarray(rgbd, np.float32).tobytes()
    conn.request("POST", "/poh", body=body,
                 headers={"X-Batch": "1", "Content-Length": str(len(body)),
                          "X-Quantize": "u16"})
    resp = conn.getresponse()
    data = resp.read()
    assert resp.status == 200
    shape = tuple(int(v) for v in resp.getheader("X-Shape").split(","))
    scale = float(resp.getheader("X-Scale"))
    q = np.frombuffer(data, np.uint16).reshape(shape)
    assert len(data) == f32.nbytes // 2
    recon = q.astype(np.float64) / 65536.0 * scale
    want = np.mod(f32, 2 * np.pi)
    # circular distance (wrap at 2pi)
    d = np.abs(recon - want)
    d = np.minimum(d, 2 * np.pi - d)
    assert d.max() < 2 * np.pi / 65536 * 1.5
