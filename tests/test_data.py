"""Data-layer tests: memmap datasets, batching, prefetch, EXR decode."""

import os
import struct
import zlib

import numpy as np
import pytest

from learned_hologram_gan_tpu import data as data_lib


# ---------------------------------------------------------------------------
# minimal EXR writer (test-only) to exercise the pure-Python reader
# ---------------------------------------------------------------------------

def _attr(name: str, type_: str, payload: bytes) -> bytes:
    return (
        name.encode() + b"\x00" + type_.encode() + b"\x00"
        + struct.pack("<i", len(payload)) + payload
    )


def _chlist(channels, pixel_type=2) -> bytes:
    out = b""
    for name in channels:
        out += name.encode() + b"\x00"
        out += struct.pack("<i", pixel_type)  # FLOAT=2, HALF=1
        out += b"\x00" * 4  # pLinear + reserved
        out += struct.pack("<ii", 1, 1)  # x/y sampling
    return out + b"\x00"


def _zip_predict_interleave(raw: bytes) -> bytes:
    n = len(raw)
    half = (n + 1) // 2
    arr = np.frombuffer(raw, dtype=np.uint8)
    t = np.empty(n, dtype=np.uint8)
    t[:half] = arr[0::2]
    t[half:] = arr[1::2]
    enc = t.astype(np.int32)
    enc[1:] = (enc[1:] - t[:-1].astype(np.int32) + 128 + 256) % 256
    return zlib.compress(enc.astype(np.uint8).tobytes())


def write_exr(path, rgb: np.ndarray, compression: int = 0, half: bool = False):
    """Write a single-part scanline EXR with channels B, G, R (alphabetical)."""
    _, h, w = rgb.shape
    dtype = np.float16 if half else np.float32
    pixel_type = 1 if half else 2
    header = b""
    header += _attr("channels", "chlist", _chlist(["B", "G", "R"], pixel_type))
    header += _attr("compression", "compression", bytes([compression]))
    header += _attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += _attr("displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += _attr("lineOrder", "lineOrder", b"\x00")
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    block_lines = {0: 1, 2: 1, 3: 16}[compression]
    num_blocks = (h + block_lines - 1) // block_lines

    blocks = []
    for b0 in range(0, h, block_lines):
        lines = min(block_lines, h - b0)
        raw = b""
        for line in range(lines):
            y = b0 + line
            for ch in ("B", "G", "R"):
                ci = {"R": 0, "G": 1, "B": 2}[ch]
                raw += rgb[ci, y].astype(dtype).tobytes()
        if compression in (2, 3):
            comp = _zip_predict_interleave(raw)
            payload = comp if len(comp) < len(raw) else raw
        else:
            payload = raw
        blocks.append((b0, payload))

    base = 8 + len(header) + 8 * num_blocks
    offsets, off = [], base
    for _, payload in blocks:
        offsets.append(off)
        off += 8 + len(payload)

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", 20000630, 2))
        f.write(header)
        f.write(struct.pack(f"<{num_blocks}Q", *offsets))
        for (y, payload) in blocks:
            f.write(struct.pack("<ii", y, len(payload)))
            f.write(payload)


@pytest.mark.parametrize("compression", [0, 2, 3])
def test_exr_roundtrip_float(tmp_path, compression):
    rng = np.random.default_rng(4)
    rgb = rng.random((3, 20, 13)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, rgb, compression=compression)
    got = data_lib.read_exr(p)
    np.testing.assert_allclose(got, rgb, rtol=1e-6)


def test_exr_roundtrip_half(tmp_path):
    rng = np.random.default_rng(5)
    rgb = rng.random((3, 5, 7)).astype(np.float32)
    p = str(tmp_path / "h.exr")
    write_exr(p, rgb, compression=3, half=True)
    got = data_lib.read_exr(p)
    np.testing.assert_allclose(got, rgb.astype(np.float16).astype(np.float32), rtol=1e-3)


def test_exr_to_bin_converter(tmp_path):
    rng = np.random.default_rng(6)
    d = tmp_path / "img"
    d.mkdir()
    samples = [rng.random((3, 6, 6)).astype(np.float32) for _ in range(3)]
    for i, s in enumerate(samples):
        write_exr(str(d / f"{i:03d}.exr"), s, compression=3)
    conv = data_lib.DataConverterExr2Bin(str(d), channels_num=3, height=6, width=6)
    out_path = conv.save_as_np_array()
    arr = np.fromfile(out_path, dtype=np.float32).reshape(3, 3, 6, 6)
    np.testing.assert_allclose(arr, np.stack(samples), rtol=1e-6)


# ---------------------------------------------------------------------------
# memmap datasets
# ---------------------------------------------------------------------------

def _write_bins(tmp_path, n=6, c=3, h=4, w=4):
    rng = np.random.default_rng(7)
    paths = {}
    arrays = {}
    for name in ("img", "depth", "amp", "phs"):
        a = rng.random((n, c, h, w)).astype(np.float32)
        p = str(tmp_path / f"{name}.bin")
        a.tofile(p)
        paths[name] = p
        arrays[name] = a
    return paths, arrays


def test_img_depth_amp_phs_dataset(tmp_path):
    paths, arrays = _write_bins(tmp_path)
    ds = data_lib.ImgDepthAmpPhsDataset(
        paths["img"], paths["depth"], paths["amp"], paths["phs"],
        samples_num=6, channels_num=3, height=4, width=4,
    )
    assert len(ds) == 6
    rgbd, amp, phs = ds[2]
    assert rgbd.shape == (4, 4, 4)
    np.testing.assert_array_equal(rgbd[:3], arrays["img"][2])
    np.testing.assert_array_equal(rgbd[3], arrays["depth"][2, 0])
    np.testing.assert_array_equal(amp, arrays["amp"][2])
    with pytest.raises(IndexError):
        ds[6]


def test_amp_phs_dataset_scales_phase(tmp_path):
    paths, arrays = _write_bins(tmp_path)
    ds = data_lib.AmpPhsDataset(paths["amp"], paths["phs"], samples_num=6,
                                channels_num=3, height=4, width=4)
    amp, phs = ds[0]
    np.testing.assert_allclose(phs, 2 * np.pi * arrays["phs"][0], rtol=1e-6)


def test_batch_indices_semantics():
    batches = list(data_lib.batch_indices(10, 4, shuffle=False, drop_last=True))
    assert [len(b) for b in batches] == [4, 4]
    batches = list(data_lib.batch_indices(10, 4, shuffle=False, drop_last=False))
    assert [len(b) for b in batches] == [4, 4, 2]
    a = list(data_lib.batch_indices(10, 4, shuffle=True, drop_last=True, seed=0))
    b = list(data_lib.batch_indices(10, 4, shuffle=True, drop_last=True, seed=0))
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))


def test_epoch_loader_prefetches_device_batches(tmp_path):
    paths, arrays = _write_bins(tmp_path)
    ds = data_lib.ImgDepthDataset(paths["img"], paths["depth"], samples_num=6,
                                  channels_num=3, height=4, width=4)
    batches = list(data_lib.epoch_loader(ds, 2, shuffle=False, drop_last=True))
    assert len(batches) == 3
    assert batches[0].shape == (2, 4, 4, 4)
    import jax
    assert isinstance(batches[0], jax.Array)


def test_native_decoder_matches_python(tmp_path):
    """The C++ block decoder must be bit-identical to the python fallback."""
    from learned_hologram_gan_tpu.data import exr as exr_mod

    if exr_mod._native_lib() is None:
        pytest.skip("native decoder unavailable (no toolchain)")
    rng = np.random.default_rng(12)
    for comp, half in ((0, False), (2, False), (3, False), (3, True)):
        rgb = rng.random((3, 21, 18)).astype(np.float32)
        p = str(tmp_path / f"n_{comp}_{half}.exr")
        write_exr(p, rgb, compression=comp, half=half)
        native = exr_mod._read_exr_pure(p)
        saved = exr_mod._NATIVE_LIB
        exr_mod._NATIVE_LIB = None
        try:
            pure = exr_mod._read_exr_pure(p)
        finally:
            exr_mod._NATIVE_LIB = saved
        np.testing.assert_array_equal(native, pure)


def test_epoch_loader_wire_dtype(tmp_path):
    """dtype= casts on the host before the transfer (halves wire bytes for
    link-bound streaming); values round to bf16 exactly, structure kept."""
    import jax.numpy as jnp

    paths, arrays = _write_bins(tmp_path)
    ds = data_lib.ImgDepthAmpPhsDataset(
        paths["img"], paths["depth"], paths["amp"], paths["phs"],
        samples_num=6, channels_num=3, height=4, width=4)
    batches = list(data_lib.epoch_loader(
        ds, 2, shuffle=False, drop_last=True, dtype=jnp.bfloat16))
    assert len(batches) == 3 and len(batches[0]) == 3
    for a in batches[0]:
        assert a.dtype == jnp.bfloat16
    ref = [x.astype(jnp.bfloat16) for x in ds.get(0)]
    for a, r in zip(batches[0], ref):
        np.testing.assert_array_equal(np.asarray(a[0], np.float32),
                                      np.asarray(r, np.float32))

    # single-tensor dataset: the bare-array path must not be iterated
    ds2 = data_lib.ImgDepthDataset(paths["img"], paths["depth"], samples_num=6,
                                   channels_num=3, height=4, width=4)
    b2 = list(data_lib.epoch_loader(ds2, 2, shuffle=False, drop_last=True,
                                    dtype=jnp.bfloat16))
    assert b2[0].shape == (2, 4, 4, 4) and b2[0].dtype == jnp.bfloat16
