"""Miscellaneous parity utilities (reference utilities.py:15-50, 403-487)."""

from __future__ import annotations

import zipfile
from typing import List, Union

import jax
import jax.numpy as jnp
import numpy as np


def complex_plain(amplitude: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
    """A * exp(i * phi) (reference utilities.complex_plain, :15-27)."""
    from ..ops.asm import field

    return field(amplitude, phase)


def phase_tensor_generator(
    image_path_or_array: Union[str, jnp.ndarray, np.ndarray]
) -> jnp.ndarray:
    """Image file -> phase map scaled to [0, 2*pi]; arrays pass through.

    Matches reference utilities.phase_tensor_generator (:30-50): a path is
    loaded as (C, H, W) float in [0, 1] and scaled by 2*pi; an array input is
    returned unchanged.
    """
    if isinstance(image_path_or_array, str):
        from PIL import Image

        img = np.asarray(Image.open(image_path_or_array), dtype=np.float32) / 255.0
        if img.ndim == 2:
            img = img[None]
        else:
            img = np.transpose(img, (2, 0, 1))
        return jnp.asarray(img * 2.0 * np.pi)
    if isinstance(image_path_or_array, (jnp.ndarray, np.ndarray)):
        return jnp.asarray(image_path_or_array)
    raise ValueError("The input should be a string or an array.")


def num_devices() -> int:
    """Device count (the reference's num_gpus, utilities.py:403-407)."""
    return jax.device_count()


def try_device(i: int = 0):
    """The i-th accelerator, or the default device (reference try_gpu, :410-415)."""
    devices = jax.devices()
    if i < len(devices):
        return devices[i]
    print(f"device with index '{i}' is not available")
    return devices[0]


def devices_info() -> List[str]:
    """Describe every visible device (reference gpus_info, :431-436)."""
    infos = [f"device {i}: {d.device_kind} ({d.platform})" for i, d in enumerate(jax.devices())]
    for line in infos:
        print(line)
    return infos


def unzip_file(zip_path: str, dest_path: str) -> None:
    """Extract a zip archive (reference utilities.unzip_file, :475-487)."""
    with zipfile.ZipFile(zip_path, "r") as zf:
        zf.extractall(dest_path)
