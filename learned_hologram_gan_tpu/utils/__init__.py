"""Small utilities: normalizers, timing, plotting, misc parity helpers."""

from .misc import (
    complex_plain,
    devices_info,
    num_devices,
    phase_tensor_generator,
    try_device,
    unzip_file,
)
from .normalize import amplitude_normalizor, tensor_normalizor_2d
from .profiling import annotate, profile_op, trace
from .seed import set_seed
from .timer import device_timer

__all__ = [
    "amplitude_normalizor",
    "complex_plain",
    "devices_info",
    "device_timer",
    "num_devices",
    "phase_tensor_generator",
    "set_seed",
    "tensor_normalizor_2d",
    "try_device",
    "unzip_file",
]
