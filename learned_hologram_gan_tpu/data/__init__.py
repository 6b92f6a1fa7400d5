"""Data layer: memmap datasets, device prefetch, EXR conversion."""

from .exr import (
    DataConverterExr2Bin,
    get_files_in_dir,
    read_exr,
    read_exr_in_multi_folders,
)
from .memmap import (
    AmpPhsDataset,
    ImgDepthAmpPhsDataset,
    ImgDepthDataset,
    batch_indices,
    gather_batch,
)
from .device import (
    RotatingDeviceDataset,
    dataset_to_device,
    device_epoch_loader,
)
from .prefetch import epoch_loader, prefetch_to_device

__all__ = [
    "AmpPhsDataset",
    "DataConverterExr2Bin",
    "ImgDepthAmpPhsDataset",
    "ImgDepthDataset",
    "batch_indices",
    "RotatingDeviceDataset",
    "dataset_to_device",
    "device_epoch_loader",
    "epoch_loader",
    "gather_batch",
    "get_files_in_dir",
    "prefetch_to_device",
    "read_exr",
    "read_exr_in_multi_folders",
]
