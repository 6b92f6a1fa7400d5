"""Image dumps + training-curve plots (reference utilities.py:87-203,506-565).

Headless-safe: matplotlib with the Agg backend, used only for figure output;
single images go through ``plt.imsave`` exactly like the reference's 3-D
branch (utilities.py:143-150).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np


def _ensure_dir(d: str) -> None:
    if d and not os.path.exists(d):
        os.makedirs(d)


def save_rgb_image(chw: np.ndarray, save_dir: str, title: str) -> str:
    """Save a (3, H, W) float array in [0, 1] as ``save_dir/title.png``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _ensure_dir(save_dir)
    img = np.clip(np.transpose(np.asarray(chw), (1, 2, 0)), 0.0, 1.0)
    path = os.path.join(save_dir, f"{title}.png")
    plt.imsave(path, img)
    return path


def multi_sample_plotter(
    tensor: np.ndarray,
    titles: Optional[Sequence[str]] = None,
    save_dir: Optional[str] = None,
) -> List[str]:
    """Save every (3, H, W) sample of a (N, 3, H, W) stack as a PNG.

    Matches the reference's CLI usage (utilities.multi_sample_plotter,
    utilities.py:179-203, with save_dir set): one ``{title}.png`` per sample,
    default titles 0..N-1.
    """
    tensor = np.asarray(tensor)
    if titles is None:
        titles = [str(i) for i in range(tensor.shape[0])]
    paths = []
    for i in range(tensor.shape[0]):
        paths.append(save_rgb_image(tensor[i], save_dir or ".", str(titles[i])))
    return paths


def extract_nested_value(data, keys: Sequence[str]):
    """Walk a nested dict by key path (reference utilities.py:490-503)."""
    if len(keys) == 1:
        return data[keys[0]]
    return extract_nested_value(data[keys[0]], keys[1:])


def training_process_visualizer(
    json_files: Sequence[str],
    metrics: Sequence[str],
    output_file: str = "plot.png",
    labels: Optional[Sequence[str]] = None,
) -> str:
    """Plot metric curves from the history JSONs (reference utilities.py:506-565).

    ``metrics`` entries are '/'-separated key paths, e.g.
    ``train_losses_tensor/G_loss``.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 6))
    for i, json_file in enumerate(json_files):
        with open(json_file, "r") as f:
            data = json.load(f)
        n_train = data["n_train"]
        label = (
            labels[i]
            if labels is not None
            else os.path.splitext(os.path.basename(json_file))[0]
        )
        for metric in metrics:
            series = extract_nested_value(data, metric.split("/"))
            plt.plot(n_train, series, label=f"{label} - {metric.split('/')[-1]}")

    plt.xlabel("Number of Training Samples")
    plt.ylabel("Value")
    plt.title(metrics[-1].split("/")[-1])
    plt.legend(loc="best")
    plt.grid(True)
    plt.tight_layout()
    plt.savefig(output_file)
    plt.close()
    return output_file


def multi_channel_plotter(
    tensor,
    title: Optional[str] = None,
    save_dir: Optional[str] = None,
    rgb_img: bool = True,
    color: int = 0,  # r = 0, g = 1, b = 2
) -> Optional[str]:
    """Plot/save a 2-D (single-channel) or 3-D (RGB) field image.

    Equivalent of reference ``utilities.multi_channel_plotter``
    (utilities.py:87-176), headless-adapted: the reference ``plt.show()``
    branches render per-channel subplot figures interactively; here every
    branch produces a PNG when ``save_dir`` is given (2-D saves a gray
    ``{title}_{color}.png``; 3-D with ``rgb_img`` saves the RGB composite
    plus a 1x4 per-channel panel figure), and returns the saved path.
    Leading singleton dims are squeezed, like the reference.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = np.squeeze(np.asarray(tensor))
    if arr.ndim >= 4 or arr.ndim <= 1:
        raise ValueError(
            f"Only 2-D and 3-D tensors are supported. The input tensor is "
            f"{arr.ndim}-D."
        )
    if title is None:
        title = "title_not_provided"
    if save_dir is None:
        return None
    _ensure_dir(save_dir)

    if arr.ndim == 2:
        fig = plt.figure()
        plt.imshow(np.clip(arr, 0.0, 1.0), cmap="gray")
        plt.axis("off")
        plt.title(title)
        color_name = ["red", "green", "blue"][color]
        path = os.path.join(save_dir, f"{title}_{color_name}.png")
        fig.savefig(path)
        plt.close(fig)
        return path

    if arr.shape[0] != 3:
        raise ValueError(
            "The input tensor should have 3 channels to represent RGB. "
            f"The input tensor has {arr.shape[0]} channels."
        )
    n = 4 if rgb_img else 3
    fig, axs = plt.subplots(1, n, figsize=(7.5 * n, 15))
    if rgb_img:
        axs[3].imshow(np.clip(np.transpose(arr, (1, 2, 0)), 0.0, 1.0))
        axs[3].axis("off")
        axs[3].set_title(title)
    for i in range(3):
        rgb = np.zeros((3, arr.shape[-2], arr.shape[-1]), dtype=np.float32)
        rgb[i] = arr[i]
        axs[i].imshow(np.clip(np.transpose(rgb, (1, 2, 0)), 0.0, 1.0))
        axs[i].axis("off")
        axs[i].set_title(title)
    path = os.path.join(save_dir, f"{title}.png")
    fig.savefig(path)
    plt.close(fig)
    return path
