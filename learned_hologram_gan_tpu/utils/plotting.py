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
