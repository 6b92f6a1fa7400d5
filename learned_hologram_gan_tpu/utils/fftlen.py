"""FFT-friendly size selection for padded sampling grids.

XLA's TPU FFT is fast for 2/3/5-smooth lengths; other factors fall back to
Bluestein, which pads to the next power of two internally and can multiply the
working set several-fold (the 4K reference geometry 3840 + 2*564 = 4968 =
2^3*3^3*23 is such a case).  These helpers pick the smallest smooth padded
sizes at or above the physically-required minimum padding.
"""

from __future__ import annotations

from typing import Tuple


def is_smooth(n: int, primes=(2, 3, 5)) -> bool:
    for p in primes:
        while n % p == 0:
            n //= p
    return n == 1


def next_fast_len(n: int) -> int:
    """Smallest 5-smooth integer >= n."""
    while not is_smooth(n):
        n += 1
    return n


def good_fft_pads(rows: int, cols: int, min_pad_rows: int) -> Tuple[int, int]:
    """(pad_rows, pad_cols) giving 5-smooth padded dims with at least the
    reference's padding on each axis (pad_cols >= min_pad_rows * cols/rows)."""
    min_pad_cols = int(min_pad_rows * (cols / rows))
    padded_r = next_fast_len(rows + 2 * min_pad_rows)
    padded_c = next_fast_len(cols + 2 * min_pad_cols)
    # keep parity so the padding splits evenly
    if (padded_r - rows) % 2:
        padded_r = next_fast_len(padded_r + 1)
    if (padded_c - cols) % 2:
        padded_c = next_fast_len(padded_c + 1)
    return (padded_r - rows) // 2, (padded_c - cols) // 2
