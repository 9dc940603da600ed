"""Mesh construction helpers."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("dp", "tp"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2-D (dp, tp) device mesh.

    Defaults: all available devices, with tp = min(2, n) and dp = n // tp —
    batch parallelism first (it is embarrassingly parallel for this workload),
    rank/tensor parallelism second.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if axis_sizes is None:
        tp = 2 if n % 2 == 0 and n >= 2 else 1
        axis_sizes = (n // tp, tp)
    dp, tp = axis_sizes
    if dp * tp > n:
        raise ValueError(f"mesh {axis_sizes} needs {dp * tp} devices, have {n}")
    return Mesh(np.array(devs[: dp * tp]).reshape(dp, tp), axis_names)
