"""Device-mesh helpers for multi-chip execution.

The reference has no distributed machinery at all (SURVEY.md section 2.8);
the TPU build's parallel axes are a new design:

* ``dp``  -- data parallelism over training batches (PoseNet training),
* ``sp``  -- point sharding of ICP normal equations (the 6x6 J^T J / J^T r
  reduce perfectly with a single tiny psum per GN iteration),
* ``tp``  -- tensor parallelism of weight feature dimensions (conv kernels,
  regression heads) via NamedSharding placement (parallel/tp.py), enabled
  with ``training.tensor_parallel > 1``.

Collectives ride the ICI mesh; there is no host-side communication backend.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: Optional[Sequence[Tuple[str, int]]] = None,
              devices=None) -> Mesh:
    """Builds a Mesh from (axis, size) pairs; sizes must multiply to #devices.

    Default: all devices on a single ``dp`` axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = [("dp", len(devices))]
    names = [a for a, _ in axis_sizes]
    sizes = [s for _, s in axis_sizes]
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(f"Mesh sizes {sizes} do not multiply to "
                         f"{len(devices)} devices")
    dev_array = np.array(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def factorize_two(n: int) -> Tuple[int, int]:
    """Splits n into the most balanced (a, b) with a*b = n (a >= b)."""
    best = (n, 1)
    for b in range(1, int(np.sqrt(n)) + 1):
        if n % b == 0:
            best = (n // b, b)
    return best
