"""Runtime shape/contract checks.

The reference guards nearly every function boundary with ``assert_debug`` /
``check_tensor`` (reference slam/common/utils.py:30-74); we keep the same
discipline but make the checks trace-safe: inside ``jax.jit`` the shape checks
run at trace time on abstract values (shapes are static in JAX), and value
checks are skipped.
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np

_DEBUG = os.environ.get("PYLIDAR_SLAM_DEBUG", "1") != "0"


class SlamAssertionError(AssertionError):
    pass


def assert_debug(condition: bool, message: str = ""):
    """Raises a SlamAssertionError when `condition` is False (debug builds only)."""
    if _DEBUG and not condition:
        raise SlamAssertionError(message)


def check_tensor(tensor, shape: Sequence[int], tensor_type: type = None):
    """Checks a tensor (jax array / numpy array) against an expected shape.

    `-1` entries in `shape` match any size.  Works on traced values because
    JAX shapes are static.
    """
    if not _DEBUG:
        return tensor
    if tensor_type is not None:
        assert_debug(isinstance(tensor, tensor_type),
                     f"Expected type {tensor_type}, got {type(tensor)}")
    actual = tuple(tensor.shape)
    assert_debug(len(actual) == len(shape),
                 f"Rank mismatch: expected {list(shape)}, got {list(actual)}")
    for expected_dim, actual_dim in zip(shape, actual):
        if expected_dim != -1:
            assert_debug(int(expected_dim) == int(actual_dim),
                         f"Shape mismatch: expected {list(shape)}, got {list(actual)}")
    return tensor


def remove_nan(array: np.ndarray):
    """Removes rows containing NaNs from a 2D numpy array.

    Returns the filtered array and the boolean keep-mask
    (mirrors reference slam/common/utils.py:169-196 behaviour).
    """
    mask = ~np.isnan(array).any(axis=tuple(range(1, array.ndim)))
    return array[mask], mask
