"""Pixel value- and range-map kernels (vectorized numpy).

Reproduces ``apply_value_map`` / ``apply_range_map``
(``/root/reference/geetiles/utils.py:273-352``) including the quirky
edge-cases: list form maps *positions* 0..n to the sorted values (with 0
prepended when missing), dict form adds an implicit ``0 -> 0`` entry, and
the init value is the first dict key unless ``map[0] == 0``.
"""

from __future__ import annotations

import numpy as np


def normalize_value_map(value_map) -> dict[int, int]:
    """Resolve the list/dict forms to an explicit dict (``utils.py:281-303``)."""
    if isinstance(value_map, list):
        if not all(isinstance(i, int) for i in value_map):
            raise ValueError("all mapped values must be int")
        value_map = sorted(value_map)
        if 0 not in value_map:
            value_map = [0] + value_map
        value_map = {i: value_map[i] for i in range(len(value_map))}
    elif isinstance(value_map, dict):
        if not all(isinstance(i, int) for i in value_map.keys()):
            raise ValueError("all keys in map dict must be int")
        if not all(isinstance(i, int) for i in value_map.values()):
            raise ValueError("all values in map dict must be int")
        value_map = dict(value_map)
        if 0 not in value_map.keys() and 0 not in value_map.values():
            value_map[0] = 0
    else:
        raise ValueError("value_map must be list or dict")
    return value_map


def apply_value_map(array: np.ndarray, value_map) -> np.ndarray:
    """Remap pixel values; unmapped values become the init value
    (``utils.py:305-318``)."""
    value_map = normalize_value_map(value_map)
    if 0 in value_map.keys() and value_map[0] == 0:
        init_val = 0
    else:
        init_val = list(value_map.keys())[0]
    r = np.ones_like(array) * init_val
    for k, v in value_map.items():
        if v == init_val:
            continue
        r[array == k] = v
    return r


def apply_range_map(array: np.ndarray, range_map) -> np.ndarray:
    """Bucket values into len(edges)+1 classes (``utils.py:320-352``):
    ``< e0 -> 0``, ``[e_i, e_{i+1}) -> i+1``, ``>= e_last -> len(edges)``."""
    range_map = np.r_[range_map]
    if len(range_map.shape) != 1:
        raise ValueError("range_map must have one dimension")
    range_map = range_map.astype(float)
    if not np.all(range_map[1:] - range_map[:-1] > 0):
        raise ValueError("range_map must be ordered floats with no repetitions")
    r = np.zeros_like(array)
    for i in range(len(range_map)):
        if i == len(range_map) - 1:
            r[array >= range_map[i]] = i + 1
        else:
            r[(array >= range_map[i]) & (array < range_map[i + 1])] = i + 1
    return r
