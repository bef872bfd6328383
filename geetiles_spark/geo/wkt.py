"""Minimal WKT polygon reader (shapely-free).

The reference reads AOIs from WKT text files (``cmds.py:296-297``).  Only
POLYGON / MULTIPOLYGON without holes are needed (the shipped
``data/luxembourg.wkt`` is a single-ring POLYGON).
"""

from __future__ import annotations

import re

import numpy as np


def loads_rings(wkt: str) -> list[np.ndarray]:
    """Parse WKT POLYGON/MULTIPOLYGON -> list of exterior rings (closed)."""
    wkt = wkt.strip()
    head = wkt.split("(", 1)[0].strip().upper()
    ring_texts = re.findall(r"\(([^()]+)\)", wkt)
    if head == "POLYGON":
        ring_texts = ring_texts[:1]  # exterior only
    elif head == "MULTIPOLYGON":
        pass  # NOTE: holes unsupported; all rings treated as exteriors
    else:
        raise ValueError(f"unsupported WKT type: {head}")
    rings = []
    for t in ring_texts:
        pts = []
        for pair in t.split(","):
            xy = pair.split()
            pts.append((float(xy[0]), float(xy[1])))
        ring = np.asarray(pts, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        rings.append(ring)
    return rings


def load_ring(path: str) -> np.ndarray:
    with open(path) as f:
        return loads_rings(f.read())[0]
