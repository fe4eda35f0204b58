"""Build-side network preparation (driver-side, before broadcast).

The reference cleans the road network before indexing: simplify, dedupe
identical geometries, keep only the largest connected component, validate/
repair (/root/reference/landlensdb/process/road_network.py:83-184). The
build side is small by design (it gets broadcast), so this runs driver-side
on plain coordinate lists — the same place the reference runs it.
"""

from __future__ import annotations

import numpy as np


def dedupe_lines(lines: list[tuple[int, list]]) -> list[tuple[int, list]]:
    """Drop duplicate geometries, keeping the first (lowest) line id —
    road_network.py:109 ``drop_duplicates(subset='geometry')``."""
    seen: set[bytes] = set()
    out = []
    for lid, coords in sorted(lines, key=lambda t: t[0]):
        key = np.asarray(coords, dtype=np.float64).tobytes()
        if key in seen:
            continue
        seen.add(key)
        out.append((lid, coords))
    return out


def validate_lines(
    lines: list[tuple[int, list]], snap_eps: float = 0.0
) -> list[tuple[int, list]]:
    """Validity filter/repair — road_network.py:131-184: at least 2 distinct
    vertices, finite coords, consecutive duplicate vertices collapsed."""
    out = []
    for lid, coords in lines:
        c = np.asarray(coords, dtype=np.float64)
        if len(c) < 2 or not np.isfinite(c).all():
            continue
        keep = np.ones(len(c), dtype=bool)
        keep[1:] = (np.abs(np.diff(c, axis=0)) > snap_eps).any(axis=1)
        c = c[keep]
        if len(c) >= 2:
            out.append((lid, c.tolist()))
    return out


def largest_component(lines: list[tuple[int, list]]) -> list[tuple[int, list]]:
    """Keep lines of the largest connected component, edges connected when
    they share an endpoint vertex — road_network.py:113-124 (networkx graph
    of line coords) re-expressed as union-find over endpoints."""
    parent: dict[tuple, tuple] = {}

    def find(v):
        while parent.setdefault(v, v) != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    endpoints = []
    for _, coords in lines:
        c = np.asarray(coords, dtype=np.float64)
        a = (round(c[0, 0], 9), round(c[0, 1], 9))
        b = (round(c[-1, 0], 9), round(c[-1, 1], 9))
        endpoints.append((a, b))
        union(a, b)

    sizes: dict[tuple, int] = {}
    for a, _ in endpoints:
        sizes[find(a)] = sizes.get(find(a), 0) + 1
    if not sizes:
        return []
    best = max(sizes.items(), key=lambda kv: (kv[1], kv[0]))[0]
    return [ln for ln, (a, _) in zip(lines, endpoints) if find(a) == best]


def prepare_network(lines: list[tuple[int, list]], keep_largest: bool = True):
    """dedupe -> validate -> (largest component) — the reference's full prep
    chain (snap.py:182-187)."""
    lines = dedupe_lines(lines)
    lines = validate_lines(lines)
    if keep_largest:
        lines = largest_component(lines)
    return lines


def simplify_lines(
    lines: list[tuple[int, list]], tolerance: float = 1e-5
) -> list[tuple[int, list]]:
    """Douglas-Peucker simplification — road_network.py:106 ``simplify(1e-5)``
    on the broadcast side. Iterative stack form, numpy point-line distances."""
    out = []
    for lid, coords in lines:
        c = np.asarray(coords, dtype=np.float64)
        if len(c) <= 2:
            out.append((lid, c.tolist()))
            continue
        keep = np.zeros(len(c), dtype=bool)
        keep[0] = keep[-1] = True
        stack = [(0, len(c) - 1)]
        while stack:
            i, j = stack.pop()
            if j <= i + 1:
                continue
            seg = c[j] - c[i]
            seg_len = np.hypot(*seg)
            pts = c[i + 1 : j]
            if seg_len == 0.0:
                d = np.hypot(pts[:, 0] - c[i, 0], pts[:, 1] - c[i, 1])
            else:
                d = np.abs(
                    (pts[:, 0] - c[i, 0]) * seg[1] - (pts[:, 1] - c[i, 1]) * seg[0]
                ) / seg_len
            k = int(np.argmax(d))
            if d[k] > tolerance:
                m = i + 1 + k
                keep[m] = True
                stack.append((i, m))
                stack.append((m, j))
        out.append((lid, c[keep].tolist()))
    return out
