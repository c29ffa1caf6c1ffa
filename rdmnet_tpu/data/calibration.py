"""Offline neighbor-limit calibration.

The reference calibrates per-level neighbor limits at the start of every run
by histogramming neighbor counts over the train set (reference:
geotransformer/utils/data.py:195-220). In the static-shape design the limits
must be compile-time constants, so this runs offline once per dataset and
the result goes into PyramidConfig.neighbor_limits.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rdmnet_tpu.config import PyramidConfig
from rdmnet_tpu.ops.grid_subsample import grid_subsample
from rdmnet_tpu.ops.geometry import pairwise_sq_dist


def _neighbor_counts(points: jnp.ndarray, count: jnp.ndarray, radius: float, chunk=2048):
    """Exact within-radius neighbor counts for each valid point."""
    n = points.shape[0]
    valid = jnp.arange(n) < count

    def tile_counts(q):
        d2 = pairwise_sq_dist(q, points)
        d2 = jnp.where(valid[None, :], d2, 1e12)
        return jnp.sum(d2 <= radius * radius, axis=1)

    num_chunks = -(-n // chunk)
    padded = jnp.pad(points, ((0, num_chunks * chunk - n), (0, 0)))
    out = jax.lax.map(tile_counts, padded.reshape(num_chunks, chunk, 3))
    return np.asarray(out.reshape(-1)[:n])[np.asarray(valid)]


def calibrate_neighbor_limits(
    clouds: List[np.ndarray],
    spec: PyramidConfig,
    keep_ratio: float = 0.8,
    sample_threshold: int = 2000,
) -> Tuple[int, ...]:
    """Pick per-level neighbor limits covering ``keep_ratio`` of neighborhoods
    (reference utils/data.py:195-220 semantics: smallest K whose cumulative
    histogram reaches keep_ratio of samples)."""
    hists = [[] for _ in range(spec.num_stages)]
    samples = [0] * spec.num_stages

    for cloud in clouds:
        cap0 = spec.caps[0]
        pts = np.full((cap0, 3), 1e9, np.float32)
        n = min(len(cloud), cap0)
        pts[:n] = cloud[:n]
        p, c = jnp.asarray(pts), jnp.int32(n)
        voxel = spec.voxel_size
        radius = spec.search_radius
        for lvl in range(spec.num_stages):
            if lvl > 0:
                voxel *= 2
                p, c = grid_subsample(p, c, voxel, spec.caps[lvl])
            counts = _neighbor_counts(p, c, radius)
            hists[lvl].append(counts)
            samples[lvl] += len(counts)
            radius *= 2
        if min(samples) > sample_threshold:
            break

    return tuple(
        limit_from_counts(np.concatenate(hists[lvl]), keep_ratio)
        for lvl in range(spec.num_stages)
    )


def limit_from_counts(counts: np.ndarray, keep_ratio: float) -> int:
    """Exact reference rule (utils/data.py:217-218): limit = number of
    count-bins whose cumulative histogram stays strictly below
    keep_ratio * N == smallest K with #{c <= K} >= keep_ratio * N."""
    cum = np.cumsum(np.bincount(np.asarray(counts, np.int64)))
    return int(np.sum(cum < keep_ratio * len(counts)))


def calibrate_band_caps(
    clouds: List[np.ndarray],
    spec: PyramidConfig,
    headroom: float = 1.35,
    multiple: int = 128,
) -> Tuple:
    """Derive per-level band capacities for the banded radius search.

    Replays every search the pyramid performs (self, subsampling and
    upsampling — support levels 0..num_stages-1) with the same x-major sort
    and chunking rule as ``graph/pyramid.build_cloud_pyramid``, records the
    maximum chunk-band occupancy over the sample ``clouds``, and returns
    caps with ``headroom`` margin rounded up to ``multiple``. Levels where
    the band would not beat the full search return None (unbanded).

    Static band caps are an accuracy-relevant capacity (undersized bands
    surface via the `dropped` telemetry); calibrate them per dataset like
    the neighbor limits instead of trusting the KITTI defaults.
    """
    max_band = [0] * spec.num_stages

    from rdmnet_tpu.ops.grid_subsample import voxel_sort_key
    from rdmnet_tpu.ops.radius_search import band_margin

    def sort_xmajor(p, cell):
        # the runtime's own key (single source of truth, incl. its clip
        # behavior) so measured band occupancy bounds runtime occupancy
        key, _ = voxel_sort_key(
            jnp.asarray(p), jnp.ones(len(p), bool), cell
        )
        return p[np.argsort(np.asarray(key), kind="stable")]

    def band_max(q, s, s_lvl, r, q_lvl):
        # sort-cell / chunk / margin rules shared with the runtime
        # (PyramidConfig.sort_cell / band_chunk_for, radius_search.band_margin)
        cell = spec.sort_cell(s_lvl)
        s_cells = np.floor(s[:, 0] / cell).astype(np.int64)
        q_cells = np.floor(q[:, 0] / cell).astype(np.int64)
        margin = band_margin(r, cell)
        chunk = spec.band_chunk_for(q_lvl)
        worst = 0
        for i in range(0, len(q), chunk):
            qc = q_cells[i : i + chunk]
            a = np.searchsorted(s_cells, qc.min() - margin, "left")
            b = np.searchsorted(s_cells, qc.max() + margin, "right")
            worst = max(worst, b - a)
        return worst

    for cloud in clouds:
        pts = cloud[: spec.caps[0]].astype(np.float32)
        levels = [sort_xmajor(pts, spec.sort_cell(0))]
        voxel = spec.voxel_size
        for lvl in range(1, spec.num_stages):
            voxel *= 2.0
            p, c = grid_subsample(
                jnp.asarray(levels[-1]), jnp.int32(len(levels[-1])),
                voxel, spec.caps[lvl],
            )
            levels.append(np.asarray(p)[: int(c)])

        radius = spec.search_radius
        for lvl in range(spec.num_stages):
            m = band_max(levels[lvl], levels[lvl], lvl, radius, lvl)
            if lvl < spec.num_stages - 1:
                m = max(m, band_max(levels[lvl + 1], levels[lvl], lvl, radius,
                                    lvl + 1))
            if lvl >= 1 and lvl - 1 >= spec.build_upsampling_from_level:
                # upsampling[lvl-1]: queries level lvl-1 into support lvl;
                # its radius (2x the previous level's) equals this level's
                m = max(m, band_max(levels[lvl - 1], levels[lvl], lvl, radius,
                                    lvl - 1))
            max_band[lvl] = max(max_band[lvl], m)
            radius *= 2.0

    caps = []
    for lvl in range(spec.num_stages):
        cap = -(-int(max_band[lvl] * headroom) // multiple) * multiple
        caps.append(None if cap >= spec.caps[lvl] else cap)
    return tuple(caps)
