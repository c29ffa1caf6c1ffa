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

    limits = []
    for lvl in range(spec.num_stages):
        allc = np.concatenate(hists[lvl])
        limits.append(int(np.quantile(allc, keep_ratio, method="lower") + 1))
    return tuple(limits)
