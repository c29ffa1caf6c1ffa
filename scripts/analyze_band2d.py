"""Measure the candidate-set reduction a 2-D (x-cell, y-window) banded
search would buy over the current 1-D x-band, on the real demo pair.

The banded search's cost scales ~linearly with the candidate rows each
query chunk sees (the distance tile and the top-k are both band-width
bound). The support arrays are already lex-sorted by (x_cell, y_cell,
z_cell) (ops/grid_subsample.voxel_sort_key), so within one x-cell the rows
are y-monotone and a composite-key searchsorted can bound a per-column
y-window. This script quantifies, per level and per search, the static
parameters (NCOL, col_cap) that scheme would need and the resulting
candidate count vs the current band_cap — BEFORE any kernel is written
(DESIGN.md discipline: measure first).
"""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from rdmnet_tpu.config import make_cfg
from rdmnet_tpu.graph.pyramid import build_cloud_pyramid, pad_cloud
from rdmnet_tpu.ops.radius_search import band_margin


def analyze_search(q, q_cnt, s, s_cnt, radius, cell, chunk, band_cap, name):
    q = np.asarray(q[:q_cnt])
    s = np.asarray(s[:s_cnt])
    kx = np.floor(s[:, 0] / cell).astype(np.int64)
    ky = np.floor(s[:, 1] / cell).astype(np.int64)
    # support is lex-sorted by (x_cell, y_cell, z_cell); composite key
    skey = kx * (1 << 20) + ky
    assert np.all(np.diff(kx) >= 0), f"{name}: x-cells not sorted"
    assert np.all(np.diff(skey) >= 0), f"{name}: (x,y) keys not sorted"

    m = band_margin(radius, cell)
    nchunks = -(-len(q) // chunk)
    stats = []
    for ci in range(nchunks):
        qc = q[ci * chunk : (ci + 1) * chunk]
        qkx = np.floor(qc[:, 0] / cell).astype(np.int64)
        clo, chi = qkx.min() - m, qkx.max() + m
        # current 1-D band
        b0 = np.searchsorted(kx, clo, "left")
        b1 = np.searchsorted(kx, chi, "right")
        band1d = b1 - b0
        # 2-D: per x-cell column, y-window
        qky = np.floor(qc[:, 1] / cell).astype(np.int64)
        ylo, yhi = qky.min() - m, qky.max() + m
        ncol = chi - clo + 1
        colsz = []
        for c in range(clo, chi + 1):
            c0 = np.searchsorted(skey, c * (1 << 20) + ylo, "left")
            c1 = np.searchsorted(skey, c * (1 << 20) + yhi, "right")
            colsz.append(c1 - c0)
        stats.append((band1d, ncol, max(colsz) if colsz else 0, sum(colsz)))
    band1d = np.array([s[0] for s in stats])
    ncol = np.array([s[1] for s in stats])
    colmax = np.array([s[2] for s in stats])
    tot2d = np.array([s[3] for s in stats])
    # static parameterization the kernel would need: NCOL = max ncol,
    # col_cap = max column; work = chunks * NCOL * col_cap
    work1d = nchunks * band_cap if band_cap else nchunks * len(s)
    work2d = nchunks * ncol.max() * colmax.max()
    work2d_sum = tot2d.sum()  # ideal (ragged) candidate total
    print(
        f"{name}: chunks={nchunks} band1d max={band1d.max()} "
        f"(cap {band_cap}) | 2d: NCOL max={ncol.max()} p90={int(np.percentile(ncol,90))} "
        f"col_cap max={colmax.max()} p90={int(np.percentile(colmax,90))} | "
        f"static work 1d={work1d/1e6:.2f}M 2d={work2d/1e6:.2f}M "
        f"(x{work1d/max(work2d,1):.2f}) ragged-ideal={work2d_sum/1e6:.2f}M "
        f"(x{work1d/max(work2d_sum,1):.2f})"
    )


def main():
    cfg = make_cfg()
    spec = cfg.pyramid.scaled(0.7)
    ref = np.load("/root/reference/assets/pc/000000.npy")[:, :3].astype(np.float32)
    print(f"bucket caps={spec.caps} bands={spec.band_caps} n={len(ref)}")
    rp, rc = pad_cloud(jnp.asarray(ref), spec.caps[0])
    pyr = jax.jit(lambda p, c: build_cloud_pyramid(p, c, spec))(rp, rc)
    pts = [np.asarray(p) for p in pyr.points]
    cnts = [int(c) for c in pyr.counts]
    print("level counts:", cnts)

    radius = spec.search_radius
    for i in range(3):
        cell = spec.sort_cell(i)
        chunk = spec.band_chunk_for(i)
        analyze_search(pts[i], cnts[i], pts[i], cnts[i], radius, cell, chunk,
                       spec.band_caps[i], f"neighbors[{i}] r={radius} cell={cell} chunk={chunk}")
        if i + 1 < len(pts):
            chunk_q = spec.band_chunk_for(i + 1)
            analyze_search(pts[i + 1], cnts[i + 1], pts[i], cnts[i], radius, cell,
                           chunk_q, spec.band_caps[i], f"subsampl[{i}] r={radius} cell={cell} chunk={chunk_q}")
        radius *= 2.0

    # sensitivity: smaller chunks -> tighter 2-D windows?
    print("\nchunk-size sensitivity (neighbors[0]):")
    for chunk in (512, 256, 128):
        analyze_search(pts[0], cnts[0], pts[0], cnts[0], spec.search_radius,
                       spec.sort_cell(0), chunk, spec.band_caps[0], f"  chunk={chunk}")


if __name__ == "__main__":
    main()
