"""On-device multi-scale pyramid builder (jittable, static shapes).

TPU-native replacement for the reference's collate-time precompute
(reference: geotransformer/utils/data.py:13-77 precompute_data_stack_mode):
for each pyramid level, voxel-subsample (voxel doubling per level) and build
three padded index tables:

* ``neighbors[i]``   — level-i points' radius neighbors within level i,
* ``subsampling[i]`` — level-(i+1) points' radius neighbors within level i
  (pooling table for strided KPConv),
* ``upsampling[i]``  — level-i points' radius·2 neighbors within level i+1
  (nearest-upsample table for the decoder; width
  ``upsampling_limit or K_{i+1}`` — the decoder consumes only column 0,
  so the default builds single-column exact-nearest tables),

with the same radius-doubling schedule and sentinel-index padding. The
reference runs this on CPU in DataLoader workers over a kd-tree; here the
whole build is one jitted XLA program (sorts + MXU-tiled distance top-k) so
it runs on-chip as the first stage of the model step — no host round trip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rdmnet_tpu.config import PyramidConfig
from rdmnet_tpu.ops.grid_subsample import grid_subsample, voxel_sort_key
from rdmnet_tpu.ops.radius_search import radius_knn, radius_knn_banded


@struct.dataclass
class CloudPyramid:
    """Static-shape pyramid of one point cloud.

    All index tables use the sentinel convention: an index equal to the
    capacity of the indexed level means "missing".
    """

    points: Tuple[jnp.ndarray, ...]       # level i: (cap_i, 3)
    counts: Tuple[jnp.ndarray, ...]       # level i: () int32
    neighbors: Tuple[jnp.ndarray, ...]    # level i: (cap_i, K_i) into level i
    subsampling: Tuple[jnp.ndarray, ...]  # i: (cap_{i+1}, K_i) into level i
    upsampling: Tuple[jnp.ndarray, ...]   # i: (cap_i, upsampling_limit or K_{i+1}) into level i+1
    # capacity-overflow telemetry: (num_stages,) int32 points/voxels dropped
    # per level (level 0 = host truncation, fill via build_pair_batch) plus
    # banded-search window overflow at that support level; 0 = exact caps
    dropped: jnp.ndarray

    @property
    def num_stages(self) -> int:
        return len(self.points)

    def mask(self, level: int) -> jnp.ndarray:
        cap = self.points[level].shape[0]
        return jnp.arange(cap, dtype=jnp.int32) < self.counts[level]

    def index_valid(self, level: int, idx: jnp.ndarray) -> jnp.ndarray:
        """Whether index-table entries point at VALID rows of ``level`` —
        pure arithmetic (pads sort last; sentinel == cap >= count), no
        gather. Lets consumers of all-ones input features skip the feature
        gather entirely (nn/backbone.py ones_input fast path)."""
        return idx < self.counts[level]


@struct.dataclass
class PairBatch:
    """One registration pair (ref, src) plus ground truth, fully padded."""

    ref: CloudPyramid
    src: CloudPyramid
    ref_feats: jnp.ndarray   # (cap_0, C_in) input features (ones for LiDAR)
    src_feats: jnp.ndarray
    transform: jnp.ndarray   # (4, 4) GT: src -> ref


@struct.dataclass
class StackedGraph:
    """The (ref, src) pair concatenated into ONE static graph per level.

    Reference semantics: the torch reference runs its whole KPConv backbone
    on the stacked [ref; src] cloud, so GroupNorm statistics are computed
    over BOTH clouds jointly (geotransformer/utils/data.py:118 stacking;
    modules.py:33-50 norm over the full stacked axis). Running the backbone
    per cloud changes those statistics — a real numeric divergence caught by
    the end-to-end golden test. This struct rebuilds the reference's
    stacking statically: src rows live at a fixed offset of cap per level,
    index tables are offset/sentinel-remapped, and validity is a mask.

    Duck-typed to the subset of CloudPyramid the backbone consumes
    (points / neighbors / subsampling / upsampling / mask / num_stages).
    """

    points: Tuple[jnp.ndarray, ...]       # level i: (2 * cap_i, 3)
    masks: Tuple[jnp.ndarray, ...]        # level i: (2 * cap_i,) bool
    neighbors: Tuple[jnp.ndarray, ...]
    subsampling: Tuple[jnp.ndarray, ...]
    upsampling: Tuple[jnp.ndarray, ...]
    counts: Tuple[jnp.ndarray, ...]       # level i: (2,) int32 [ref, src]

    @property
    def num_stages(self) -> int:
        return len(self.points)

    def mask(self, level: int) -> jnp.ndarray:
        return self.masks[level]

    def index_valid(self, level: int, idx: jnp.ndarray) -> jnp.ndarray:
        """Arithmetic validity of stacked index-table entries (see
        CloudPyramid.index_valid): valid rows are [0, count_ref) in the ref
        half and [cap, cap + count_src) in the src half; the sentinel
        2*cap fails both tests."""
        cap = self.points[level].shape[0] // 2
        cnt = self.counts[level]
        return jnp.where(idx < cap, idx < cnt[0], idx - cap < cnt[1])


def stack_pair_graph(ref: CloudPyramid, src: CloudPyramid) -> StackedGraph:
    """Concatenate two same-capacity pyramids into a StackedGraph.

    Index remap per table (query level q, support level s with cap C_s):
    ref entries keep their index but sentinel C_s -> 2*C_s; src entries
    shift by +C_s (their sentinel C_s lands on 2*C_s automatically).
    """
    ns = ref.num_stages
    for i in range(ns):
        assert ref.points[i].shape[0] == src.points[i].shape[0], (
            "stacking requires equal per-level capacities"
        )

    def remap(ref_tab, src_tab, s_cap):
        r = jnp.where(ref_tab >= s_cap, 2 * s_cap, ref_tab)
        s = src_tab + s_cap  # sentinel s_cap + s_cap == 2*s_cap
        return jnp.concatenate([r, s], axis=0)

    points = tuple(
        jnp.concatenate([ref.points[i], src.points[i]], axis=0)
        for i in range(ns)
    )
    masks = tuple(
        jnp.concatenate([ref.mask(i), src.mask(i)], axis=0) for i in range(ns)
    )
    neighbors = tuple(
        remap(ref.neighbors[i], src.neighbors[i], ref.points[i].shape[0])
        for i in range(ns)
    )
    subsampling = tuple(
        remap(ref.subsampling[i], src.subsampling[i], ref.points[i].shape[0])
        for i in range(ns - 1)
    )
    upsampling = tuple(
        remap(ref.upsampling[i], src.upsampling[i], ref.points[i + 1].shape[0])
        for i in range(ns - 1)
    )
    return StackedGraph(
        points=points,
        masks=masks,
        neighbors=neighbors,
        subsampling=subsampling,
        upsampling=upsampling,
        counts=tuple(
            jnp.stack([ref.counts[i], src.counts[i]]) for i in range(ns)
        ),
    )


def build_cloud_pyramid(
    points: jnp.ndarray,
    count: jnp.ndarray,
    spec: PyramidConfig,
    dropped0: jnp.ndarray | int = 0,
    sp_mesh=None,
    sp_axis: str = "sp",
    sp_min_queries: int = 2048,
) -> CloudPyramid:
    """Build the full pyramid for one padded cloud.

    Args:
      points: (cap_0, 3) padded points (pad rows anywhere; they are ignored
        via ``count`` — but by convention pads sit at the end with far-away
        sentinel coordinates).
      count: () int32 number of valid points.
      spec: static pyramid spec (capacities, neighbor limits, radii).
      sp_mesh: optional jax.sharding.Mesh carrying an ``sp_axis`` axis:
        radius searches whose query level holds >= ``sp_min_queries``
        capacity rows (the level-0/1 searches — the dominant build cost,
        DESIGN.md build timings) run query-sharded over that axis
        (parallel/sharded_search.py), with supports replicated. Results are
        identical to the unsharded build — sharding only splits the query
        chunking, and every query row's top-k is computed against the same
        support set. This is the single-pair latency-scaling axis; the
        TPU-native answer to the reference's per-worker CPU collate
        (geotransformer/utils/data.py:13-77).
    """
    assert points.shape[0] == spec.caps[0], (
        f"level-0 capacity mismatch: {points.shape[0]} vs {spec.caps[0]}"
    )
    # Spatially sort level 0 by (x, y, z) voxel key (levels 1+ come out of
    # the subsample already x-major sorted): neighbor indices then point at
    # nearby rows (HBM gather locality in the KPConv stages), and the
    # x-monotone order is what lets radius_knn_banded prune each query
    # chunk's candidates to a contiguous support band. Point order is an
    # internal detail — every consumer goes through the index tables.
    n0 = points.shape[0]
    valid0 = jnp.arange(n0, dtype=jnp.int32) < count
    key, n_clipped0 = voxel_sort_key(points, valid0, spec.sort_cell(0))
    _, order = jax.lax.sort((key, jnp.arange(n0, dtype=jnp.int32)), num_keys=1)
    points = jnp.take(points, order, axis=0)

    pts = [points]
    cnts = [count.astype(jnp.int32)]
    # level-0 telemetry: host truncation + out-of-range voxel clips (the
    # latter break the x-sort monotonicity the banded search assumes)
    drops = [jnp.asarray(dropped0, jnp.int32) + n_clipped0]

    # Voxel subsampling: level i is subsampled at voxel_size * 2^i
    # (reference: utils/data.py:23-29 — the first doubling happens before
    # the first subsample call).
    voxel = spec.voxel_size
    for i in range(1, spec.num_stages):
        voxel *= 2.0
        p, c, d = grid_subsample(
            pts[-1], cnts[-1], voxel, spec.caps[i], return_dropped=True
        )
        pts.append(p)
        cnts.append(c)
        drops.append(d)

    # Radius searches with radius doubling (reference: utils/data.py:31-69).
    # Fine levels use the banded search over the x-sorted supports; band
    # overflow (undersized static band) is folded into the per-level
    # `dropped` telemetry. The sort-cell and chunk rules live on
    # PyramidConfig so data/calibration.py stays in lockstep.
    def search(q_lvl: int, s_lvl: int, r: float, k: int):
        # k=1 (upsampling_limit): exact argmin — approx top-k trades recall
        # on the FARTHEST neighbors, which is immaterial at k>=limit but
        # would be a 1-recall_target chance of missing the true nearest
        recall = spec.approx_recall if k > 1 else None
        band = spec.band_caps[s_lvl]
        banded = band is not None and band < spec.caps[s_lvl]
        if sp_mesh is not None and spec.caps[q_lvl] >= sp_min_queries:
            from rdmnet_tpu.parallel.sharded_search import sharded_radius_knn

            return sharded_radius_knn(
                pts[q_lvl], pts[s_lvl], cnts[s_lvl], r, k,
                mesh=sp_mesh, axis=sp_axis, q_count=cnts[q_lvl],
                cell=spec.sort_cell(s_lvl) if banded else None,
                band_cap=band if banded else None,
                chunk_size=spec.band_chunk_for(q_lvl),
                approx_recall=recall, map_batch=spec.map_batch,
                return_overflow=True,
            )
        if not banded:
            return (
                radius_knn(pts[q_lvl], pts[s_lvl], cnts[s_lvl], r, k,
                           approx_recall=recall, map_batch=spec.map_batch),
                jnp.int32(0),
            )
        return radius_knn_banded(
            pts[q_lvl], pts[s_lvl], cnts[s_lvl], r, k,
            cell=spec.sort_cell(s_lvl), band_cap=band, q_count=cnts[q_lvl],
            chunk_size=spec.band_chunk_for(q_lvl),
            approx_recall=recall,
            return_overflow=True,
            map_batch=spec.map_batch,
        )

    radius = spec.search_radius
    neighbors = []
    subsampling = []
    upsampling = []
    band_over = [jnp.int32(0) for _ in range(spec.num_stages)]
    for i in range(spec.num_stages):
        nbr, ov = search(i, i, radius, spec.neighbor_limits[i])
        neighbors.append(nbr)
        band_over[i] = band_over[i] + ov
        if i < spec.num_stages - 1:
            sub, ov = search(i + 1, i, radius, spec.neighbor_limits[i])
            subsampling.append(sub)
            band_over[i] = band_over[i] + ov
            k_up = spec.upsampling_limit or spec.neighbor_limits[i + 1]
            if i >= spec.build_upsampling_from_level:
                up, ov = search(i, i + 1, radius * 2.0, k_up)
                upsampling.append(up)
                band_over[i + 1] = band_over[i + 1] + ov
            else:
                # unconsumed table (see config note): all-sentinel placeholder
                # keeps the pytree structure stable at zero compute
                upsampling.append(
                    jnp.full(
                        (spec.caps[i], k_up),
                        spec.caps[i + 1],
                        jnp.int32,
                    )
                )
        radius *= 2.0

    return CloudPyramid(
        points=tuple(pts),
        counts=tuple(cnts),
        neighbors=tuple(neighbors),
        subsampling=tuple(subsampling),
        upsampling=tuple(upsampling),
        dropped=jnp.stack(drops) + jnp.stack(band_over),
    )


def pad_cloud(points: jnp.ndarray, cap: int, pad_coord: float = 1.0e9):
    """Pad/truncate an (N, 3) cloud to (cap, 3) with far-away pad rows.

    Host-side convenience (numpy in, numpy out is fine under jit tracing too).
    """
    n = min(points.shape[0], cap)
    out = jnp.full((cap, 3), pad_coord, dtype=jnp.float32)
    out = out.at[:n].set(points[:n])
    return out, jnp.int32(n)


def build_pair_batch(
    ref_points: jnp.ndarray,
    ref_count: jnp.ndarray,
    src_points: jnp.ndarray,
    src_count: jnp.ndarray,
    transform: jnp.ndarray,
    spec: PyramidConfig,
    input_dim: int = 1,
    ref_dropped0: jnp.ndarray | int = 0,
    src_dropped0: jnp.ndarray | int = 0,
    sp_mesh=None,
    sp_axis: str = "sp",
    sp_min_queries: int = 2048,
) -> PairBatch:
    """Build both pyramids of a registration pair (jittable).

    Input features are all-ones as in the reference KITTI datasets
    (reference: rdmnet/datasets/registration/kitti/dataset.py:188-189),
    zeroed on pad rows. ``*_dropped0`` record host-side level-0 truncation
    (``pad_cloud``) so the overflow telemetry covers every capacity.

    ``sp_mesh`` shards the level-0/1 radius searches (the dominant build
    cost) by query chunks over the mesh's ``sp_axis`` — see
    ``build_cloud_pyramid``. The pair-vmap is skipped in that mode
    (shard_map per cloud instead of batching the two clouds): sp sharding
    targets single-pair LATENCY, where the two clouds' searches pipeline
    back-to-back across the same devices rather than interleaving.
    """
    if sp_mesh is not None:
        ref = build_cloud_pyramid(
            ref_points, ref_count.astype(jnp.int32), spec,
            dropped0=jnp.asarray(ref_dropped0, jnp.int32),
            sp_mesh=sp_mesh, sp_axis=sp_axis, sp_min_queries=sp_min_queries,
        )
        src = build_cloud_pyramid(
            src_points, src_count.astype(jnp.int32), spec,
            dropped0=jnp.asarray(src_dropped0, jnp.int32),
            sp_mesh=sp_mesh, sp_axis=sp_axis, sp_min_queries=sp_min_queries,
        )
    else:
        # build both clouds' pyramids in one vmapped program: every sort /
        # distance kernel processes the (ref, src) pair together, doubling
        # arithmetic intensity and halving fixed kernel costs
        both = jax.vmap(
            lambda p, c, d: build_cloud_pyramid(p, c, spec, dropped0=d)
        )(
            jnp.stack([ref_points, src_points]),
            jnp.stack([ref_count.astype(jnp.int32), src_count.astype(jnp.int32)]),
            jnp.stack([jnp.asarray(ref_dropped0, jnp.int32),
                       jnp.asarray(src_dropped0, jnp.int32)]),
        )
        ref = jax.tree.map(lambda x: x[0], both)
        src = jax.tree.map(lambda x: x[1], both)
    cap0 = spec.caps[0]
    ref_feats = (jnp.arange(cap0)[:, None] < ref_count).astype(jnp.float32)
    src_feats = (jnp.arange(cap0)[:, None] < src_count).astype(jnp.float32)
    ref_feats = jnp.tile(ref_feats, (1, input_dim))
    src_feats = jnp.tile(src_feats, (1, input_dim))
    return PairBatch(
        ref=ref,
        src=src,
        ref_feats=ref_feats,
        src_feats=src_feats,
        transform=transform.astype(jnp.float32),
    )
