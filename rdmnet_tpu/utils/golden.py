"""Build a PairBatch from a reference-style stacked collate graph.

The reference's collate stacks (ref, src) into ONE cloud per pyramid level
with a lengths vector, and its index tables point into the stacked arrays
with sentinel = total stacked count (reference
geotransformer/utils/data.py:13-77). This framework keeps the two clouds
separate with per-cloud capacities and sentinel = capacity. The splitter
here converts stacked graph -> per-cloud CloudPyramids so our model can run
on the REFERENCE's exact neighbor structure — the basis of the end-to-end
golden parity test (tests/test_golden_e2e.py) and of running converted
reference checkpoints bit-compatibly.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from rdmnet_tpu.graph.pyramid import CloudPyramid, PairBatch


def _round8(n: int) -> int:
    return max(8, -(-n // 8) * 8)


def _split_table(
    table: np.ndarray,
    q_ref_n: int,
    q_src_n: int,
    s_ref_n: int,
    s_src_n: int,
    s_ref_cap: int,
    s_src_cap: int,
    q_ref_cap: int,
    q_src_cap: int,
):
    """Stacked (q_total, K) table -> per-cloud sentinel-padded tables."""
    k = table.shape[1]

    def one(rows, lo, hi, offset, s_cap, q_cap):
        out = np.full((q_cap, k), s_cap, np.int32)
        valid = (rows >= lo) & (rows < hi)
        out[: len(rows)] = np.where(valid, rows - offset, s_cap)
        return out

    ref_rows = table[:q_ref_n]
    src_rows = table[q_ref_n : q_ref_n + q_src_n]
    ref_tab = one(ref_rows, 0, s_ref_n, 0, s_ref_cap, q_ref_cap)
    src_tab = one(src_rows, s_ref_n, s_ref_n + s_src_n, s_ref_n, s_src_cap, q_src_cap)
    return ref_tab, src_tab


def pair_batch_from_stacked(
    points: Sequence[np.ndarray],
    lengths: Sequence[np.ndarray],
    neighbors: Sequence[np.ndarray],
    subsampling: Sequence[np.ndarray],
    upsampling: Sequence[np.ndarray],
    transform: np.ndarray,
    pad_coord: float = 1.0e9,
) -> PairBatch:
    """Split reference stacked pyramid levels into our PairBatch.

    Args:
      points: per level (total_l, 3) stacked clouds (ref rows first).
      lengths: per level (2,) [ref_n, src_n].
      neighbors: per level (total_l, K_l) into the same level.
      subsampling: level i: (total_{i+1}, K_i) into level i.
      upsampling: level i: (total_i, K_{i+1}) into level i+1.
      transform: (4, 4) GT src->ref.
    """
    ns = len(points)
    ref_n = [int(lengths[i][0]) for i in range(ns)]
    src_n = [int(lengths[i][1]) for i in range(ns)]
    caps = [_round8(max(ref_n[i], src_n[i])) for i in range(ns)]

    def split_points(i):
        out = []
        for n, off in ((ref_n[i], 0), (src_n[i], ref_n[i])):
            p = np.full((caps[i], 3), pad_coord, np.float32)
            p[:n] = points[i][off : off + n]
            out.append(p)
        return out

    pts = [split_points(i) for i in range(ns)]

    nbrs: List = [[], []]
    subs: List = [[], []]
    ups: List = [[], []]
    for i in range(ns):
        r, s = _split_table(
            np.asarray(neighbors[i]), ref_n[i], src_n[i], ref_n[i], src_n[i],
            caps[i], caps[i], caps[i], caps[i],
        )
        nbrs[0].append(r)
        nbrs[1].append(s)
        if i < ns - 1:
            r, s = _split_table(
                np.asarray(subsampling[i]), ref_n[i + 1], src_n[i + 1],
                ref_n[i], src_n[i], caps[i], caps[i], caps[i + 1], caps[i + 1],
            )
            subs[0].append(r)
            subs[1].append(s)
            r, s = _split_table(
                np.asarray(upsampling[i]), ref_n[i], src_n[i],
                ref_n[i + 1], src_n[i + 1], caps[i + 1], caps[i + 1],
                caps[i], caps[i],
            )
            ups[0].append(r)
            ups[1].append(s)

    def pyramid(c):
        counts = [jnp.int32(n) for n in (ref_n if c == 0 else src_n)]
        return CloudPyramid(
            points=tuple(jnp.asarray(pts[i][c]) for i in range(ns)),
            counts=tuple(counts),
            neighbors=tuple(jnp.asarray(t) for t in nbrs[c]),
            subsampling=tuple(jnp.asarray(t) for t in subs[c]),
            upsampling=tuple(jnp.asarray(t) for t in ups[c]),
            dropped=jnp.zeros((ns,), jnp.int32),
        )

    ref_pyr, src_pyr = pyramid(0), pyramid(1)
    feats = []
    for c, n in ((0, ref_n[0]), (1, src_n[0])):
        f = np.zeros((caps[0], 1), np.float32)
        f[:n] = 1.0
        feats.append(jnp.asarray(f))
    return PairBatch(
        ref=ref_pyr,
        src=src_pyr,
        ref_feats=feats[0],
        src_feats=feats[1],
        transform=jnp.asarray(transform, jnp.float32),
    )


def load_golden_npz(path: str):
    """Load the golden dump (scripts/dump_reference_golden.py) into
    (graph pieces, outputs, state_dict)."""
    z = np.load(path, allow_pickle=False)
    ns = 1 + max(int(k.split("_")[-1]) for k in z.files if k.startswith("points_"))
    graph = dict(
        points=[z[f"points_{i}"] for i in range(ns)],
        lengths=[z[f"lengths_{i}"] for i in range(ns)],
        neighbors=[z[f"neighbors_{i}"] for i in range(ns)],
        subsampling=[z[f"subsampling_{i}"] for i in range(ns - 1)],
        upsampling=[z[f"upsampling_{i}"] for i in range(ns - 1)],
    )
    outputs = {k[len("out_"):]: z[k] for k in z.files if k.startswith("out_")}
    state_dict = {k[len("sd::"):]: z[k] for k in z.files if k.startswith("sd::")}
    return graph, outputs, state_dict
