"""Measure the reference (nubot-nudt/RDMNet) per-pair cost in this image.

Two measurable components on this machine (CPU-only torch 2.x):
  1. collate / precompute (grid subsample + radius searches via the
     reference's own compiled C++ extension) — this is genuine reference
     production cost: it runs on CPU DataLoader workers even on a GPU rig
     (reference geotransformer/utils/data.py:139-188).
  2. full model forward (model_infer, GT-free) on CPU torch — NOT the
     reference's production device (they ran CUDA 11.4); reported for
     provenance only, as an upper bound of the compute the GPU must cover.

Writes one JSON line with both timings. Results feed BASELINE.md and the
vs_baseline denominator in bench.py.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import ref_oracle

    geotransformer, rdmnet = ref_oracle.load_reference()
    import torch

    # torch>=2 rejects .view(-1) on non-contiguous index tensors that
    # torch 1.8 accepted (reference index_select.py:25); patch to reshape
    import geotransformer.modules.ops.index_select as _isel
    import geotransformer.modules.ops as _ops

    def _index_select(data, index, dim):
        output = data.index_select(dim, index.reshape(-1))
        if index.ndim > 1:
            output_shape = data.shape[:dim] + index.shape + data.shape[dim:][1:]
            output = output.view(*output_shape)
        return output

    _isel.index_select = _index_select
    _ops.index_select = _index_select

    torch.set_num_threads(os.cpu_count() or 8)
    from geotransformer.utils.data import (
        calibrate_neighbors_stack_mode,
        registration_collate_fn_stack_mode,
    )

    sys.path.insert(0, "/root/reference/experiments")
    from config import make_cfg

    cfg = make_cfg()

    ref_pts = np.load("/root/reference/assets/pc/000000.npy")[:, :3].astype(np.float32)
    src_pts = np.load("/root/reference/assets/pc/000004.npy")[:, :3].astype(np.float32)

    data_dict = {
        "seq_id": 0,
        "ref_frame": 0,
        "src_frame": 4,
        "ref_points": ref_pts,
        "src_points": src_pts,
        "ref_feats": np.ones((len(ref_pts), 1), np.float32),
        "src_feats": np.ones((len(src_pts), 1), np.float32),
        "transform": np.eye(4, dtype=np.float32),
    }

    num_stages = cfg.backbone.num_stages
    voxel = cfg.backbone.init_voxel_size
    radius = cfg.backbone.init_radius

    class _OnePair:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return dict(data_dict)

    neighbor_limits = calibrate_neighbors_stack_mode(
        _OnePair(), registration_collate_fn_stack_mode, num_stages, voxel, radius
    )
    print("reference calibrated neighbor_limits:", list(neighbor_limits), file=sys.stderr)

    def collate_once():
        return registration_collate_fn_stack_mode(
            [dict(data_dict)], num_stages, voxel, radius, neighbor_limits,
            precompute_data=True,
        )

    # warm-up + timed collate
    batch = collate_once()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        batch = collate_once()
    collate_s = (time.perf_counter() - t0) / iters

    # full reference model forward (GT-free infer graph) on CPU torch
    sys.path.pop(0)
    sys.path.insert(0, "/root/reference/experiments")
    from model_infer import create_model

    cfg.neighbor_limits = neighbor_limits
    cfg.test.vis = False  # open3d interactive visualization off
    model = create_model(cfg)
    model.eval()

    # device staging: the reference's tester moves the collated dict to the
    # device; on CPU this is a no-op walk
    batch["testing"] = True

    fwd_s = None
    with torch.no_grad():
        out = model(batch)  # warm-up
        iters_f = 3
        t0 = time.perf_counter()
        for _ in range(iters_f):
            out = model(batch)
        fwd_s = (time.perf_counter() - t0) / iters_f

    print(
        json.dumps(
            {
                "collate_s_per_pair_cpu": round(collate_s, 4),
                "model_forward_s_per_pair_cpu_torch": round(fwd_s, 4),
                "neighbor_limits": [int(x) for x in neighbor_limits],
                "n_corr": int(out["corr_scores"].shape[0]),
                "cpu_threads": torch.get_num_threads(),
            }
        )
    )


if __name__ == "__main__":
    main()
