"""Dump a reference-model golden for end-to-end parity testing.

Runs the reference model_infer (seeded random weights, vote on) on the
bundled KITTI demo pair with its own collate graph, and saves to npz:
  * the collate graph (per-level stacked points/lengths/tables),
  * the seeded state_dict,
  * every intermediate/final output needed to pin our model stage by stage.

The npz feeds tests/test_golden_e2e.py: our model consumes the SAME graph
(split into per-cloud pyramids) with the converted weights and must
reproduce the outputs.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".cache", "golden_e2e.npz")


def main():
    import ref_oracle

    ref_oracle.load_reference()
    import torch

    # torch>=2 rejects .view(-1) on non-contiguous tensors torch 1.8 allowed
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

    from geotransformer.utils.data import registration_collate_fn_stack_mode

    sys.path.insert(0, "/root/reference/experiments")
    from config import make_cfg as ref_make_cfg

    cfg = ref_make_cfg()
    cfg.test.vis = False
    neighbor_limits = [65, 63, 69, 71, 81]
    cfg.neighbor_limits = neighbor_limits

    ref_pts = np.load("/root/reference/assets/pc/000000.npy")[:, :3].astype(np.float32)
    src_pts = np.load("/root/reference/assets/pc/000004.npy")[:, :3].astype(np.float32)
    data_dict = {
        "seq_id": 0, "ref_frame": 0, "src_frame": 4,
        "ref_points": ref_pts, "src_points": src_pts,
        "ref_feats": np.ones((len(ref_pts), 1), np.float32),
        "src_feats": np.ones((len(src_pts), 1), np.float32),
        "transform": np.eye(4, dtype=np.float32),
    }
    batch = registration_collate_fn_stack_mode(
        [data_dict], cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, neighbor_limits, precompute_data=True,
    )

    from model_infer import create_model

    torch.manual_seed(0)
    model = create_model(cfg)
    model.eval()
    batch["testing"] = True

    # capture intermediates with forward hooks for stage bisection
    acts = {}

    def hook(name):
        def fn(mod, inp, outp):
            if isinstance(outp, torch.Tensor):
                acts[name] = outp.detach().numpy()
            elif isinstance(outp, (list, tuple)):
                for i, o in enumerate(outp):
                    if isinstance(o, torch.Tensor):
                        acts[f"{name}.{i}"] = o.detach().numpy()
        return fn

    for name in ("encoder", "decoder", "transformer", "transformer2", "vote"):
        getattr(model, name).register_forward_hook(hook(name))
    with torch.no_grad():
        out = model(batch)

    save = {}
    for lvl in range(cfg.backbone.num_stages):
        save[f"points_{lvl}"] = batch["points"][lvl].numpy()
        save[f"lengths_{lvl}"] = batch["lengths"][lvl].numpy()
        save[f"neighbors_{lvl}"] = batch["neighbors"][lvl].numpy()
        if lvl < cfg.backbone.num_stages - 1:
            save[f"subsampling_{lvl}"] = batch["subsampling"][lvl].numpy()
            save[f"upsampling_{lvl}"] = batch["upsampling"][lvl].numpy()

    keys = [
        "ori_ref_points_c", "ori_src_points_c",
        "shifted_ref_points_c", "shifted_src_points_c",
        "ref_points_c", "src_points_c",
        "ref_n2p_scores_c", "src_n2p_scores_c",
        "ref_p2p_scores_c", "src_p2p_scores_c",
        "ref_n2n_scores_c", "src_n2n_scores_c",
        "ref_feats_c", "src_feats_c",
        "ref_feats_f", "src_feats_f",
        "ref_node_corr_indices", "src_node_corr_indices",
        "matching_scores",
        "ref_corr_points", "src_corr_points", "corr_scores",
        "estimated_transform",
    ]
    for k in keys:
        if k in out:
            save[f"out_{k}"] = out[k].detach().numpy()
    for k, v in acts.items():
        save[f"act_{k}"] = v
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(OUT, **save,
                        **{f"sd::{k}": v for k, v in sd.items()})
    print("saved", OUT, "with", len(save), "graph/output arrays,",
          len(sd), "weights")
    print("estimated_transform:\n", out["estimated_transform"].numpy())


if __name__ == "__main__":
    main()
