"""Run our model with converted reference weights on the reference's exact
graph and compare every pinned stage (development driver for
tests/test_golden_e2e.py)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rel(a, b, eps=1e-6):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(b).max() + eps)


def main():
    import jax

    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import dataclasses

    from rdmnet_tpu.config import make_cfg
    from rdmnet_tpu.models import RDMNet
    from rdmnet_tpu.utils.golden import load_golden_npz, pair_batch_from_stacked
    from rdmnet_tpu.utils.torch_convert import convert_state_dict

    graph, outs, sd = load_golden_npz("/root/repo/.cache/golden_e2e.npz")
    batch = pair_batch_from_stacked(
        graph["points"], graph["lengths"], graph["neighbors"],
        graph["subsampling"], graph["upsampling"], np.eye(4, dtype=np.float32),
    )
    params = {"params": convert_state_dict(sd)}
    cfg = make_cfg()
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, shared_influence=False)
    )
    model = RDMNet(cfg)

    out = jax.jit(
        lambda p, b: model.apply(p, b, training=False, with_gt=False)
    )(params, batch)

    ref_n = [int(l[0]) for l in graph["lengths"]]
    src_n = [int(l[1]) for l in graph["lengths"]]

    def cmp(name, ours, theirs, n=None):
        o = np.asarray(ours)
        t = np.asarray(theirs)
        if n is not None:
            o = o[:n]
            t = t[:n]
        r = rel(o, t)
        print(f"{name:28s} rel_err {r:10.2e}   ours{list(o.shape)} theirs{list(t.shape)}")
        return r

    print("== stage-by-stage (pre-NMS, deterministic shapes) ==")
    cmp("ref feats_f", out["ref_feats_f"], outs["ref_feats_f"], ref_n[1])
    cmp("src feats_f", out["src_feats_f"], outs["src_feats_f"], src_n[1])
    cmp("ref p2p scores", out["ref_p2p_scores_c"], outs["ref_p2p_scores_c"], ref_n[1])
    cmp("src p2p scores", out["src_p2p_scores_c"], outs["src_p2p_scores_c"], src_n[1])
    if "shifted_ref_points_c" in outs:
        cmp("shifted ref nodes", out["shifted_ref_points_c"], outs["shifted_ref_points_c"], ref_n[4])
        cmp("shifted src nodes", out["shifted_src_points_c"], outs["shifted_src_points_c"], src_n[4])

    print("== post-NMS (reference compacts to survivors; ours is masked) ==")
    rv = np.asarray(out["nodes_ref_valid"])[: ref_n[4]]
    sv = np.asarray(out["nodes_src_valid"])[: src_n[4]]
    print(f"NMS survivors ours ref/src: {rv.sum()}/{sv.sum()}  "
          f"theirs: {len(outs['ref_n2p_scores_c'])}/{len(outs['src_n2p_scores_c'])}")
    if rv.sum() == len(outs["ref_n2p_scores_c"]):
        cmp("ref n2p (survivors)", np.asarray(out["ref_n2p_scores_c"])[: ref_n[4]][rv],
            outs["ref_n2p_scores_c"])
        cmp("ref feats_c (survivors)", np.asarray(out["ref_feats_c"])[: ref_n[4]][rv],
            outs["ref_feats_c"])
    if sv.sum() == len(outs["src_n2p_scores_c"]):
        cmp("src n2n (survivors)", np.asarray(out["src_n2n_scores_c"])[: src_n[4]][sv],
            outs["src_n2n_scores_c"])
        cmp("src feats_c (survivors)", np.asarray(out["src_feats_c"])[: src_n[4]][sv],
            outs["src_feats_c"])
    print("estimated_transform ours:\n", np.asarray(out["estimated_transform"]))
    print("estimated_transform theirs:\n", outs["estimated_transform"])
    cmp("estimated_transform", out["estimated_transform"], outs["estimated_transform"])


if __name__ == "__main__":
    main()
