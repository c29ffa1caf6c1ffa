"""Bisect golden divergence: run our submodules on the reference's graph with
converted weights and compare each captured reference activation."""

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

    from rdmnet_tpu.config import make_cfg
    from rdmnet_tpu.nn.backbone import Decoder, Encoder
    from rdmnet_tpu.nn.thdroformer import ThDRoFormer
    from rdmnet_tpu.utils.golden import load_golden_npz, pair_batch_from_stacked
    from rdmnet_tpu.utils.torch_convert import convert_state_dict

    z = np.load("/root/repo/.cache/golden_e2e.npz")
    acts = {k[len("act_"):]: z[k] for k in z.files if k.startswith("act_")}
    print("captured reference activations:", sorted(acts.keys()))

    graph, outs, sd = load_golden_npz("/root/repo/.cache/golden_e2e.npz")
    batch = pair_batch_from_stacked(
        graph["points"], graph["lengths"], graph["neighbors"],
        graph["subsampling"], graph["upsampling"], np.eye(4, dtype=np.float32),
    )
    import dataclasses

    params = convert_state_dict(sd)
    cfg = make_cfg()
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, shared_influence=False)
    )
    dtype = jnp.dtype(cfg.compute_dtype)
    ref_n = [int(l[0]) for l in graph["lengths"]]
    src_n = [int(l[1]) for l in graph["lengths"]]

    from rdmnet_tpu.graph.pyramid import stack_pair_graph

    sg = stack_pair_graph(batch.ref, batch.src)
    caps = [batch.ref.points[i].shape[0] for i in range(5)]
    enc = Encoder(cfg.backbone, dtype=dtype)
    encp = {"params": params["encoder"]}
    feats_in = jnp.concatenate([batch.ref_feats, batch.src_feats], axis=0)
    feats_list = jax.jit(lambda p, f: enc.apply(p, f, sg))(encp, feats_in)
    ref_list = [f[: caps[i]] for i, f in enumerate(feats_list)]
    src_list = [f[caps[i] :] for i, f in enumerate(feats_list)]

    # reference hook captured encoder output = feats_list (list of stacked)
    enc_keys = sorted(k for k in acts if k.startswith("encoder"))
    for i, k in enumerate(enc_keys):
        stacked = acts[k]
        lvl = i
        r = rel(np.asarray(ref_list[lvl])[: ref_n[lvl]], stacked[: ref_n[lvl]])
        s = rel(np.asarray(src_list[lvl])[: src_n[lvl]],
                stacked[ref_n[lvl] : ref_n[lvl] + src_n[lvl]])
        print(f"encoder feats_list[{lvl}]: ref rel {r:9.2e}  src rel {s:9.2e}  shape {stacked.shape}")

    # transformer on the encoder coarse feats
    tr = ThDRoFormer(
        cfg.thdroformer.input_dim, cfg.thdroformer.output_dim,
        cfg.thdroformer.hidden_dim, cfg.thdroformer.num_heads,
        cfg.thdroformer.num_layers, dtype=dtype,
    )
    trp = {"params": params["transformer"]}
    ref_mask_c = batch.ref.mask(4)
    src_mask_c = batch.src.mask(4)
    rf, sf = jax.jit(
        lambda p, a, b, c, d: tr.apply(
            p, a, b, c, d, ref_valid=ref_mask_c, src_valid=src_mask_c
        )
    )(trp, batch.ref.points[4], batch.src.points[4], ref_list[-1], src_list[-1])
    for k in sorted(k for k in acts if k.startswith("transformer.") and not k.startswith("transformer2")):
        pass
    t0 = acts.get("transformer.0")
    t1 = acts.get("transformer.1")
    if t0 is not None:
        print("transformer ref out rel:", f"{rel(np.asarray(rf)[:ref_n[4]], t0[0, :ref_n[4]] if t0.ndim == 3 else t0[:ref_n[4]]):9.2e}")
        print("transformer src out rel:", f"{rel(np.asarray(sf)[:src_n[4]], t1[0, :src_n[4]] if t1.ndim == 3 else t1[:src_n[4]]):9.2e}")


if __name__ == "__main__":
    main()
