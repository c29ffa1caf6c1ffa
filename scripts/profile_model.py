"""Per-module timing of model.apply on the live device."""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax

    o = fn(*args)
    _ = np.asarray(jax.tree.leaves(o)[0])
    dt = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        _ = np.asarray(jax.tree.leaves(o)[0])
        dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from rdmnet_tpu.config import make_cfg
    from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud
    from rdmnet_tpu.models import RDMNet
    from rdmnet_tpu.nn.backbone import Decoder, Encoder

    cfg = make_cfg()
    ref = np.load("/root/reference/assets/pc/000000.npy")[:, :3].astype(np.float32)
    src = np.load("/root/reference/assets/pc/000004.npy")[:, :3].astype(np.float32)
    cfg = dataclasses.replace(cfg, pyramid=cfg.pyramid.scaled(0.7))
    model = RDMNet(cfg)
    cap = cfg.pyramid.caps[0]
    rp, rc = pad_cloud(jnp.asarray(ref), cap)
    sp, sc = pad_cloud(jnp.asarray(src), cap)
    eye = jnp.eye(4)

    batch = jax.jit(lambda rp: build_pair_batch(rp, rc, sp, sc, eye, cfg.pyramid))(rp)
    params = jax.jit(lambda k: model.init(k, batch, training=False, with_gt=False))(
        jax.random.PRNGKey(0)
    )

    dtype = jnp.dtype(cfg.compute_dtype)
    enc = Encoder(cfg.backbone, dtype=dtype)
    enc_params = {"params": params["params"]["encoder"]}

    enc_one = jax.jit(lambda p, feats, pyr: enc.apply(p, feats, pyr))
    t_enc = timeit(enc_one, enc_params, batch.ref_feats, batch.ref)
    print(f"encoder (one cloud)    : {t_enc*1e3:8.2f} ms")

    feats_list = enc_one(enc_params, batch.ref_feats, batch.ref)
    dec = Decoder(cfg.backbone, dtype=dtype)
    dec_params = {"params": params["params"]["decoder"]}
    # decoder input: coarse feats with +1 score channel
    coarse_in = jnp.concatenate(
        [feats_list[-1][:, : cfg.thdroformer.output_dim], feats_list[-1][:, :1]], axis=1
    )
    dec_in = list(feats_list[:-1]) + [coarse_in]
    dec_one = jax.jit(lambda p, fl, pyr: dec.apply(p, fl, pyr))
    # decoder expects last element dim = output_dim+1; build from transformer out dim
    try:
        t_dec = timeit(dec_one, dec_params, dec_in, batch.ref)
        print(f"decoder (one cloud)    : {t_dec*1e3:8.2f} ms")
    except Exception as e:
        print("decoder timing skipped:", str(e)[:120])

    full = jax.jit(
        lambda p, b: model.apply(p, b, training=False, with_gt=False)[
            "estimated_transform"
        ]
    )
    t_full = timeit(full, params, batch)
    print(f"model.apply (full)     : {t_full*1e3:8.2f} ms")

    # encoder per-level: time stacked truncations by monkey-level runs
    from rdmnet_tpu.nn.kpconv import ConvBlock  # noqa: F401


if __name__ == "__main__":
    main()
