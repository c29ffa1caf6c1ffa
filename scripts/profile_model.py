"""Stage cost breakdown of the fused pipeline on the live device.

Standalone per-module timing is unreliable here: passing prebuilt index
tables as jit arguments forces relayouts and defeats the fusion the real
program gets, so a lone encoder can measure ~2x slower than the whole fused
pipeline. Instead this script times nested PREFIXES of the fused program
(build; build+encoder; +transformer1; +decoder; full) and reports
differences. Each prefix returns a small reduction of its last live value so
all compute stays live and host fetches stay tiny; timing uses bench.py's
chained-input trick (the tunnel's block_until_ready is unreliable).
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = np.asarray(out)
    dt = None
    for _ in range(2):
        t0 = time.perf_counter()
        prev = np.float32(0.0)
        o = None
        for _ in range(iters):
            o = fn(*args[:-1], args[-1] + prev * 0.0)
            prev = o * 0.0  # device scalar: chains next input on this output
        _ = np.asarray(o)
        dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from rdmnet_tpu.config import make_cfg
    from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud, stack_pair_graph
    from rdmnet_tpu.models import RDMNet
    from rdmnet_tpu.nn.backbone import Encoder
    from rdmnet_tpu.nn.thdroformer import ThDRoFormer

    cfg = make_cfg()
    ref = np.load("/root/reference/assets/pc/000000.npy")[:, :3].astype(np.float32)
    src = np.load("/root/reference/assets/pc/000004.npy")[:, :3].astype(np.float32)
    cfg = dataclasses.replace(cfg, pyramid=cfg.pyramid.scaled(0.7))
    model = RDMNet(cfg)
    cap = cfg.pyramid.caps[0]
    rp0, rc = pad_cloud(jnp.asarray(ref), cap)
    sp, sc = pad_cloud(jnp.asarray(src), cap)
    eye = jnp.eye(4)
    dtype = jnp.dtype(cfg.compute_dtype)

    batch0 = jax.jit(lambda rp: build_pair_batch(rp, rc, sp, sc, eye, cfg.pyramid))(rp0)
    params = jax.jit(lambda k: model.init(k, batch0, training=False, with_gt=False))(
        jax.random.PRNGKey(0)
    )

    enc = Encoder(cfg.backbone, dtype=dtype)
    tf1 = ThDRoFormer(
        cfg.thdroformer.input_dim,
        cfg.thdroformer.output_dim,
        cfg.thdroformer.hidden_dim,
        cfg.thdroformer.num_heads,
        cfg.thdroformer.num_layers,
        dtype=dtype,
    )

    def prefix_build(params, rp):
        b = build_pair_batch(rp, rc, sp, sc, eye, cfg.pyramid)
        return b.ref.points[-1].sum() + b.ref.neighbors[0].sum() * 0 + (
            sum(n.sum() for n in b.ref.neighbors)
            + sum(n.sum() for n in b.src.neighbors)
        ).astype(jnp.float32) * 1e-9

    def encoder_feats(params, rp):
        b = build_pair_batch(rp, rc, sp, sc, eye, cfg.pyramid)
        graph = stack_pair_graph(b.ref, b.src)
        feats_in = jnp.concatenate([b.ref_feats, b.src_feats], axis=0)
        fl = enc.apply({"params": params["params"]["encoder"]}, feats_in, graph)
        return b, fl

    def prefix_encoder(params, rp):
        _, fl = encoder_feats(params, rp)
        return fl[-1].astype(jnp.float32).sum()

    def prefix_tf1(params, rp):
        b, fl = encoder_feats(params, rp)
        cap_c = b.ref.points[-1].shape[0]
        fc = fl[-1].reshape(2, cap_c, -1)
        rm = b.ref.mask(b.ref.num_stages - 1)
        sm = b.src.mask(b.src.num_stages - 1)
        r, s = tf1.apply(
            {"params": params["params"]["transformer"]},
            b.ref.points[-1], b.src.points[-1], fc[0], fc[1],
            ref_valid=rm, src_valid=sm,
        )
        # keep every encoder level live (the decoder would consume them)
        keep = sum(f.astype(jnp.float32).sum() for f in fl[:-1]) * 1e-12
        return r.astype(jnp.float32).sum() + s.astype(jnp.float32).sum() + keep

    def prefix_full(params, rp):
        out = model.apply(params, batch_from(rp), training=False, with_gt=False)
        return out["estimated_transform"].sum()

    def batch_from(rp):
        return build_pair_batch(rp, rc, sp, sc, eye, cfg.pyramid)

    fns = {
        "build": jax.jit(prefix_build),
        "build+encoder": jax.jit(prefix_encoder),
        "build+encoder+tf1": jax.jit(prefix_tf1),
        "full": jax.jit(prefix_full),
    }
    times = {}
    for name, fn in fns.items():
        times[name] = timeit(fn, params, rp0)
        print(f"{name:24s}: {times[name]*1e3:8.2f} ms")
    print(f"{'encoder (diff)':24s}: {(times['build+encoder'] - times['build'])*1e3:8.2f} ms")
    print(f"{'tf1 (diff)':24s}: {(times['build+encoder+tf1'] - times['build+encoder'])*1e3:8.2f} ms")
    print(f"{'rest (diff)':24s}: {(times['full'] - times['build+encoder+tf1'])*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
