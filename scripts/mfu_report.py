"""Utilization report: per-stage achieved HBM bandwidth and MXU rate of the
fused inference pipeline vs TPU v5e peaks (VERDICT r3 #3).

DESIGN.md's "machine floor" argument (the model half sits at the XLA
row-gather emitter floor: ~4 ns/row + ~30 GB/s effective) was measured but
never converted to utilization fractions. This script mechanizes that:

* times nested PREFIXES of the fused program (profile_model.py's method —
  standalone modules mis-measure by ~2x because prebuilt jit arguments
  force relayouts and lose fusion);
* pulls FLOPs / bytes-accessed for each prefix from XLA's own cost model
  (``compiled.cost_analysis()`` — an upper bound on true HBM traffic since
  operand reuse within fusions counts once per consumer, stated alongside);
* reports per-stage achieved GFLOP/s and GB/s as fractions of the v5e
  peaks (197 TFLOP/s bf16 MXU, 819 GB/s HBM — public numbers, e.g. the
  "How to Scale Your Model" v5e table), plus the hand-derived gather
  traffic of the dominant encoder stage.

Run on the real chip: python scripts/mfu_report.py [--iters 20]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16_TFLOPS = 197.0   # MXU peak, bf16 inputs / f32 accumulate
V5E_PEAK_HBM_GBS = 819.0       # HBM bandwidth


def timeit(fn, *args, iters=20):
    import jax

    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    dt = None
    for _ in range(2):
        t0 = time.perf_counter()
        prev = np.float32(0.0)
        o = None
        for _ in range(iters):
            o = fn(*args[:-1], args[-1] + prev * 0.0)
            prev = o * 0.0  # chain next input on this output (tunnel-safe)
        _ = np.asarray(o)
        dt = (time.perf_counter() - t0) / iters
    return dt


def cost_of(jitted, *args):
    """(flops, bytes_accessed) from XLA's cost model for a compiled fn."""
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    nbytes = float(ca.get("bytes accessed", float("nan")))
    return flops, nbytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--compile_only", action="store_true",
        help="compile the prefix programs into the persistent cache (and "
             "print their XLA cost-model numbers) without timing — lets the "
             "compiles overlap a running training job",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rdmnet_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from rdmnet_tpu.config import make_cfg
    from rdmnet_tpu.graph.pyramid import (
        build_pair_batch,
        pad_cloud,
        stack_pair_graph,
    )
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
        return b.ref.points[-1].sum() + (
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
        keep = sum(f.astype(jnp.float32).sum() for f in fl[:-1]) * 1e-12
        return r.astype(jnp.float32).sum() + s.astype(jnp.float32).sum() + keep

    def prefix_full(params, rp):
        out = model.apply(
            params,
            build_pair_batch(rp, rc, sp, sc, eye, cfg.pyramid),
            training=False,
            with_gt=False,
        )
        return out["estimated_transform"].sum()

    stages = [
        ("build", jax.jit(prefix_build)),
        ("build+encoder", jax.jit(prefix_encoder)),
        ("build+enc+tf1", jax.jit(prefix_tf1)),
        ("full", jax.jit(prefix_full)),
    ]
    rows = []
    for name, fn in stages:
        flops, nbytes = cost_of(fn, params, rp0)
        dt = (float("nan") if args.compile_only
              else timeit(fn, params, rp0, iters=args.iters))
        rows.append((name, dt, flops, nbytes))
        print(f"measured {name}: {dt * 1e3:.2f} ms, "
              f"{flops / 1e9:.1f} GFLOP, {nbytes / 1e9:.2f} GB (XLA cost model)",
              flush=True)
    if args.compile_only:
        print("compile-only run: programs cached; re-run without "
              "--compile_only on a free chip for the utilization table")
        return

    # per-stage diffs: each prefix adds one pipeline stage
    print("\nstage               |  ms    | GFLOP  |  GB   | GFLOP/s | %MXU  | GB/s  | %HBM")
    print("--------------------|--------|--------|-------|---------|-------|-------|-----")

    def emit(name, dt, fl, by):
        gflops = fl / 1e9
        gb = by / 1e9
        gfps = gflops / dt if dt > 0 else float("nan")
        gbps = gb / dt if dt > 0 else float("nan")
        print(
            f"{name:20s}| {dt * 1e3:6.2f} | {gflops:6.1f} | {gb:5.2f} "
            f"| {gfps:7.1f} | {100 * gfps / (V5E_PEAK_BF16_TFLOPS * 1e3):5.2f} "
            f"| {gbps:5.1f} | {100 * gbps / V5E_PEAK_HBM_GBS:4.1f}"
        )

    prev = ("", 0.0, 0.0, 0.0)
    labels = ["build", "encoder", "transformer1", "rest(dec+match+pose)"]
    for (name, dt, fl, by), label in zip(rows, labels):
        emit(label, dt - prev[1], fl - prev[2], by - prev[3])
        prev = (name, dt, fl, by)
    emit("TOTAL (fused)", rows[-1][1], rows[-1][2], rows[-1][3])

    print(
        "\nNotes: bytes are XLA's cost-model 'bytes accessed' (upper bound —"
        "\noperand reuse inside fusions is counted per consumer); %MXU is vs"
        f"\nthe v5e bf16 peak ({V5E_PEAK_BF16_TFLOPS:.0f} TFLOP/s); geometry"
        "\nmatmuls run HIGHEST (6-pass) so their attainable peak is ~1/6 of"
        "\nthat. %HBM is vs the v5e 819 GB/s pin bandwidth."
    )


if __name__ == "__main__":
    main()
