"""Per-stage timing of the inference pipeline on the live device.

Times (steady-state, chained-dependency):
  1. build_pair_batch alone
  2. model.apply alone (prebuilt batch)
  3. full pipeline (build + apply)
and a per-search breakdown of the graph build.
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20, reps=2):
    out = fn(*args)
    leaves = [x for x in __import__("jax").tree.leaves(out)]
    _ = np.asarray(leaves[0])
    dt = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        _ = np.asarray(__import__("jax").tree.leaves(o)[0])
        dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from rdmnet_tpu.config import make_cfg
    from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud, build_cloud_pyramid
    from rdmnet_tpu.models import RDMNet
    from rdmnet_tpu.data.loader import choose_bucket

    cfg = make_cfg()
    ref = np.load("/root/reference/assets/pc/000000.npy")[:, :3].astype(np.float32)
    src = np.load("/root/reference/assets/pc/000004.npy")[:, :3].astype(np.float32)
    buckets = [cfg.pyramid.scaled(0.7), cfg.pyramid]
    b = choose_bucket(max(len(ref), len(src)), [s.caps[0] for s in buckets])
    cfg = dataclasses.replace(cfg, pyramid=buckets[b])
    print("bucket caps:", cfg.pyramid.caps)
    model = RDMNet(cfg)
    cap = cfg.pyramid.caps[0]
    rp, rc = pad_cloud(jnp.asarray(ref), cap)
    sp, sc = pad_cloud(jnp.asarray(src), cap)
    eye = jnp.eye(4)

    build = jax.jit(lambda rp: build_pair_batch(rp, rc, sp, sc, eye, cfg.pyramid))
    batch = build(rp)
    params = jax.jit(lambda k: model.init(k, batch, training=False, with_gt=False))(
        jax.random.PRNGKey(0)
    )

    apply_fn = jax.jit(
        lambda params, batch: model.apply(params, batch, training=False, with_gt=False)[
            "estimated_transform"
        ]
    )
    full = jax.jit(
        lambda params, rp: model.apply(
            params,
            build_pair_batch(rp, rc, sp, sc, eye, cfg.pyramid),
            training=False,
            with_gt=False,
        )["estimated_transform"]
    )

    t_build = timeit(build, rp)
    t_apply = timeit(apply_fn, params, batch)
    t_full = timeit(full, params, rp)
    print(f"build_pair_batch : {t_build*1e3:8.2f} ms")
    print(f"model.apply      : {t_apply*1e3:8.2f} ms")
    print(f"full pipeline    : {t_full*1e3:8.2f} ms  ({1.0/t_full:.2f} pairs/s)")

    # graph-build internals: pyramid subsample alone vs each search level
    from rdmnet_tpu.ops.grid_subsample import grid_subsample
    from rdmnet_tpu.ops.radius_search import radius_knn

    spec = cfg.pyramid
    both_p = jnp.stack([rp, sp])
    both_c = jnp.stack([rc, sc])

    def subs_only(pts, cnts):
        def one(p, c):
            out = [p]
            cc = [c]
            voxel = spec.voxel_size
            for i in range(1, spec.num_stages):
                voxel *= 2.0
                p2, c2, _ = grid_subsample(out[-1], cc[-1], voxel, spec.caps[i], return_dropped=True)
                out.append(p2)
                cc.append(c2)
            return tuple(out), tuple(cc)
        return jax.vmap(one)(pts, cnts)

    subs = jax.jit(subs_only)
    pts, cnts = subs(both_p, both_c)
    t_subs = timeit(subs, both_p, both_c)
    print(f"  subsample (all levels, x2 clouds): {t_subs*1e3:8.2f} ms")

    radius = spec.search_radius
    for i in range(spec.num_stages):
        ar = spec.approx_recall
        f = jax.jit(
            jax.vmap(
                lambda p, c, _r=radius, _i=i: radius_knn(
                    p, p, c, _r, spec.neighbor_limits[_i], approx_recall=ar
                )
            )
        )
        t = timeit(f, pts[i], cnts[i], iters=10)
        print(f"  neighbors level {i} ({spec.caps[i]}x{spec.caps[i]}): {t*1e3:8.2f} ms")
        if i < spec.num_stages - 1:
            f2 = jax.jit(
                jax.vmap(
                    lambda q, p, c, _r=radius, _i=i: radius_knn(
                        q, p, c, _r, spec.neighbor_limits[_i], approx_recall=ar
                    )
                )
            )
            t2 = timeit(f2, pts[i + 1], pts[i], cnts[i], iters=10)
            print(f"  subsampling level {i} ({spec.caps[i+1]}x{spec.caps[i]}): {t2*1e3:8.2f} ms")
        radius *= 2.0


if __name__ == "__main__":
    main()
