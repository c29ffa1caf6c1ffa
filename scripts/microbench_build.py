"""Graph-build stage A/B microbenchmark on the live device.

Measures, at the production 0.7 bucket on the bundled demo pair:
  1. build_pair_batch total vs PyramidConfig.map_batch (lax.map batch_size
     — tiles per search-loop iteration; results proven invariant in
     tests/test_ops_core.py::test_map_batch_is_result_invariant);
  2. the full pipeline (build + model) at the best map_batch;
  3. a per-table breakdown of the build with the REAL banded-search
     parameters (profile_stages.py's breakdown uses the unbanded search
     and underestimates nothing but overstates the fine levels).

Timing protocol per CLAUDE.md: chained inputs + one host fetch; report the
second loop.
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20, reps=2):
    import jax

    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    dt = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        _ = np.asarray(jax.tree.leaves(o)[0])
        dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from rdmnet_tpu.config import make_cfg
    from rdmnet_tpu.data.loader import choose_bucket
    from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud
    from rdmnet_tpu.models import RDMNet

    cfg = make_cfg()
    ref = np.load("/root/reference/assets/pc/000000.npy")[:, :3].astype(np.float32)
    src = np.load("/root/reference/assets/pc/000004.npy")[:, :3].astype(np.float32)
    buckets = [cfg.pyramid.scaled(0.7), cfg.pyramid]
    b = choose_bucket(max(len(ref), len(src)), [s.caps[0] for s in buckets])
    cfg = dataclasses.replace(cfg, pyramid=buckets[b])
    print("bucket caps:", cfg.pyramid.caps, "bands:", cfg.pyramid.band_caps)
    cap = cfg.pyramid.caps[0]
    rp, rc = pad_cloud(jnp.asarray(ref), cap)
    sp, sc = pad_cloud(jnp.asarray(src), cap)
    eye = jnp.eye(4)

    results = {}
    for mb in (None, 2, 4, 8):
        spec = dataclasses.replace(cfg.pyramid, map_batch=mb)
        build = jax.jit(
            lambda rp, _s=spec: build_pair_batch(rp, rc, sp, sc, eye, _s)
        )
        t = timeit(build, rp)
        results[mb] = t
        print(f"build_pair_batch map_batch={mb}: {t*1e3:8.2f} ms")

    best = min(results, key=results.get)
    print(f"best map_batch: {best} "
          f"({results[best]*1e3:.2f} vs {results[None]*1e3:.2f} ms baseline)")

    # full pipeline at baseline and best
    model = RDMNet(cfg)
    spec0 = cfg.pyramid

    def full_for(spec):
        m = RDMNet(dataclasses.replace(cfg, pyramid=spec))

        @jax.jit
        def full(params, rp):
            batch = build_pair_batch(rp, rc, sp, sc, eye, spec)
            return m.apply(params, batch, training=False, with_gt=False)[
                "estimated_transform"
            ]

        return full

    batch0 = jax.jit(lambda rp: build_pair_batch(rp, rc, sp, sc, eye, spec0))(rp)
    params = jax.jit(
        lambda k: model.init(k, batch0, training=False, with_gt=False)
    )(jax.random.PRNGKey(0))
    for mb in {None, best}:
        spec = dataclasses.replace(cfg.pyramid, map_batch=mb)
        t = timeit(full_for(spec), params, rp)
        print(f"full pipeline map_batch={mb}: {t*1e3:8.2f} ms "
              f"({1.0/t:.2f} pairs/s)")

    # per-table breakdown with the real banded parameters (pair via vmap,
    # matching the builder's execution shape)
    from rdmnet_tpu.graph.pyramid import build_cloud_pyramid
    from rdmnet_tpu.ops.grid_subsample import grid_subsample
    from rdmnet_tpu.ops.radius_search import radius_knn, radius_knn_banded

    spec = cfg.pyramid
    both_p, both_c = jnp.stack([rp, sp]), jnp.stack([rc, sc])

    def levels(pts0, cnt0):
        out, cc = [pts0], [cnt0]
        voxel = spec.voxel_size
        for i in range(1, spec.num_stages):
            voxel *= 2.0
            p2, c2, _ = grid_subsample(out[-1], cc[-1], voxel, spec.caps[i],
                                       return_dropped=True)
            out.append(p2)
            cc.append(c2)
        return tuple(out), tuple(cc)

    # include the level-0 sort so level-0 searches see sorted points
    def sort0(p, c):
        from rdmnet_tpu.ops.grid_subsample import voxel_sort_key

        valid = jnp.arange(p.shape[0], dtype=jnp.int32) < c
        key, _ = voxel_sort_key(p, valid, spec.sort_cell(0))
        _, order = jax.lax.sort((key, jnp.arange(p.shape[0], dtype=jnp.int32)),
                                num_keys=1)
        return jnp.take(p, order, axis=0)

    subs = jax.jit(jax.vmap(lambda p, c: levels(sort0(p, c), c)))
    pts, cnts = subs(both_p, both_c)
    t_subs = timeit(subs, both_p, both_c)
    print(f"  sort+subsample (all levels, x2 clouds): {t_subs*1e3:8.2f} ms")

    def one_search(q_lvl, s_lvl, r, k):
        band = spec.band_caps[s_lvl]
        recall = spec.approx_recall if k > 1 else None

        def f(qp, sp_, sc_, qc):
            if band is None or band >= spec.caps[s_lvl]:
                return radius_knn(qp, sp_, sc_, r, k, approx_recall=recall)
            return radius_knn_banded(
                qp, sp_, sc_, r, k, cell=spec.sort_cell(s_lvl),
                band_cap=band, q_count=qc,
                chunk_size=spec.band_chunk_for(q_lvl), approx_recall=recall,
            )

        return jax.jit(jax.vmap(f))

    radius = spec.search_radius
    total = 0.0
    for i in range(spec.num_stages):
        f = one_search(i, i, radius, spec.neighbor_limits[i])
        t = timeit(f, pts[i], pts[i], cnts[i], cnts[i], iters=10)
        total += t
        print(f"  neighbors[{i}]   q{spec.caps[i]:>6} s{spec.caps[i]:>6} "
              f"k{spec.neighbor_limits[i]:>3}: {t*1e3:7.2f} ms")
        if i < spec.num_stages - 1:
            f = one_search(i + 1, i, radius, spec.neighbor_limits[i])
            t = timeit(f, pts[i + 1], pts[i], cnts[i], cnts[i + 1], iters=10)
            total += t
            print(f"  subsampling[{i}] q{spec.caps[i+1]:>6} s{spec.caps[i]:>6} "
                  f"k{spec.neighbor_limits[i]:>3}: {t*1e3:7.2f} ms")
            k_up = spec.upsampling_limit or spec.neighbor_limits[i + 1]
            if i >= spec.build_upsampling_from_level:
                f = one_search(i, i + 1, radius * 2.0, k_up)
                t = timeit(f, pts[i], pts[i + 1], cnts[i + 1], cnts[i], iters=10)
                total += t
                print(f"  upsampling[{i}]  q{spec.caps[i]:>6} s{spec.caps[i+1]:>6} "
                      f"k{k_up:>3}: {t*1e3:7.2f} ms")
        radius *= 2.0
    print(f"  search total (isolated sum): {total*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
