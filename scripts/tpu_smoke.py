"""On-chip kernel/precision smoke: asserts the contracts that interpret-mode
CI cannot check (tests/test_pallas_kernels.py runs interpret=True on CPU).

Round-2 shipped a bug exactly in this gap: the pallas exact-kNN ran its
distance matmul on the bf16 MXU pass, violating its exact-top-k contract —
found by hand on the chip. This script mechanizes that class of check:

  1. BOTH exact kNN paths (jnp top_k and the compiled pallas lowering)
     return a valid exact in-radius top-k of the TRUE f64 distances on a
     real bundled scan, up to an f32-rounding tie tolerance (bit-identity
     ACROSS the two paths is not a sound contract: their expanded-form
     f32 rounding differs, and differs across toolchain releases);
  2. pallas fused Sinkhorn (VMEM kernel) == the lax.scan path;
  3. approx (banded + approx_max_k) search recall vs exact >= the
     configured target on a real scan;
  4. SE(3) pose path under HIGHEST matmul precision recovers a known
     transform on a real scan to sub-0.01-deg / sub-mm;
  5. grid_subsample level occupancies on the demo scan match the pinned
     values (deterministic voxel pipeline).

Run: python scripts/tpu_smoke.py   (on the TPU; ~2 min incl. compiles)
Exits nonzero on any violated contract.
"""

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--interpret", action="store_true",
        help="run the pallas kernels in interpret mode on CPU — a dry run "
             "of this script's plumbing only; the POINT is the compiled "
             "TPU lowering, so the real check needs the chip",
    )
    args = ap.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    from rdmnet_tpu.cli.common import enable_compile_cache

    enable_compile_cache()  # warm reruns skip ~4 min of pipeline compiles

    import jax.numpy as jnp

    print(f"devices: {jax.devices()}")
    failures = []
    interp = {"interpret": True} if args.interpret else {}

    def check(name, ok, detail=""):
        print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}", flush=True)
        if not ok:
            failures.append(name)

    scan = np.load("/root/reference/assets/pc/000000.npy")[:, :3].astype(np.float32)

    # ---- 1. exact-kNN contract vs an f64 oracle (the r2 bug class) -------
    # Both exact paths (jnp top_k and the pallas kernel) compute f32
    # distances in the expanded q2-2qs+s2 form; their last-ulp rounding
    # differs (and differs across toolchain releases — the 2026-08 update
    # changed HIGHEST-matmul rounding enough to reorder ~0.02% of pairs),
    # so bit-identity ACROSS paths is not a sound contract. The contract
    # that catches the r2 bug class (bf16 MXU pass = ~1e-2 relative error,
    # 4 orders of magnitude above f32 rounding) is: each path's result is
    # a valid exact in-radius top-k of the TRUE (f64) distances up to an
    # f32-rounding tie tolerance.
    from rdmnet_tpu.ops.pallas.radius_knn import radius_knn_pallas
    from rdmnet_tpu.ops.radius_search import radius_knn

    N_Q, S_CAP, S_COUNT = 2048, 4096, 4000
    q = jnp.asarray(scan[:N_Q])
    s = jnp.asarray(scan[:S_CAP])
    s_count = jnp.int32(S_COUNT)
    radius, k = 4.8, 32
    want = np.asarray(jax.jit(
        lambda q, s: radius_knn(q, s, s_count, radius, k, approx_recall=None)
    )(q, s))
    got = np.asarray(jax.jit(
        lambda q, s: radius_knn_pallas(q, s, s_count, radius, k, **interp)
    )(q, s))

    d64 = ((scan[:N_Q, None, :].astype(np.float64)
            - scan[None, :S_CAP, :].astype(np.float64)) ** 2).sum(-1)
    d64[:, S_COUNT:] = np.inf  # invalid support rows
    r2 = float(radius) ** 2
    # tie tolerance = the rounding bound of the jnp path's ACTUAL compute:
    # the qs matmul runs at Precision.HIGH (bf16x3,
    # ops/radius_search.py:37), effective unit roundoff ~2^-18, applied to
    # the expanded q2 - 2qs + s2 form at the operands' true magnitudes.
    # At this scan's extent (|s| up to ~86 m) that is ~4e-2 m^2 — sub-cm
    # in DISTANCE at these ranges, so only physically-tied neighbors can
    # reorder. A fixed 1e-3 (calibrated on an older toolchain at "~40 m")
    # flagged 198/2048 rows of exactly these rounding-scale order flips
    # after the 2026-08 toolchain update (worst observed 8.8e-3; the
    # neighbor SETS were correct; the pallas kernel squares differences
    # directly, error ~eps32*d2 ~ 3e-6, and passes at any sane tol). The
    # r2-bug class this check exists for — a SINGLE-pass bf16 distance
    # matrix — errs at ~2^-8 * |qs| ~ 10 m^2 here, 250x this bound, so
    # the contract still catches it loudly.
    # PER-PATH tolerances: the pallas kernel squares coordinate
    # DIFFERENCES (error ~eps32 * d2 ~ 3e-6), so it keeps the tight 1e-3
    # bound — sharing the jnp path's wide bf16x3 bound would loosen the
    # pallas oracle check ~40x and let a real lowering regression hide.
    eps_high = 2.0 ** -18  # bf16x3 effective unit roundoff
    q2max = float((scan[:N_Q] ** 2).sum(-1).max())
    s2max = float((scan[:S_CAP] ** 2).sum(-1).max())
    tol_jnp = eps_high * (q2max + 2 * np.sqrt(q2max * s2max) + s2max)
    tol_pallas = 1e-3

    def knn_violations(res, sentinel, tol):
        """Count rows violating the exact in-radius top-k contract at the
        path's own rounding tolerance ``tol``.

        ``sentinel`` is the path's missing-neighbor fill value (both paths
        use the framework convention: index == padded support capacity,
        ops/radius_search.py:11). Any raw entry that is neither a VALID
        support index (< s_count) nor the sentinel — e.g. an invalid-support
        index in [s_count, cap) — is itself a violation, not silently
        dropped.
        """
        bad = 0
        for r in range(res.shape[0]):
            raw = res[r]
            ok = bool(np.all((raw == sentinel) | ((raw >= 0) & (raw < S_COUNT))))
            idx = raw[(raw >= 0) & (raw < S_COUNT)]
            dr = d64[r, idx]
            ok &= bool(np.all(np.diff(dr) >= -tol))   # ascending (ties ok)
            ok &= bool(np.all(dr <= r2 + tol))        # in radius
            sure_in = int((d64[r] <= r2 - tol).sum()) # count can only vary
            may_in = int((d64[r] <= r2 + tol).sum())  # at the boundary
            ok &= min(k, sure_in) <= len(idx) <= min(k, may_in)
            if len(idx):                               # the k nearest, up to ties
                osort = np.sort(d64[r][d64[r] <= r2 + tol])[: len(idx)]
                ok &= bool(np.all(np.abs(np.sort(dr) - osort) <= tol))
            bad += not ok
        return bad

    bad_jnp = knn_violations(want, S_CAP, tol_jnp)
    bad_pal = knn_violations(got, S_CAP, tol_pallas)
    check("jnp exact kNN matches f64 oracle (tie-tol)", bad_jnp == 0,
          f"violating rows: {bad_jnp}/{len(want)}")
    check("pallas exact kNN matches f64 oracle (tie-tol)", bad_pal == 0,
          f"violating rows: {bad_pal}/{len(got)}")
    # cross-path neighbor SETS must agree wherever no f64 tie is in play
    # (cheap canary for gross divergence between the two implementations)
    setdiff = sum(
        set(want[r][want[r] < S_COUNT].tolist())
        != set(got[r][got[r] < S_COUNT].tolist())
        for r in range(want.shape[0])
    )
    check("jnp vs pallas kNN sets agree on >=99% of rows",
          setdiff <= len(want) // 100, f"set-differing rows: {setdiff}")

    # ---- 2. pallas fused Sinkhorn == lax.scan path -----------------------
    from rdmnet_tpu.nn.sinkhorn import log_sinkhorn
    from rdmnet_tpu.ops.pallas.sinkhorn import sinkhorn_pallas

    # P=20 with block_patches=4 drives the block-choice rounding path
    # (4 -> 8 sublane multiple) AND a multi-block grid with a padded tail —
    # the exact lowering case Mosaic rejected before _choose_block existed.
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.randn(20, 33, 33).astype(np.float32))
    log_mu = jnp.asarray(rng.randn(20, 33).astype(np.float32) * 0.1)
    log_nu = jnp.asarray(rng.randn(20, 33).astype(np.float32) * 0.1)
    a = np.asarray(jax.jit(lambda s, m, n: log_sinkhorn(s, m, n, 30))(
        scores, log_mu, log_nu))
    b = np.asarray(jax.jit(
        lambda s, m, n: sinkhorn_pallas(s, m, n, 30, block_patches=4, **interp)
    )(scores, log_mu, log_nu))
    err = float(np.abs(a - b).max())
    check("pallas Sinkhorn == scan path", err < 1e-3, f"max |diff| = {err:.2e}")

    # ---- 3. approx search recall vs exact on a real scan -----------------
    from rdmnet_tpu.config import make_cfg

    cfg = make_cfg()
    target = cfg.pyramid.approx_recall or 0.95
    approx = np.asarray(jax.jit(
        lambda q, s: radius_knn(q, s, s_count, radius, k,
                                approx_recall=target)
    )(q, s))
    # per-row recall of the exact neighbor SET (sentinels excluded)
    hits = sames = 0
    for i in range(want.shape[0]):
        w = set(want[i][want[i] >= 0].tolist()) - {int(s_count)}
        g = set(approx[i][approx[i] >= 0].tolist()) - {int(s_count)}
        w = {v for v in w if v < int(s_count)}
        g = {v for v in g if v < int(s_count)}
        if w:
            hits += len(w & g)
            sames += len(w)
    recall = hits / max(sames, 1)
    check(f"approx search recall >= {target}", recall >= target,
          f"measured {recall:.4f}")

    # ---- 4. SE(3) HIGHEST-precision pose recovery ------------------------
    from rdmnet_tpu.ops.geometry import apply_transform
    from rdmnet_tpu.ops.procrustes import weighted_procrustes
    from rdmnet_tpu.utils.metrics_np import compute_registration_error
    from rdmnet_tpu.utils.se3_np import euler_zyx_matrix

    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = euler_zyx_matrix(0.9, -0.4, 0.3).astype(np.float32)
    gt[:3, 3] = [2.0, -1.5, 0.8]
    src = jnp.asarray(scan[:8192])

    @jax.jit
    def recover(src):
        with jax.default_matmul_precision("highest"):
            ref = apply_transform(src, jnp.asarray(gt))
            return weighted_procrustes(src, ref)

    est = np.asarray(recover(src))
    rre, rte, *_ = compute_registration_error(gt, est)
    check("SE(3) HIGHEST-precision recovery", rre < 0.01 and rte < 1e-3,
          f"RRE {rre:.5f} deg, RTE {rte * 1000:.3f} mm")

    # ---- 5. deterministic voxel pipeline on the demo scan ----------------
    from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud

    rp, rc = pad_cloud(jnp.asarray(scan), cfg.pyramid.caps[0])
    batch = jax.jit(
        lambda rp, rc: build_pair_batch(rp, rc, rp, rc, jnp.eye(4), cfg.pyramid)
    )(rp, rc)
    counts = [int(c) for c in jax.device_get(batch.ref.counts)]
    check("grid_subsample occupancies pinned",
          counts == [20524, 8145, 3240, 1139, 431], f"got {counts}")

    if failures:
        print(f"\nSMOKE FAILED: {failures}")
        sys.exit(1)
    print("\nall on-chip contracts hold")


if __name__ == "__main__":
    main()
