"""cli/test_sweep: the snapshot-sweep workflow (reference
experiments/test_batchoffline.py:255-278) — N strided worker processes per
epoch writing one shared feature dir, then per-epoch offline eval.

The slow test runs the REAL subprocess pipeline (2 workers x 2 epochs at the
tiny preset on the CPU backend) and checks the properties the sweep's
plumbing must hold: disjoint shards, a complete merged feature dir, and an
eval aggregate per (epoch, method).
"""

import glob
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
SCRIPT = osp.join(REPO, "scripts", "make_synth_kitti.py")


@pytest.fixture(scope="module")
def sweep_fixture(tmp_path_factory):
    """A synthetic KITTI root (2 test pairs) + a tiny-cfg snapshot dir with
    epochs 1 and 2 (same random params; the sweep only needs restorable
    steps)."""
    import jax

    from rdmnet_tpu.cli.common import pad_pair_np
    from rdmnet_tpu.config import make_tiny_cfg
    from rdmnet_tpu.engine.checkpoint import CheckpointManager
    from rdmnet_tpu.engine.train_step import create_train_state
    from rdmnet_tpu.graph.pyramid import build_pair_batch

    tmp = tmp_path_factory.mktemp("sweep")
    scan = tmp / "scan.npy"
    rng = np.random.RandomState(0)
    # fits the tiny preset's 512-point cap without truncation
    np.save(scan, (rng.rand(400, 4) * 40).astype(np.float32))
    root = tmp / "root"
    subprocess.run(
        [sys.executable, SCRIPT, "--out", str(root), "--frames", "4",
         "--scan", str(scan)],
        check=True,
    )

    cfg = make_tiny_cfg()
    pts = (rng.rand(128, 3) * 10).astype(np.float32)
    rp, rc, sp, sc = pad_pair_np(cfg, pts, pts)
    example = jax.jit(
        lambda: build_pair_batch(rp, rc, sp, sc, np.eye(4, dtype=np.float32),
                                 cfg.pyramid)
    )()
    state = create_train_state(cfg, jax.random.PRNGKey(0), example)
    snap_dir = str(tmp / "snapshots")
    mgr = CheckpointManager(snap_dir)
    for epoch in (1, 2):
        mgr.save(epoch, state, metadata={"epoch": epoch})
    mgr.wait_until_finished()
    return str(root), snap_dir, str(tmp)


@pytest.mark.slow
def test_sweep_two_workers_end_to_end(sweep_fixture):
    root, snap_dir, tmp = sweep_fixture
    feature_root = osp.join(tmp, "sweep_out")
    cache = osp.join(REPO, ".cache", "jax_test_cache")
    res = subprocess.run(
        [
            sys.executable, "-m", "rdmnet_tpu.cli.test_sweep",
            "--dataset", "kitti", "--root", root,
            "--snapshot_dir", snap_dir, "--epochs", "1", "2",
            "--methods", "lgr",
            "--feature_root", feature_root,
            "--num_workers", "2",
            # worker_env exercised for real: share the suite's compile cache
            "--worker_env",
            f"JAX_COMPILATION_CACHE_DIR={cache}",
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0",
            "--worker_args", "--platform cpu --cfg_preset tiny --no_compress",
        ],
        capture_output=True, text=True, cwd=REPO,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-4000:]

    for epoch in (1, 2):
        feature_dir = osp.join(feature_root, f"kitti_epoch{epoch}")
        dumps = sorted(glob.glob(osp.join(feature_dir, "*.npz")))
        # merged dir is COMPLETE: both test pairs present (strided shards
        # 0 and 1 each own exactly one of the 2 pairs)
        assert len(dumps) == 2, (epoch, dumps)
        names = {osp.basename(d) for d in dumps}
        assert len(names) == 2  # disjoint shards: no duplicate pair dumped
        for d in dumps:
            loaded = np.load(d)
            assert "estimated_transform" in loaded.files
    # one eval aggregate per (epoch, method)
    assert res.stdout.count("== eval") == 2, res.stdout[-2000:]
    assert res.stdout.count("RR:") >= 2


@pytest.mark.slow  # shares the module fixture (tiny-cfg snapshot compile)
def test_sweep_fails_loudly_when_a_worker_dies(sweep_fixture, tmp_path):
    """A dead worker must fail the sweep BEFORE eval (an incomplete shared
    feature dir silently corrupts metrics otherwise)."""
    root, snap_dir, _ = sweep_fixture
    res = subprocess.run(
        [
            sys.executable, "-m", "rdmnet_tpu.cli.test_sweep",
            "--dataset", "kitti", "--root", root,
            "--snapshot_dir", snap_dir + "_missing",  # worker exits nonzero
            "--epochs", "1", "--methods", "lgr",
            "--feature_root", str(tmp_path / "out"),
            "--num_workers", "2",
            "--worker_args", "--platform cpu --cfg_preset tiny",
        ],
        capture_output=True, text=True, cwd=REPO,
    )
    assert res.returncode != 0
    assert "test worker(s) failed" in res.stderr
    assert "== eval" not in res.stdout
