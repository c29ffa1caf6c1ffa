"""Guard for scripts/make_synth_kitti.py: the generated root must load
through RegistrationPairDataset with rigid-consistent GT in every split."""

import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

from rdmnet_tpu.data.datasets import RegistrationPairDataset
from rdmnet_tpu.utils.se3_np import apply_transform

SCRIPT = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                  "scripts", "make_synth_kitti.py")


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("synth")
    scan = tmp / "scan.npy"
    rng = np.random.RandomState(0)
    np.save(scan, (rng.rand(2000, 4) * 40).astype(np.float32))
    root = tmp / "root"
    subprocess.run(
        [sys.executable, SCRIPT, "--out", str(root), "--frames", "4",
         "--scan", str(scan)],
        check=True,
    )
    return str(root)


@pytest.mark.parametrize("subset,n_pairs", [("train", 3), ("val", 2), ("test", 2)])
def test_splits_load_with_rigid_gt(synth_root, subset, n_pairs):
    ds = RegistrationPairDataset("kitti", synth_root, subset,
                                 use_augmentation=False)
    assert len(ds) == n_pairs
    for i in range(len(ds)):
        item = ds[i]
        # frames are one base cloud under different rigid motions + 1 cm
        # noise, so the GT transform must align src onto ref point-for-point
        err = np.abs(
            apply_transform(item["src_points"], item["transform"])
            - item["ref_points"]
        ).max()
        assert err < 0.12, (subset, i, err)


def test_multi_root_concatenation(synth_root, tmp_path_factory):
    """root='A,B' concatenates same-schema roots: lengths add, every item
    loads with rigid-consistent GT, and seq_ids gain a root-index prefix so
    feature-dump names / trajectory grouping cannot collide across roots."""
    tmp = tmp_path_factory.mktemp("synth_b")
    scan = tmp / "scan.npy"
    rng = np.random.RandomState(9)
    np.save(scan, (rng.rand(1500, 4) * 30).astype(np.float32))
    root_b = tmp / "root_b"
    subprocess.run(
        [sys.executable, SCRIPT, "--out", str(root_b), "--frames", "3",
         "--scan", str(scan)],
        check=True,
    )
    ds_a = RegistrationPairDataset("kitti", synth_root, "train",
                                   use_augmentation=False)
    ds_b = RegistrationPairDataset("kitti", str(root_b), "train",
                                   use_augmentation=False)
    ds = RegistrationPairDataset("kitti", f"{synth_root},{root_b}", "train",
                                 use_augmentation=False)
    assert len(ds) == len(ds_a) + len(ds_b)
    seq_ids = {item["seq_id"] for item in (ds[i] for i in range(len(ds)))}
    assert all(str(s).startswith(("0.", "1.")) for s in seq_ids)
    assert any(str(s).startswith("0.") for s in seq_ids)
    assert any(str(s).startswith("1.") for s in seq_ids)
    # items from the second root are root_b's clouds, not root_a's
    first_b = next(ds[i] for i in range(len(ds))
                   if str(ds.metadata[i]["seq_id"]).startswith("1."))
    np.testing.assert_allclose(first_b["ref_points"], ds_b[0]["ref_points"])
    for i in (0, len(ds) - 1):
        item = ds[i]
        err = np.abs(
            apply_transform(item["src_points"], item["transform"])
            - item["ref_points"]
        ).max()
        assert err < 0.12, (i, err)


@pytest.mark.slow
def test_eval_loop_dumps_and_metrics(synth_root, tmp_path):
    """cli/test.run_eval_loop: pipelined forward + pooled npz writes produce
    one consumable dump per pair and a populated summary board."""
    from rdmnet_tpu.cli.common import build_model_and_params
    from rdmnet_tpu.cli.test import run_eval_loop
    from rdmnet_tpu.config import make_tiny_cfg

    cfg = make_tiny_cfg()
    model, params = build_model_and_params(cfg)
    ds = RegistrationPairDataset("kitti", synth_root, "test",
                                 use_augmentation=False)
    feature_dir = str(tmp_path / "features")
    import os
    os.makedirs(feature_dir)
    lines = []
    vis_dir = str(tmp_path / "vis")
    board = run_eval_loop(
        cfg, model, params, ds, list(range(len(ds))), feature_dir,
        compress=True, log=lines.append, vis_dir=vis_dir,
    )
    assert len(lines) == len(ds)
    fmt = board.format()
    for key in ("IR", "PIR", "RR", "dropped"):
        assert key in fmt
    import glob
    import os.path as osp
    dumps = sorted(glob.glob(osp.join(feature_dir, "*.npz")))
    assert len(dumps) == len(ds)
    d = np.load(dumps[0])
    for key in ("ref_points", "src_points", "estimated_transform", "transform"):
        assert key in d.files, key
    assert np.all(np.isfinite(d["estimated_transform"]))
    # --vis equivalent: per-pair PLY exports (clouds always; line files
    # depend on whether any/all correspondences were correct)
    pair_dirs = sorted(glob.glob(osp.join(vis_dir, "*")))
    assert len(pair_dirs) == len(ds)
    for pd in pair_dirs:
        plys = glob.glob(osp.join(pd, "*.ply"))
        names = {osp.basename(p) for p in plys}
        assert {"ref_points.ply", "src_points.ply"} <= names
        assert names & {"correspondences_correct.ply", "correspondences_wrong.ply"}
        # vote + grouping exports (reference model.py:224-231, :275-276)
        for side in ("ref", "src"):
            assert {f"{side}_vote_offsets.ply", f"{side}_shifted_nodes.ply",
                    f"{side}_grouping.ply"} <= names, (pd, names)
        with open(plys[0]) as f:
            assert f.readline().strip() == "ply"
        # the interactive HTML viewer rides the same vis export
        viewer = osp.join(pd, "viewer.html")
        assert osp.exists(viewer)
        html = open(viewer).read()
        assert html.startswith("<!DOCTYPE html>") and "NMS survivors" in html


@pytest.mark.slow
def test_eval_loop_multi_bucket_dispatch(tmp_path):
    """run_eval_loop(cfgs=[small, large]): each pair runs at the smallest
    capacity bucket that fits (one compiled program per bucket), and both
    bucket paths produce finite metrics and consumable dumps."""
    from rdmnet_tpu.cli.common import build_model_and_params
    from rdmnet_tpu.cli.test import run_eval_loop
    from rdmnet_tpu.config import make_tiny_cfg
    from rdmnet_tpu.utils.se3_np import euler_zyx_matrix

    cfg = make_tiny_cfg()
    small = cfg.replace(pyramid=cfg.pyramid.scaled(0.5))
    model, params = build_model_and_params(cfg)

    rng = np.random.RandomState(3)
    tf = np.eye(4, dtype=np.float32)
    tf[:3, :3] = euler_zyx_matrix(0.1, 0.05, -0.04).astype(np.float32)
    tf[:3, 3] = [0.5, -0.3, 0.2]

    def make_item(n, i):
        ref = (rng.rand(n, 3) * 20).astype(np.float32)
        src = ((ref - tf[:3, 3]) @ tf[:3, :3]).astype(np.float32)
        return {"seq_id": 0, "ref_frame": i, "src_frame": i + 1,
                "ref_points": ref, "src_points": src, "transform": tf}

    # 200 pts fits the 0.5x bucket (cap 256); 500 pts needs the full 512
    dataset = [make_item(200, 0), make_item(500, 2)]
    feature_dir = str(tmp_path / "features")
    import os
    os.makedirs(feature_dir)
    lines = []
    board = run_eval_loop(
        cfg, model, params, dataset, [0, 1], feature_dir,
        compress=False, log=lines.append, cfgs=[small, cfg],
    )
    assert "cap 256" in lines[0] and "cap 512" in lines[1], lines
    assert "RR" in board.format()
    import glob
    assert len(glob.glob(osp.join(feature_dir, "*.npz"))) == 2


@pytest.mark.parametrize("layout", ["kitti360", "apollo", "mulran"])
def test_eval_layout_generator(tmp_path, layout):
    """--layout synthesizes the evaluation-only schemas (test split only,
    exact path/GT formats incl. MulRan's string seqs and xyz-only clouds)."""
    rng = np.random.RandomState(2)
    scan = tmp_path / "scan.npy"
    np.save(scan, (rng.rand(1500, 4) * 40).astype(np.float32))
    root = tmp_path / f"root_{layout}"
    subprocess.run(
        [sys.executable, SCRIPT, "--out", str(root), "--layout", layout,
         "--test_frames", "3", "--scan", str(scan)],
        check=True,
    )
    ds = RegistrationPairDataset(layout, str(root), "test",
                                 use_augmentation=False)
    assert len(ds) == 2
    for i in range(len(ds)):
        item = ds[i]
        err = np.abs(
            apply_transform(item["src_points"], item["transform"])
            - item["ref_points"]
        ).max()
        assert err < 0.12, (layout, i, err)
    if layout == "mulran":
        # MulRan clouds ship without intensity; loader reads xyz only
        seq = ds.metadata[0]["seq_id"]
        cloud = np.load(str(root / "downsampled_xyzi" / seq / "0.npy"))
        assert cloud.shape[1] == 3


def test_multi_scan_generator(tmp_path):
    """Multiple --scan bases map to one train/test sequence each with
    held-out motions per split."""
    rng = np.random.RandomState(1)
    scans = []
    for i in range(2):
        p = tmp_path / f"scan{i}.npy"
        np.save(p, (rng.rand(1500, 4) * 40).astype(np.float32))
        scans.append(str(p))
    root = tmp_path / "root"
    subprocess.run(
        [sys.executable, SCRIPT, "--out", str(root), "--frames", "3",
         "--test_frames", "2", "--scan"] + scans,
        check=True,
    )
    for subset, n_pairs in (("train", 4), ("val", 4), ("test", 2)):
        ds = RegistrationPairDataset("kitti", str(root), subset,
                                     use_augmentation=False)
        assert len(ds) == n_pairs, subset
        for i in range(len(ds)):
            item = ds[i]
            err = np.abs(
                apply_transform(item["src_points"], item["transform"])
                - item["ref_points"]
            ).max()
            assert err < 0.12, (subset, i, err)
