"""Data pipeline tests: GT parsing, augmentation, loader batching, calibration."""

import os
import os.path as osp

import time

import numpy as np
import pytest

from rdmnet_tpu.config import PyramidConfig
from rdmnet_tpu.data.calibration import calibrate_neighbor_limits
from rdmnet_tpu.data.datasets import RegistrationPairDataset, load_gt_pairs, make_dataset
from rdmnet_tpu.data.loader import PairLoader
from rdmnet_tpu.utils.se3_np import (
    apply_transform,
    augment_point_cloud_pair,
    inverse_transform,
)


@pytest.fixture
def kitti_root(tmp_path, rng):
    """Synthetic KITTI-layout dataset with 6 pairs in seq 0 (train split)."""
    root = tmp_path / "kitti"
    (root / "icp10").mkdir(parents=True)
    (root / "downsampled_xyzi" / "00").mkdir(parents=True)
    lines = []
    for i in range(6):
        tf = np.eye(3, 4)
        lines.append(f"{i + 1} {i} " + " ".join(str(v) for v in tf.reshape(-1)))
        pts = (rng.rand(300, 4) * 10).astype(np.float32)
        np.save(root / "downsampled_xyzi" / "00" / f"{i:06d}.npy", pts)
    np.save(root / "downsampled_xyzi" / "00" / f"{6:06d}.npy",
            (rng.rand(300, 4) * 10).astype(np.float32))
    (root / "icp10" / "00").write_text("\n".join(lines))
    for seq in range(1, 6):
        (root / "icp10" / f"{seq:02d}").write_text("")
    return str(root)


class TestDatasets:
    def test_gt_parsing(self, kitti_root):
        pairs = load_gt_pairs(osp.join(kitti_root, "icp10/00"), 0)
        assert len(pairs) == 6
        assert pairs[0]["frame0"] == 0 and pairs[0]["frame1"] == 1
        assert pairs[0]["transform"].shape == (4, 4)
        assert pairs[0]["transform"][3, 3] == 1.0

    def test_dataset_getitem(self, kitti_root):
        ds = RegistrationPairDataset("kitti", kitti_root, "train", point_limit=100)
        item = ds[0]
        assert item["ref_points"].shape == (100, 3)
        assert item["src_points"].shape == (100, 3)
        assert item["transform"].shape == (4, 4)

    def test_infer_split_uses_demo_assets(self):
        ds = RegistrationPairDataset(
            "kitti", "/nonexistent", "infer",
            demo_asset_dir="/root/reference/assets/pc",
        )
        if not os.path.exists("/root/reference/assets/pc/000000.npy"):
            pytest.skip("demo assets unavailable")
        item = ds[0]
        assert item["ref_points"].shape[1] == 3
        assert len(item["ref_points"]) > 10000


def _make_synthetic_root(tmp_path, rng, dataset):
    """A minimal on-disk dataset in the given schema's exact layout
    (paths/filename formats/split seq ids from SCHEMAS)."""
    from rdmnet_tpu.data.datasets import SCHEMAS

    schema = SCHEMAS[dataset]
    seq = (schema.test_seqs or schema.train_seqs)[0]
    root = tmp_path / dataset
    gt_path = root / schema.gt_file.format(seq=seq)
    gt_path.parent.mkdir(parents=True, exist_ok=True)
    lines = []
    for i in range(3):
        tf = np.eye(3, 4)
        tf[:, 3] = [0.5 * i, 0.0, 0.0]
        lines.append(f"{i + 1} {i} " + " ".join(str(v) for v in tf.reshape(-1)))
        cloud = root / schema.cloud_path.format(seq=seq, frame=i)
        cloud.parent.mkdir(parents=True, exist_ok=True)
        np.save(cloud, (rng.rand(250, 4) * 10).astype(np.float32))
    np.save(root / schema.cloud_path.format(seq=seq, frame=3),
            (rng.rand(250, 4) * 10).astype(np.float32))
    gt_path.write_text("\n".join(lines))
    # empty GT files for the remaining seqs of the subset
    for s in (schema.test_seqs or schema.train_seqs)[1:]:
        p = root / schema.gt_file.format(seq=s)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("")
    return str(root), seq


class TestAllDatasetSchemas:
    """End-to-end loading for every supported dataset layout — exercises
    the exact path formats, GT parsing and item assembly per schema, not
    just the KITTI one (reference has four near-identical Dataset classes;
    ours is one parameterized class, so each schema needs its own drive)."""

    @pytest.mark.parametrize("dataset", ["kitti", "kitti360", "apollo", "mulran"])
    def test_load_and_getitem(self, tmp_path, rng, dataset):
        root, seq = _make_synthetic_root(tmp_path, rng, dataset)
        ds = RegistrationPairDataset(dataset, root, "test", point_limit=200)
        assert len(ds) == 3
        item = ds[1]
        assert item["ref_points"].shape == (200, 3)
        assert item["src_points"].shape == (200, 3)
        assert item["transform"].shape == (4, 4)
        np.testing.assert_allclose(item["transform"][0, 3], 0.5, atol=1e-6)
        assert item["seq_id"] == seq


class TestAugmentation:
    def test_transform_recomposition_consistent(self, rng):
        """After augmentation, transform must still map src onto ref."""
        src = rng.rand(200, 3).astype(np.float32) * 10
        tf = np.eye(4, dtype=np.float32)
        tf[:3, 3] = [1.0, -2.0, 0.5]
        ref = apply_transform(src, tf).astype(np.float32)
        aug_ref, aug_src, aug_tf = augment_point_cloud_pair(
            rng, ref, src, tf, noise=0.0, min_scale=1.0, max_scale=1.0, shift=1.0
        )
        realigned = apply_transform(aug_src, aug_tf)
        np.testing.assert_allclose(realigned, aug_ref, atol=1e-4)

    def test_scale_changes_extent(self, rng):
        src = rng.rand(100, 3).astype(np.float32)
        ref = src.copy()
        tf = np.eye(4, dtype=np.float32)
        aug_ref, aug_src, aug_tf = augment_point_cloud_pair(
            rng, ref, src, tf, noise=0.0, min_scale=2.0, max_scale=2.0, shift=0.0
        )
        realigned = apply_transform(aug_src, aug_tf)
        np.testing.assert_allclose(realigned, aug_ref, atol=1e-4)


class TestLoader:
    def test_batching_and_padding(self, kitti_root):
        ds = RegistrationPairDataset("kitti", kitti_root, "train", point_limit=200)
        loader = PairLoader(ds, cap=256, batch_size=2, prefetch=0)
        batches = list(loader)
        assert len(batches) == 3
        b = batches[0]
        assert b["ref_points"].shape == (2, 256, 3)
        assert b["ref_counts"].tolist() == [200, 200]
        assert (b["ref_points"][0, 200:] > 1e8).all()

    def test_host_sharding_partitions(self, kitti_root):
        ds = RegistrationPairDataset("kitti", kitti_root, "train")
        l0 = PairLoader(ds, cap=256, batch_size=1, num_hosts=2, host_id=0, prefetch=0)
        l1 = PairLoader(ds, cap=256, batch_size=1, num_hosts=2, host_id=1, prefetch=0)
        f0 = [b["metadata"][0]["src_frame"] for b in l0]
        f1 = [b["metadata"][0]["src_frame"] for b in l1]
        assert set(f0).isdisjoint(set(f1))
        assert len(f0) + len(f1) == 6

    def test_host_sharding_pads_to_equal_counts(self, kitti_root):
        """With hosts not dividing the dataset, every host must still yield
        the SAME number of batches (padded like DistributedSampler) — an
        unequal split would deadlock cross-host collectives."""
        ds = RegistrationPairDataset("kitti", kitti_root, "train")  # 6 pairs
        loaders = [
            PairLoader(ds, cap=256, batch_size=1, num_hosts=4, host_id=h, prefetch=0)
            for h in range(4)
        ]
        counts = [len(list(l)) for l in loaders]
        assert len(set(counts)) == 1, counts
        assert counts[0] == len(loaders[0])

    def test_ragged_tail_marks_batch_valid(self, kitti_root):
        ds = RegistrationPairDataset("kitti", kitti_root, "train")  # 6 pairs
        loader = PairLoader(ds, cap=256, batch_size=4, prefetch=0)
        batches = list(loader)
        assert batches[0]["batch_valid"].tolist() == [True] * 4
        # 6 % 4 = 2 real items in the tail batch; repeats flagged invalid
        assert batches[-1]["batch_valid"].tolist() == [True, True, False, False]

    def test_prefetch_propagates_worker_errors(self, kitti_root):
        class Boom(RegistrationPairDataset):
            def __getitem__(self, i):
                if i >= 2:
                    raise RuntimeError("corrupt scan")
                return super().__getitem__(i)

        ds = Boom("kitti", kitti_root, "train")
        loader = PairLoader(ds, cap=256, batch_size=1, prefetch=2)
        with pytest.raises(RuntimeError, match="corrupt scan"):
            list(loader)

    def test_prefetch_matches_sync(self, kitti_root):
        ds = RegistrationPairDataset("kitti", kitti_root, "train")
        sync = list(PairLoader(ds, cap=256, batch_size=2, prefetch=0))
        pre = list(PairLoader(ds, cap=256, batch_size=2, prefetch=2))
        assert len(sync) == len(pre)
        np.testing.assert_array_equal(sync[0]["ref_points"], pre[0]["ref_points"])

    def test_prefetch_worker_released_on_abandon(self, kitti_root):
        """Breaking out of a prefetching iterator must release the worker
        thread (it would otherwise block forever on the full queue,
        pinning prefetch+1 batches per abandoned epoch)."""
        import threading

        ds = RegistrationPairDataset("kitti", kitti_root, "train")
        loader = PairLoader(ds, cap=256, batch_size=1, prefetch=1)
        before = threading.active_count()
        it = iter(loader)
        next(it)
        it.close()  # abandon mid-epoch (GeneratorExit -> finally -> stop)
        deadline = time.time() + 5.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before

    def test_iter_from_skips_at_index_level(self, kitti_root):
        ds = RegistrationPairDataset("kitti", kitti_root, "train")
        full = list(PairLoader(ds, cap=256, batch_size=1, prefetch=0))
        tail = list(PairLoader(ds, cap=256, batch_size=1, prefetch=0).iter_from(4))
        assert len(tail) == len(full) - 4
        np.testing.assert_array_equal(
            full[4]["ref_points"], tail[0]["ref_points"]
        )

    def test_cycle_loader_resume_continues_stream(self, kitti_root):
        """A resumed CycleLoader must continue the SAME shuffled stream the
        fresh run would have produced, not replay the prefix (reference
        DDP runs restart data identically; preempted iteration runs here
        fast-forward instead)."""
        from rdmnet_tpu.engine.iter_trainer import CycleLoader

        def frames(stream, n):
            out = []
            for _, b in zip(range(n), stream):
                out.append((b["metadata"][0]["seq_id"], b["metadata"][0]["src_frame"]))
            return out

        def make():
            ds = RegistrationPairDataset("kitti", kitti_root, "train")  # 6 pairs
            return PairLoader(ds, cap=256, batch_size=1, shuffle=True, prefetch=0)

        fresh = frames(iter(CycleLoader(make())), 15)
        resumed = frames(iter(CycleLoader(make(), start_iteration=9)), 6)
        assert resumed == fresh[9:15]
        # and the shuffle is not degenerate: passes differ
        assert fresh[0:6] != fresh[6:12]


class TestCalibration:
    def test_limits_reasonable(self, rng):
        clouds = [(rng.rand(500, 3) * 10).astype(np.float32) for _ in range(2)]
        spec = PyramidConfig(
            num_stages=3, voxel_size=0.5, search_radius=1.0,
            caps=(512, 256, 128), neighbor_limits=(16, 16, 16),
        )
        limits = calibrate_neighbor_limits(clouds, spec, sample_threshold=100)
        assert len(limits) == 3
        assert all(1 <= l <= 512 for l in limits)

    @pytest.mark.slow  # full-scale banded search compile on the real scan
    def test_band_caps_cover_real_scan(self, demo_pair):
        """Calibrated band caps must let the banded search run the real
        scan without band overflow (dropped stays zero)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from rdmnet_tpu.config import make_cfg
        from rdmnet_tpu.data.calibration import calibrate_band_caps
        from rdmnet_tpu.graph.pyramid import build_cloud_pyramid, pad_cloud

        ref, src = demo_pair
        spec = make_cfg().pyramid.scaled(0.7)
        bands = calibrate_band_caps([ref, src], spec)
        assert len(bands) == spec.num_stages
        # fine levels must actually be banded (cheaper than full search)
        assert bands[0] is not None and bands[0] < spec.caps[0]
        spec2 = dataclasses.replace(spec, band_caps=bands)
        rp, rc = pad_cloud(jnp.asarray(ref), spec2.caps[0])
        pyr = jax.jit(lambda p, c: build_cloud_pyramid(p, c, spec2))(rp, rc)
        assert int(jnp.sum(pyr.dropped)) == 0
