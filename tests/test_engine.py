"""Engine integration: trainer epoch loop, orbax snapshot round trip, resume."""

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdmnet_tpu.config import make_tiny_cfg
from rdmnet_tpu.data.datasets import RegistrationPairDataset
from rdmnet_tpu.data.loader import PairLoader
from rdmnet_tpu.engine.checkpoint import CheckpointManager
from rdmnet_tpu.engine.trainer import Trainer
from rdmnet_tpu.engine.train_step import create_train_state
from tests.test_train import make_batch

# full-model compiles: minutes on CPU -> excluded from the default fast run
pytestmark = pytest.mark.slow


@pytest.fixture
def tiny_kitti(tmp_path, rng):
    """Synthetic KITTI layout: 3 train pairs + 1 val pair, small clouds."""
    root = tmp_path / "kitti"
    (root / "icp10").mkdir(parents=True)
    (root / "downsampled_xyzi" / "00").mkdir(parents=True)
    (root / "downsampled_xyzi" / "06").mkdir(parents=True)
    tf = np.eye(3, 4).reshape(-1)
    line = lambda i: f"{i + 1} {i} " + " ".join(str(v) for v in tf)
    (root / "icp10" / "00").write_text("\n".join(line(i) for i in range(3)))
    for seq in range(1, 6):
        (root / "icp10" / f"{seq:02d}").write_text("")
    (root / "icp10" / "06").write_text(line(0))
    (root / "icp10" / "07").write_text("")
    for seq, n in [("00", 4), ("06", 2)]:
        for i in range(n):
            pts = (rng.rand(300, 4) * 15).astype(np.float32)
            np.save(root / "downsampled_xyzi" / seq / f"{i:06d}.npy", pts)
    return str(root)


class TestCheckpointRoundTrip:
    def test_save_restore(self, tmp_path, rng):
        cfg = make_tiny_cfg()
        batch = make_batch(cfg, None, bsz=1)
        single = jax.tree.map(lambda x: x[0], batch)
        state = create_train_state(cfg, jax.random.PRNGKey(0), single, steps_per_epoch=5)
        mgr = CheckpointManager(str(tmp_path / "snap"))
        mgr.save(3, jax.device_get(state), metadata={"epoch": 3})
        assert mgr.latest_step() == 3
        restored, meta = mgr.restore(state)
        assert meta["epoch"] == 3
        a = jax.tree.leaves(state.params)
        b = jax.tree.leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        mgr.close()

    def test_restore_params_across_optimizer_structures(self, tmp_path):
        """Warm starts (--init_from) restore params template-free: a
        snapshot saved WITHOUT grad accumulation must load into a run whose
        optimizer tree differs (optax.MultiSteps wrapper from --grad_acc)."""
        import dataclasses

        cfg = make_tiny_cfg()
        batch = make_batch(cfg, None, bsz=1)
        single = jax.tree.map(lambda x: x[0], batch)
        state = create_train_state(cfg, jax.random.PRNGKey(0), single, steps_per_epoch=5)
        mgr = CheckpointManager(str(tmp_path / "snap"))
        mgr.save(1, jax.device_get(state), metadata={"epoch": 1})

        acc_cfg = cfg.replace(
            optim=dataclasses.replace(cfg.optim, grad_acc_steps=4))
        state2 = create_train_state(
            acc_cfg, jax.random.PRNGKey(9), single, steps_per_epoch=5)
        params = CheckpointManager(str(tmp_path / "snap")).restore_params()
        state2 = state2.replace(params=params)
        a = jax.tree.leaves(state.params)
        b = jax.tree.leaves(state2.params)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        mgr.close()

        # the reverse direction is the eval path: a snapshot saved WITH the
        # MultiSteps opt_state (grad_acc training) must load through
        # build_model_and_params, which never builds an optimizer — a
        # template-full restore here rejected grad_acc-4 run snapshots
        from rdmnet_tpu.cli.common import build_model_and_params

        mgr2 = CheckpointManager(str(tmp_path / "snap_acc"))
        mgr2.save(2, jax.device_get(state2), metadata={"epoch": 2})
        mgr2.wait_until_finished()
        _, params3 = build_model_and_params(cfg, snapshot_dir=str(tmp_path / "snap_acc"))
        c = jax.tree.leaves(params3)
        assert len(a) == len(c)
        for x, y in zip(a, c):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        mgr2.close()


class TestCheckpointReshard:
    def test_save_dp2_resume_dp4_and_dp1(self, tmp_path):
        """A snapshot saved under one mesh must resume under another:
        orbax's StandardRestore takes the TARGET sharding from the template
        arrays, so a dp=2-replicated run's snapshot restores onto a dp=4
        mesh (and onto a single device) with identical values — the
        elastic-restart contract the reference's torch DDP snapshots lack
        (reference base_trainer.py:113-179 pins world size implicitly)."""
        from rdmnet_tpu.engine.train_step import make_train_step
        from rdmnet_tpu.parallel import make_mesh, replicate_to_mesh, shard_batch

        assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
        cfg = make_tiny_cfg()
        batch = make_batch(cfg, None, bsz=4, n=250)
        single = jax.tree.map(lambda x: x[0], batch)
        state = create_train_state(
            cfg, jax.random.PRNGKey(0), single, steps_per_epoch=5, dp_size=2
        )

        mesh2 = make_mesh(2)
        with mesh2:
            state2 = replicate_to_mesh(state, mesh2)
        mgr = CheckpointManager(str(tmp_path / "snap"))
        mgr.save(1, state2, metadata={"epoch": 1, "dp": 2})
        mgr.wait_until_finished()

        # resume under dp=4: template carries the dp=4 shardings
        mesh4 = make_mesh(4)
        with mesh4:
            template4 = replicate_to_mesh(state, mesh4)
        restored4, meta = mgr.restore(template4)
        assert meta["dp"] == 2
        for want, got in zip(jax.tree.leaves(state.params),
                             jax.tree.leaves(restored4.params)):
            assert got.sharding.mesh.devices.size == 4
            np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

        # ... and the restored state must actually TRAIN under the new mesh
        step = make_train_step(cfg)
        with mesh4:
            new_state, metrics = step(
                restored4, shard_batch(batch, mesh4), jax.random.PRNGKey(1)
            )
        assert np.isfinite(float(metrics["loss"]))

        # resume under dp=1 (plain single-device template)
        restored1, _ = mgr.restore(jax.device_get(state))
        for want, got in zip(jax.tree.leaves(state.params),
                             jax.tree.leaves(restored1.params)):
            np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
        mgr.close()


class TestTrainerLoop:
    def test_one_epoch_with_snapshot_and_resume(self, tiny_kitti, tmp_path):
        cfg = make_tiny_cfg().replace(
            optim=make_tiny_cfg().optim.__class__(max_epoch=1)
        )
        train_ds = RegistrationPairDataset("kitti", tiny_kitti, "train", point_limit=256)
        val_ds = RegistrationPairDataset("kitti", tiny_kitti, "val", point_limit=256)
        train_loader = PairLoader(train_ds, cap=cfg.pyramid.caps[0], batch_size=1, prefetch=0)
        val_loader = PairLoader(val_ds, cap=cfg.pyramid.caps[0], batch_size=1, prefetch=0)
        out_dir = str(tmp_path / "out")

        trainer = Trainer(cfg, train_loader, val_loader, output_dir=out_dir, log_steps=1)
        trainer.run()
        assert trainer.epoch == 1
        assert trainer.snapshots.latest_step() == 1
        # the val pass produced RR/RRE/RTE, so epoch 1 must be the best
        assert trainer.best_snapshots.latest_step() == 1
        best_meta = trainer.best_snapshots.read_metadata()
        assert best_meta["epoch"] == 1 and "RR" in best_meta
        assert osp.exists(osp.join(out_dir, "metrics.jsonl"))
        lines = open(osp.join(out_dir, "metrics.jsonl")).read().strip().splitlines()
        assert any('"phase": "train"' in l for l in lines)
        assert any('"phase": "val"' in l for l in lines)

        # resume picks up epoch 1 -> run() is a no-op at max_epoch=1; the
        # best score must survive the resume so a worse later epoch cannot
        # displace the stored best snapshot
        trainer2 = Trainer(cfg, train_loader, val_loader, output_dir=out_dir, log_steps=1)
        trainer2.run(resume=True)
        assert trainer2.epoch == 1
        assert trainer2._best_score is not None
        trainer2._maybe_save_best({"RR": 0.0, "RRE": 999.0, "RTE": 999.0})
        assert trainer2.best_snapshots.read_metadata()["epoch"] == 1

    def test_one_epoch_dp2_mesh(self, tiny_kitti, tmp_path):
        """Full Trainer loop on a dp=2 mesh (virtual CPU devices): sharded
        batch assembly, replicated params, psum'd grads, validation and
        snapshots — the integration path over the grad-parity unit test
        (test_parallel.py)."""
        import dataclasses

        base = make_tiny_cfg()
        cfg = base.replace(
            optim=dataclasses.replace(base.optim, max_epoch=1),
            parallel=dataclasses.replace(base.parallel, dp=2),
        )
        train_ds = RegistrationPairDataset("kitti", tiny_kitti, "train", point_limit=256)
        val_ds = RegistrationPairDataset("kitti", tiny_kitti, "val", point_limit=256)
        train_loader = PairLoader(train_ds, cap=cfg.pyramid.caps[0], batch_size=2, prefetch=0)
        val_loader = PairLoader(val_ds, cap=cfg.pyramid.caps[0], batch_size=2, prefetch=0)
        out_dir = str(tmp_path / "out_dp2")

        trainer = Trainer(cfg, train_loader, val_loader, output_dir=out_dir, log_steps=1)
        assert trainer.mesh is not None and trainer.mesh.devices.size == 2
        trainer.run()
        assert trainer.epoch == 1
        assert trainer.snapshots.latest_step() == 1
        lines = open(osp.join(out_dir, "metrics.jsonl")).read().strip().splitlines()
        import json
        train_rec = next(json.loads(l) for l in lines if '"phase": "train"' in l)
        assert np.isfinite(train_rec["loss"])

    def test_val_score_ordering(self):
        s = Trainer._val_score
        assert s({"IR": 0.5}) is None
        # higher RR wins; at equal RR lower RRE wins; then lower RTE
        assert s({"RR": 1.0, "RRE": 5.0, "RTE": 9.0}) > s({"RR": 0.5, "RRE": 0.1, "RTE": 0.1})
        assert s({"RR": 1.0, "RRE": 0.2, "RTE": 9.0}) > s({"RR": 1.0, "RRE": 0.4, "RTE": 1.0})
        assert s({"RR": 1.0, "RRE": 0.2, "RTE": 1.0}) > s({"RR": 1.0, "RRE": 0.2, "RTE": 2.0})


class TestLrScheduleGradAcc:
    def test_transition_in_applied_steps(self):
        """The decay boundary must be expressed in APPLIED (macro) updates:
        optax.MultiSteps advances the inner schedule only when it emits, so
        micro-step transition_steps would decay grad_acc_steps x too slowly
        vs the reference's per-epoch StepLR (trainval.py:36)."""
        import dataclasses

        from rdmnet_tpu.config import make_tiny_cfg
        from rdmnet_tpu.engine.train_step import create_optimizer

        cfg = make_tiny_cfg()
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, grad_acc_steps=4)
        )
        steps_per_epoch = 8  # -> 2 applied updates/epoch
        _, schedule = create_optimizer(cfg, steps_per_epoch)
        applied_per_epoch = steps_per_epoch // 4
        boundary = cfg.optim.lr_decay_steps * applied_per_epoch
        lr0 = float(schedule(0))
        assert float(schedule(boundary - 1)) == lr0
        assert float(schedule(boundary)) == pytest.approx(
            lr0 * cfg.optim.lr_decay, rel=1e-6
        )


class TestWarmupCosineSchedule:
    def test_matches_reference_lambdalr_trace(self):
        """optim.scheduler='warmup_cosine' must reproduce the lr the
        reference's LambdaLR(WarmUpCosineAnnealingFunction) applies at every
        update, including the constructor-step offset (torch evaluates the
        factor at last_epoch+1, so update i uses step i+1) and the
        //grad_acc_steps division of both step counts
        (reference geotransformer/utils/torch.py:153-178)."""
        import dataclasses
        import sys

        import pytest as _pytest

        torch = _pytest.importorskip("torch")
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        try:
            from geotransformer.utils.torch import WarmUpCosineAnnealingFunction
        except Exception as exc:  # pragma: no cover - reference absent
            _pytest.skip(f"reference unavailable: {exc}")

        from rdmnet_tpu.config import make_tiny_cfg
        from rdmnet_tpu.engine.train_step import create_optimizer

        grad_acc, steps_per_epoch, max_epoch, warmup = 2, 8, 5, 6
        cfg = make_tiny_cfg()
        cfg = dataclasses.replace(
            cfg,
            optim=dataclasses.replace(
                cfg.optim,
                scheduler="warmup_cosine",
                grad_acc_steps=grad_acc,
                max_epoch=max_epoch,
                warmup_steps=warmup,
            ),
        )
        _, schedule = create_optimizer(cfg, steps_per_epoch)

        applied_per_epoch = steps_per_epoch // grad_acc
        total = max_epoch * applied_per_epoch
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=cfg.optim.lr)
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt,
            WarmUpCosineAnnealingFunction(
                total, warmup // grad_acc, eta_init=cfg.optim.eta_init,
                eta_min=cfg.optim.eta_min,
            ),
        )
        for count in range(total + 4):
            ref_lr = opt.param_groups[0]["lr"]
            assert float(schedule(count)) == pytest.approx(ref_lr, rel=1e-6), count
            opt.step()
            sched.step()

    def test_unknown_scheduler_rejected(self):
        import dataclasses

        from rdmnet_tpu.config import make_tiny_cfg
        from rdmnet_tpu.engine.train_step import create_optimizer

        cfg = make_tiny_cfg()
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, scheduler="nope")
        )
        with pytest.raises(ValueError, match="scheduler"):
            create_optimizer(cfg, 8)
