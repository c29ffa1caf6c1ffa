"""End-to-end offline-eval round trip: model outputs -> trim -> npz -> eval CLI."""

import os.path as osp
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdmnet_tpu.config import make_tiny_cfg
from rdmnet_tpu.cli.common import trim_outputs
from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud
from rdmnet_tpu.models import RDMNet
from rdmnet_tpu.ops.geometry import apply_transform
from tests.test_ops_core import random_transform

# full-model compiles: minutes on CPU -> excluded from the default fast run
pytestmark = pytest.mark.slow


class TestEvalRoundTrip:
    def test_trim_and_offline_eval(self, tmp_path, rng):
        cfg = make_tiny_cfg()
        tf = random_transform(rng, max_angle=0.2, max_trans=0.5)
        src = (rng.rand(400, 3) * 20).astype(np.float32)
        ref = np.asarray(apply_transform(jnp.asarray(src), jnp.asarray(tf)))
        rp, rc = pad_cloud(jnp.asarray(ref), 512)
        sp, sc = pad_cloud(jnp.asarray(src), 512)
        batch = build_pair_batch(rp, rc, sp, sc, jnp.asarray(tf), cfg.pyramid)
        model = RDMNet(cfg)
        params = model.init(jax.random.PRNGKey(0), batch, training=False, with_gt=True)
        out = model.apply(params, batch, training=False, with_gt=True)

        dumped = trim_outputs(out, tf)
        # schema: reference test.py:70-98 keys present, shapes dynamic
        for key in [
            "ref_points_c", "src_points_c", "ref_feats_c", "src_feats_c",
            "ref_node_corr_indices", "src_node_corr_indices",
            "ref_corr_points", "src_corr_points", "corr_scores",
            "gt_node_corr_indices", "gt_node_corr_overlaps",
            "estimated_transform", "transform",
        ]:
            assert key in dumped, key
        nc = len(dumped["ref_points_c"])
        assert dumped["ref_node_corr_indices"].max() < nc
        assert dumped["gt_node_corr_indices"][:, 0].max() < nc
        assert len(dumped["ref_corr_points"]) == len(dumped["corr_scores"])

        np.savez_compressed(tmp_path / "0_1_0.npz", **dumped)

        # offline eval CLI over the dump (lgr + svd)
        for method in ["lgr", "svd"]:
            res = subprocess.run(
                [sys.executable, "-m", "rdmnet_tpu.cli.eval",
                 "--feature_dir", str(tmp_path), "--method", method,
                 "--json_out", str(tmp_path / f"summary_{method}.json")],
                capture_output=True, text=True,
                env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
            )
            assert res.returncode == 0, res.stderr[-2000:]
            assert "== eval" in res.stdout
            assert "RR:" in res.stdout

        # --json_out summary is the machine-readable surface recipe band
        # checks consume (scripts/check_eval_bands.py, VERDICT r4 #8)
        import json

        with open(tmp_path / "summary_lgr.json") as f:
            s = json.load(f)
        assert s["n_pairs"] == 1 and 0.0 <= s["RR"] <= 1.0
        assert len(s["per_pair"]) == 1 and "rre" in s["per_pair"][0]

        # band checker: passes on loose bands, fails (exit 1) on impossible
        check = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                         "scripts", "check_eval_bands.py")
        res = subprocess.run(
            [sys.executable, check, str(tmp_path / "summary_lgr.json"),
             "--rr_min", "0.0", "--rre_max", "inf", "--rte_max", "inf"],
            capture_output=True, text=True,
        )
        assert res.returncode == 0, res.stdout + res.stderr
        res = subprocess.run(
            [sys.executable, check, str(tmp_path / "summary_lgr.json"),
             "--rr_min", "0.0", "--rre_max", "-1", "--rte_max", "1000"],
            capture_output=True, text=True,
        )
        assert res.returncode == 1 and "violated" in res.stdout

