"""Tests for the trajectory/recall figure utilities (numpy-only fast tests;
reference semantics: eval_pose_visualization_offline.py:83-224)."""

import numpy as np
import pytest

from rdmnet_tpu.utils.eval_figures import (
    absolute_trajectory_error,
    compose_trajectory,
    plot_recall_curves,
    plot_trajectories,
    recall_vs_threshold,
    sequence_trajectory_report,
    umeyama_alignment,
)
from tests.test_ops_core import random_transform


class TestUmeyama:
    def test_recovers_rigid_transform(self, rng):
        tf = random_transform(rng, max_angle=1.0, max_trans=5.0)
        x = rng.randn(3, 50) * 10
        y = tf[:3, :3] @ x + tf[:3, 3:4]
        r, t, c = umeyama_alignment(x, y)
        np.testing.assert_allclose(r, tf[:3, :3], atol=1e-6)
        np.testing.assert_allclose(t, tf[:3, 3], atol=1e-6)
        assert c == 1.0

    def test_with_scale(self, rng):
        x = rng.randn(3, 40)
        y = 2.5 * x + 1.0
        r, t, c = umeyama_alignment(x, y, with_scale=True)
        np.testing.assert_allclose(c, 2.5, rtol=1e-6)


class TestTrajectory:
    def _random_rel_poses(self, rng, n=20):
        return [random_transform(rng, max_angle=0.2, max_trans=3.0) for _ in range(n)]

    def test_compose_chains(self, rng):
        rels = self._random_rel_poses(rng, 5)
        traj = compose_trajectory(rels)
        assert traj.shape == (6, 4, 4)
        np.testing.assert_allclose(traj[0], np.eye(4))
        want = np.eye(4)
        for r in rels:
            want = want @ np.linalg.inv(r)
        np.testing.assert_allclose(traj[-1], want, atol=1e-5)

    def test_compose_recovers_known_vehicle_path(self, rng):
        """End-to-end direction check with REAL absolute poses: frame k at
        x = 4k m; rel_k = src->ref = frame k -> frame k+1 coordinates
        (the pair convention: src earlier, ref later). compose_trajectory
        must reproduce the x = 0, 4, 8, ... path — feeding identical
        est/gt can't catch a direction flip, a known pose grid can."""
        n = 5
        abs_poses = []
        for k in range(n + 1):
            a = np.eye(4)
            a[:3, 3] = [4.0 * k, 0.0, 0.0]
            abs_poses.append(a)
        rels = [
            np.linalg.inv(abs_poses[k + 1]) @ abs_poses[k] for k in range(n)
        ]
        traj = compose_trajectory(rels)
        for k in range(n + 1):
            np.testing.assert_allclose(traj[k], abs_poses[k], atol=1e-6)

    def test_ate_zero_for_exact_trajectory(self, rng):
        rels = self._random_rel_poses(rng)
        gt = compose_trajectory(rels)
        errors, aligned = absolute_trajectory_error(gt.copy(), gt)
        assert errors["ate_rmse_cm"] < 1e-3
        assert errors["rot_mean_deg"] < 1e-3

    def test_ate_detects_drift(self, rng):
        rels = self._random_rel_poses(rng)
        gt = compose_trajectory(rels)
        noisy_rels = [r.copy() for r in rels]
        for r in noisy_rels:
            r[:3, 3] += rng.randn(3) * 0.5
        est = compose_trajectory(noisy_rels)
        errors, _ = absolute_trajectory_error(est, gt)
        assert errors["ate_rmse_cm"] > 1.0


class TestRecallCurves:
    def test_monotone_in_threshold(self, rng):
        rre = np.abs(rng.randn(200)) * 2
        rte = np.abs(rng.randn(200)) * 0.8
        rre_grid = np.linspace(0.25, 5, 10)
        rte_grid = np.linspace(0.1, 2, 10)
        rr_rre, rr_rte = recall_vs_threshold(rre, rte, rre_grid, rte_grid, 5.0, 2.0)
        assert np.all(np.diff(rr_rre) >= 0)
        assert np.all(np.diff(rr_rte) >= 0)
        assert rr_rre[-1] == np.mean((rre < 5.0) & (rte < 2.0))


class TestFigureFiles:
    def test_writes_figures(self, tmp_path, rng):
        rels = [random_transform(rng, max_angle=0.1, max_trans=2.0) for _ in range(8)]
        gt = compose_trajectory(rels)
        plot_trajectories(str(tmp_path / "traj.png"), {"ours": gt}, gt)
        assert (tmp_path / "traj.png").stat().st_size > 0
        plot_recall_curves(
            str(tmp_path / "recall.png"),
            {"ours": (np.abs(rng.randn(50)), np.abs(rng.randn(50)))},
        )
        assert (tmp_path / "recall.png").stat().st_size > 0

    def test_published_overlay_and_comparison_figure(self, tmp_path, rng):
        """The bundled published results (utils/baselines.py) overlay the
        recall curves and render the method-comparison bars — the
        distributable stand-in for the reference's baseline-method plots
        (eval_visualization_for_basline_methods.py)."""
        from rdmnet_tpu.utils.baselines import PUBLISHED_RESULTS, published_for
        from rdmnet_tpu.utils.eval_figures import plot_method_comparison

        pub = published_for("kitti")
        # the table must carry the reference README rows + >=3 baselines
        assert "RDMNet (paper)" in pub and len(pub) >= 4
        assert pub["RDMNet (paper)"] == {"rr": 99.82, "rre_deg": 0.18,
                                         "rte_cm": 5.3}
        for ds in ("kitti360", "apollo", "mulran"):
            assert "RDMNet (paper)" in PUBLISHED_RESULTS[ds]
        assert published_for("nonexistent") == {}

        plot_recall_curves(
            str(tmp_path / "recall_pub.png"),
            {"ours": (np.abs(rng.randn(50)), np.abs(rng.randn(50)))},
            published=pub,
        )
        assert (tmp_path / "recall_pub.png").stat().st_size > 0
        rows = {"ours (lgr)": {"rr": 88.0, "rre_deg": 0.5, "rte_cm": 9.0}}
        rows.update(pub)
        plot_method_comparison(
            str(tmp_path / "cmp.png"), rows, highlight="ours (lgr)",
            title="kitti",
        )
        assert (tmp_path / "cmp.png").stat().st_size > 0

    def test_sequence_report(self, tmp_path, rng):
        rels = [random_transform(rng, max_angle=0.1, max_trans=2.0) for _ in range(6)]
        pairs = [
            {
                "seq_id": "8", "src_frame": i, "ref_frame": i + 1,
                "estimated_transform": rels[i], "gt_transform": rels[i],
            }
            for i in range(6)
        ]
        report = sequence_trajectory_report(pairs, str(tmp_path), method="lgr")
        assert "8" in report
        assert report["8"]["ate_rmse_cm"] < 1e-3
        assert (tmp_path / "traj_seq8_lgr.png").exists()


class TestTrainingCurves:
    def test_plot_from_metrics_jsonl(self, tmp_path):
        """scripts/plot_training.py: the TensorBoard-scalar stand-in renders
        one panel per metric per phase from a trainer metrics.jsonl."""
        import json
        import os.path as osp
        import sys

        root = osp.dirname(osp.dirname(osp.abspath(__file__)))
        sys.path.insert(0, osp.join(root, "scripts"))
        try:
            from plot_training import load_metrics, plot_phase
        finally:
            sys.path.pop(0)

        path = tmp_path / "metrics.jsonl"
        with open(path, "w") as f:
            for epoch in range(3):
                f.write(json.dumps({"phase": "train", "epoch": epoch,
                                    "loss": 10.0 / (epoch + 1),
                                    "grad_norm": 5.0}) + "\n")
                f.write(json.dumps({"phase": "val", "epoch": epoch,
                                    "RR": 0.2 * epoch, "RRE": 3.0}) + "\n")
        series = load_metrics(str(path))
        assert series["train"]["loss"][1][0] == 10.0
        assert series["val"]["RR"][0] == [0, 1, 2]
        for phase in ("train", "val"):
            out = tmp_path / f"{phase}.png"
            assert plot_phase(series, phase, str(out), logy_keys={"loss"})
            assert out.stat().st_size > 0


class TestHtmlViewer:
    def test_export_pair_html(self, tmp_path, rng):
        """Self-contained interactive viewer (the headless stand-in for the
        reference's o3d windows): valid standalone HTML embedding every
        layer — both clouds, green/red match lines split by correctness,
        extra node layers — with no external resources."""
        from rdmnet_tpu.utils.html_viewer import export_pair_html

        ref = rng.rand(500, 3).astype(np.float32) * 20
        src = ref + 0.01
        corr_r = ref[:40]
        corr_s = src[:40]
        ok = np.zeros(40, bool)
        ok[:25] = True
        path = export_pair_html(
            str(tmp_path / "v.html"), ref, src,
            corr_ref=corr_r, corr_src_aligned=corr_s, corr_correct=ok,
            extra_layers={"ref NMS survivors": ref[::50]},
            title="pair 8_0_1",
        )
        html = open(path).read()
        assert html.startswith("<!DOCTYPE html>")
        assert "pair 8_0_1" in html
        for name in ("ref (500)", "src aligned (500)", "correct matches (25)",
                     "wrong matches (15)", "ref NMS survivors (10)"):
            assert name in html, name
        # no external fetches: file must work offline from disk
        assert "http://" not in html and "https://" not in html
        # embedded layer data round-trips
        import base64, json, re
        layers = json.loads(re.search(r"const LAYERS = (\[.*?\]);\n", html,
                                      re.S).group(1))
        data = np.frombuffer(base64.b64decode(layers[0]["data"]), np.float32)
        np.testing.assert_allclose(data.reshape(-1, 3), ref, rtol=1e-6)
        seg = np.frombuffer(base64.b64decode(layers[2]["data"]),
                            np.float32).reshape(-1, 2, 3)
        assert len(seg) == 25  # correct matches as line segment pairs
