"""Loss parity: all 7 training loss terms vs the torch reference.

Feeds the reference's loss modules (experiments/loss.py:10-334) and ours
(rdmnet_tpu/losses) IDENTICAL synthetic model outputs in their respective
formats (the reference's compacted arrays vs our masked static arrays) and
pins every scalar. This covers the GT-label construction differences too:
the reference computes overlap labels with scipy cKDTree round-trips
(get_correspondences), ours with on-device masked distance ops — the labels
must agree for the scalars to match.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rdmnet_tpu.config import make_cfg  # noqa: E402
from rdmnet_tpu.losses.losses import (  # noqa: E402
    CoarseMatchingLoss,
    GapLoss,
    OverallLoss,
    OverlapLoss,
    SingleSideChamferLoss,
    VoteLoss,
)

try:
    import ref_oracle

    ref_oracle.load_reference()
    import importlib

    import sys

    sys.path.insert(0, "/root/reference/experiments")
    ref_loss = importlib.import_module("loss")
    HAVE_REF = True
except Exception:  # pragma: no cover - environment-dependent
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="torch reference unavailable")


def random_rigid(rng):
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    angle = rng.rand() * np.pi
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)
    tf = np.eye(4, dtype=np.float32)
    tf[:3, :3] = R
    tf[:3, 3] = rng.randn(3) * 2
    return tf


@pytest.fixture(scope="module")
def synth():
    """One synthetic 'model output' in both formats."""
    rng = np.random.RandomState(3)
    M, N = 40, 35            # coarse nodes
    MF, NF = 300, 280        # fine points
    P, K = 18, 8             # patches
    C = 16

    tf = random_rigid(rng)
    inv = np.linalg.inv(tf)

    ref_c = (rng.rand(M, 3) * 20).astype(np.float32)
    # src nodes: partially overlapping structure in the src frame
    src_c = np.empty((N, 3), np.float32)
    src_c[:20] = (ref_c[:20] + rng.randn(20, 3) * 0.1) @ inv[:3, :3].T + inv[:3, 3]
    src_c[20:] = ((rng.rand(N - 20, 3) * 20) @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    ref_f = (rng.rand(MF, 3) * 20).astype(np.float32)
    src_f = np.empty((NF, 3), np.float32)
    src_f[:150] = (ref_f[:150] + rng.randn(150, 3) * 0.2) @ inv[:3, :3].T + inv[:3, 3]
    src_f[150:] = ((rng.rand(NF - 150, 3) * 20) @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    shifted_ref = ref_c + rng.randn(M, 3).astype(np.float32) * 0.3
    shifted_src = src_c + rng.randn(N, 3).astype(np.float32) * 0.3

    feats_ref = rng.randn(M, C).astype(np.float32)
    feats_ref /= np.linalg.norm(feats_ref, axis=1, keepdims=True)
    feats_src = rng.randn(N, C).astype(np.float32)
    feats_src /= np.linalg.norm(feats_src, axis=1, keepdims=True)

    # sparse GT node correspondences with overlaps
    n_corr = 25
    corr = np.stack([
        rng.randint(0, M, n_corr), rng.randint(0, N, n_corr)
    ], axis=1)
    corr = np.unique(corr, axis=0)
    overlaps = (rng.rand(len(corr)) * 0.9 + 0.05).astype(np.float32)

    scores = rng.randn(P, K + 1, K + 1).astype(np.float32)
    knn_ref = (rng.rand(P, K, 3) * 20).astype(np.float32)
    knn_src = np.einsum("pkc,dc->pkd", (rng.rand(P, K, 3) * 20).astype(np.float32), inv[:3, :3]) + inv[:3, 3]
    knn_src = knn_src.astype(np.float32)
    # make some patch pairs genuinely matching so positive labels exist
    knn_src[: P // 2] = np.einsum(
        "pkc,dc->pkd", knn_ref[: P // 2] + rng.randn(P // 2, K, 3).astype(np.float32) * 0.1,
        inv[:3, :3],
    ) + inv[:3, 3]
    knn_ref_m = rng.rand(P, K) < 0.85
    knn_src_m = rng.rand(P, K) < 0.85
    knn_ref_m[:, 0] = True  # no fully-empty rows
    knn_src_m[:, 0] = True
    # engineer a pad-wins-argmin case in patch 0 (gap-loss label semantics):
    # ref slot 0 sits 0.1 m from the TRANSFORMED src pad (= t) while its
    # nearest VALID src point is 0.3 m away (also within positive_radius
    # 0.6) — the reference's raw argmin lands on the pad, so the row must
    # get the DUSTBIN label, not the nearby valid point.
    knn_src_m[0, K - 1] = False
    p0 = tf[:3, 3] + np.array([0.1, 0.0, 0.0], np.float32)
    knn_ref[0, 0] = p0
    knn_src[0, 0] = (p0 + np.array([0.3, 0.0, 0.0], np.float32)) @ inv[:3, :3].T + inv[:3, 3]
    # pipeline convention at masked entries: BOTH the reference and this
    # framework zero-fill the gathered patch points (reference
    # model.py:278-281 appends a zero row and gathers it at :323-328; ours
    # take_padded fill=0), so the transformed src pads land at t inside the
    # gap loss — load-bearing for its label semantics.
    knn_ref_zero = np.where(knn_ref_m[..., None], knn_ref, 0.0).astype(np.float32)
    knn_src_zero = np.where(knn_src_m[..., None], knn_src, 0.0).astype(np.float32)
    row_m = np.concatenate([knn_ref_m, np.ones((P, 1), bool)], axis=1)
    col_m = np.concatenate([knn_src_m, np.ones((P, 1), bool)], axis=1)
    scores = np.where(row_m[:, :, None] & col_m[:, None, :], scores, -1.0e12)

    n2p_ref = rng.rand(M).astype(np.float32) * 0.98 + 0.01
    n2p_src = rng.rand(N).astype(np.float32) * 0.98 + 0.01
    p2p_ref = rng.rand(MF).astype(np.float32) * 0.98 + 0.01
    p2p_src = rng.rand(NF).astype(np.float32) * 0.98 + 0.01
    n2n_ref = rng.rand(M).astype(np.float32) * 0.98 + 0.01
    n2n_src = rng.rand(N).astype(np.float32) * 0.98 + 0.01

    mask_mat = rng.rand(M, N) < 0.15

    return dict(
        tf=tf, ref_c=ref_c, src_c=src_c, ref_f=ref_f, src_f=src_f,
        shifted_ref=shifted_ref, shifted_src=shifted_src,
        feats_ref=feats_ref, feats_src=feats_src,
        corr=corr, overlaps=overlaps, scores=scores,
        knn_ref_zero=knn_ref_zero, knn_src_zero=knn_src_zero,
        knn_ref_m=knn_ref_m, knn_src_m=knn_src_m,
        n2p_ref=n2p_ref, n2p_src=n2p_src, p2p_ref=p2p_ref, p2p_src=p2p_src,
        n2n_ref=n2n_ref, n2n_src=n2n_src, mask_mat=mask_mat,
    )


@pytest.fixture(scope="module")
def ref_out(synth):
    """Reference-format output_dict / data_dict (torch tensors)."""
    t = lambda x: torch.from_numpy(np.asarray(x))
    out = {
        "ori_ref_points_c": t(synth["ref_c"]),
        "ori_src_points_c": t(synth["src_c"]),
        "ref_points_f": t(synth["ref_f"]),
        "src_points_f": t(synth["src_f"]),
        "shifted_ref_points_c": t(synth["shifted_ref"]),
        "shifted_src_points_c": t(synth["shifted_src"]),
        "ref_feats_c": t(synth["feats_ref"]),
        "src_feats_c": t(synth["feats_src"]),
        "gt_node_corr_indices": t(synth["corr"].astype(np.int64)),
        "gt_node_corr_overlaps": t(synth["overlaps"]),
        "matching_scores": t(synth["scores"]),
        "ref_node_corr_knn_points": t(synth["knn_ref_zero"]),
        "src_node_corr_knn_points": t(synth["knn_src_zero"]),
        "ref_node_corr_knn_masks": t(synth["knn_ref_m"]),
        "src_node_corr_knn_masks": t(synth["knn_src_m"]),
        "ref_n2p_scores_c": t(synth["n2p_ref"]),
        "src_n2p_scores_c": t(synth["n2p_src"]),
        "ref_p2p_scores_c": t(synth["p2p_ref"]),
        "src_p2p_scores_c": t(synth["p2p_src"]),
        "ref_n2n_scores_c": t(synth["n2n_ref"]),
        "src_n2n_scores_c": t(synth["n2n_src"]),
        "mask": t(synth["mask_mat"]),
    }
    data = {"transform": t(synth["tf"])}
    return out, data


@pytest.fixture(scope="module")
def our_out(synth):
    """Our-format out dict (all-valid masks; compacted == padded here)."""
    j = jnp.asarray
    M, N = len(synth["ref_c"]), len(synth["src_c"])
    MF, NF = len(synth["ref_f"]), len(synth["src_f"])
    dense = np.zeros((M, N), np.float32)
    dense[synth["corr"][:, 0], synth["corr"][:, 1]] = synth["overlaps"]
    out = {
        "ref_points_c": j(synth["ref_c"]),
        "src_points_c": j(synth["src_c"]),
        "ref_points_f": j(synth["ref_f"]),
        "src_points_f": j(synth["src_f"]),
        "shifted_ref_points_c": j(synth["shifted_ref"]),
        "shifted_src_points_c": j(synth["shifted_src"]),
        "ref_feats_c": j(synth["feats_ref"]),
        "src_feats_c": j(synth["feats_src"]),
        "gt_node_corr_overlaps": j(dense),
        # node 0 owns no fine point (node_masks False) but is REAL — the
        # reference includes it in CoarseMatchingLoss as a pure negative
        # (it has no masking there), so nodes_*_valid, not node_masks,
        # gates the loss pairs
        "ref_node_masks": jnp.ones((M,), bool).at[0].set(False),
        "src_node_masks": jnp.ones((N,), bool),
        "nodes_ref_valid": jnp.ones((M,), bool),
        "nodes_src_valid": jnp.ones((N,), bool),
        "ref_mask_c": jnp.ones((M,), bool),
        "src_mask_c": jnp.ones((N,), bool),
        "ref_mask_f": jnp.ones((MF,), bool),
        "src_mask_f": jnp.ones((NF,), bool),
        "matching_scores": j(synth["scores"]),
        "ref_node_corr_knn_points": j(synth["knn_ref_zero"]),
        "src_node_corr_knn_points": j(synth["knn_src_zero"]),
        "ref_node_corr_knn_masks": j(synth["knn_ref_m"]),
        "src_node_corr_knn_masks": j(synth["knn_src_m"]),
        "ref_n2p_scores_c": j(synth["n2p_ref"]),
        "src_n2p_scores_c": j(synth["n2p_src"]),
        "ref_p2p_scores_c": j(synth["p2p_ref"]),
        "src_p2p_scores_c": j(synth["p2p_src"]),
        "ref_n2n_scores_c": j(synth["n2n_ref"]),
        "src_n2n_scores_c": j(synth["n2n_src"]),
        "vote_mask_mat": j(synth["mask_mat"]),
    }
    batch = types.SimpleNamespace(transform=j(synth["tf"]))
    return out, batch


def _easy_eval_cfg(cfg):
    from easydict import EasyDict

    return EasyDict({
        "eval": {
            "acceptance_overlap": cfg.eval.acceptance_overlap,
            "acceptance_radius": cfg.eval.acceptance_radius,
            "rre_threshold": cfg.eval.rre_threshold,
            "rte_threshold": cfg.eval.rte_threshold,
        }
    })


def _ref_cfg():
    from easydict import EasyDict

    cfg = make_cfg()
    return EasyDict({
        "coarse_loss": {
            "positive_margin": cfg.coarse_loss.positive_margin,
            "negative_margin": cfg.coarse_loss.negative_margin,
            "positive_optimal": cfg.coarse_loss.positive_optimal,
            "negative_optimal": cfg.coarse_loss.negative_optimal,
            "log_scale": cfg.coarse_loss.log_scale,
            "positive_overlap": cfg.coarse_loss.positive_overlap,
        },
        "gap_loss": {
            "triplet_loss_gamma": cfg.gap_loss.triplet_loss_gamma,
            "positive_radius": cfg.gap_loss.positive_radius,
        },
        "Vote": {
            "n2n_overlap_threshold": cfg.vote.n2n_overlap_threshold,
            "n2p_overlap_threshold": cfg.vote.n2p_overlap_threshold,
            "p2p_overlap_threshold": cfg.vote.p2p_overlap_threshold,
            "NMS_radius": cfg.vote.nms_radius,
        },
        "loss": {
            "weight_coarse_loss": cfg.loss.weight_coarse_loss,
            "weight_vote_loss": cfg.loss.weight_vote_loss,
            "weight_gap_loss": cfg.loss.weight_gap_loss,
        },
    })


class TestLossParity:
    def test_coarse_matching_loss(self, ref_out, our_out):
        r = float(ref_loss.CoarseMatchingLoss(_ref_cfg())(ref_out[0]))
        o = float(CoarseMatchingLoss(make_cfg())(our_out[0]))
        np.testing.assert_allclose(o, r, rtol=1e-4)

    def test_gap_loss(self, ref_out, our_out):
        r = float(ref_loss.gap_loss(_ref_cfg())(ref_out[0], ref_out[1]))
        o = float(GapLoss(make_cfg())(our_out[0], our_out[1]))
        np.testing.assert_allclose(o, r, rtol=1e-4)

    def test_overlap_loss(self, ref_out, our_out):
        rn, rp = ref_loss.OverlapLoss(_ref_cfg().Vote)(ref_out[0], ref_out[1])
        on, op = OverlapLoss(make_cfg())(our_out[0], our_out[1])
        np.testing.assert_allclose(float(on), float(rn), rtol=1e-4)
        np.testing.assert_allclose(float(op), float(rp), rtol=1e-4)

    def test_vote_loss(self, ref_out, our_out):
        rv, rnn = ref_loss.VoteLoss(_ref_cfg().Vote)(ref_out[0], ref_out[1])
        ov, onn = VoteLoss(make_cfg())(our_out[0], our_out[1])
        np.testing.assert_allclose(float(ov), float(rv), rtol=1e-4)
        np.testing.assert_allclose(float(onn), float(rnn), rtol=1e-4)

    def test_chamfer_loss(self, ref_out, our_out):
        r = float(ref_loss.SingleSideChamferLoss_Brute()(ref_out[0]))
        o = float(SingleSideChamferLoss()(our_out[0]))
        np.testing.assert_allclose(o, r, rtol=1e-4)

    def test_evaluator_metrics(self, synth, ref_out, our_out):
        """PIR / IR / RRE / RTE / RR vs the reference Evaluator on the same
        predictions (reference loss.py:339-396)."""
        from rdmnet_tpu.losses import Evaluator

        rng = np.random.RandomState(9)
        cfg = make_cfg()
        M, N = len(synth["ref_c"]), len(synth["src_c"])
        n_pred = 30
        pred = np.stack([
            rng.randint(0, M, n_pred), rng.randint(0, N, n_pred)
        ], axis=1)
        n_dense = 120
        ref_corr = (rng.rand(n_dense, 3) * 20).astype(np.float32)
        inv = np.linalg.inv(synth["tf"])
        src_corr = (ref_corr @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
        src_corr[: n_dense // 2] += rng.randn(n_dense // 2, 3).astype(np.float32) * 2.0
        est = random_rigid(rng) @ synth["tf"]

        t = lambda x: torch.from_numpy(np.asarray(x))
        ro = dict(ref_out[0])
        ro.update({
            "ref_points_c": t(synth["ref_c"]), "src_points_c": t(synth["src_c"]),
            "ref_node_corr_indices": t(pred[:, 0]),
            "src_node_corr_indices": t(pred[:, 1]),
            "ref_corr_points": t(ref_corr), "src_corr_points": t(src_corr),
            "estimated_transform": t(est),
        })
        rd = dict(ref_out[1])
        rd["evaling"] = True
        torch.Tensor.cuda = lambda self, *a, **k: self
        rres = ref_loss.Evaluator(_easy_eval_cfg(cfg))(ro, rd)

        oo = dict(our_out[0])
        j = jnp.asarray
        oo.update({
            "ref_node_corr_indices": j(pred[:, 0]),
            "src_node_corr_indices": j(pred[:, 1]),
            "node_corr_valid": jnp.ones((n_pred,), bool),
            "ref_corr_points": j(ref_corr), "src_corr_points": j(src_corr),
            "corr_scores": jnp.ones((n_dense,)),
            "estimated_transform": j(est),
        })
        ours = Evaluator(cfg)(oo, our_out[1], evaling=True)
        for key in ("PIR", "IR", "RRE", "RTE", "RR"):
            np.testing.assert_allclose(
                float(ours[key]), float(rres[key]), rtol=1e-3, atol=1e-5,
                err_msg=f"metric {key}",
            )

    def test_overall_loss(self, ref_out, our_out):
        r = ref_loss.OverallLoss(_ref_cfg())(ref_out[0], ref_out[1])
        o = OverallLoss(make_cfg())(our_out[0], our_out[1])
        for key in ("c_loss", "g_loss", "n_loss", "p_loss", "v_loss",
                    "nn_loss", "d_loss", "loss"):
            np.testing.assert_allclose(
                float(o[key]), float(r[key]), rtol=1e-4,
                err_msg=f"term {key}",
            )
