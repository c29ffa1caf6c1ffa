"""End-to-end golden parity: our full model vs the torch reference.

The golden npz (scripts/dump_reference_golden.py) captures ONE reference run
on the bundled KITTI demo pair: its collate graph, seeded state_dict, and
every intermediate activation. These tests run our model on that exact graph
with the converted weights and pin each stage. This is the composition-level
proof on top of the per-module parity tests (test_torch_parity.py): the
5-stage encoder, both ThDRoFormers, vote, NMS survivor sets, decoder, OT and
LGR must reproduce the reference to float precision.

Why a stored dump instead of re-running the reference in-test: the reference
is nondeterministic ACROSS runs (load_kernels applies an unseeded random
rotation + jitter per KPConv layer, kernel_points.py:426-453), so parity is
only well-defined against a single captured run. The dump is regenerated on
demand when torch + the reference extension are available.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, ".cache", "golden_e2e.npz")

pytestmark = pytest.mark.slow


def rel(a, b, eps=1e-6):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(b).max() + eps)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "dump_reference_golden.py")],
            capture_output=True, text=True, timeout=1200,
        )
        if r.returncode != 0 or not os.path.exists(GOLDEN):
            pytest.skip(f"cannot generate golden dump: {r.stderr[-500:]}")
    from rdmnet_tpu.utils.golden import load_golden_npz

    z = np.load(GOLDEN)
    acts = {k[len("act_"):]: z[k] for k in z.files if k.startswith("act_")}
    graph, outs, sd = load_golden_npz(GOLDEN)
    return graph, outs, sd, acts


@pytest.fixture(scope="module")
def our_run(golden):
    import dataclasses

    import jax

    graph, outs, sd, acts = golden
    from rdmnet_tpu.config import make_cfg
    from rdmnet_tpu.models import RDMNet
    from rdmnet_tpu.utils.golden import pair_batch_from_stacked
    from rdmnet_tpu.utils.torch_convert import convert_state_dict

    batch = pair_batch_from_stacked(
        graph["points"], graph["lengths"], graph["neighbors"],
        graph["subsampling"], graph["upsampling"], np.eye(4, dtype=np.float32),
    )
    params = {"params": convert_state_dict(sd)}
    cfg = make_cfg()
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, shared_influence=False)
    )
    model = RDMNet(cfg)
    with jax.default_matmul_precision("highest"):
        out = jax.jit(
            lambda p, b: model.apply(p, b, training=False, with_gt=False)
        )(params, batch)
    return out, batch


class TestGoldenE2E:
    def test_fine_features_and_scores(self, golden, our_run):
        graph, outs, _, _ = golden
        out, _ = our_run
        ref_nf = int(graph["lengths"][1][0])
        src_nf = int(graph["lengths"][1][1])
        assert rel(np.asarray(out["ref_feats_f"])[:ref_nf], outs["ref_feats_f"][:ref_nf]) < 1e-4
        assert rel(np.asarray(out["src_feats_f"])[:src_nf], outs["src_feats_f"][:src_nf]) < 1e-4
        assert rel(np.asarray(out["ref_p2p_scores_c"])[:ref_nf], outs["ref_p2p_scores_c"]) < 1e-4
        assert rel(np.asarray(out["src_p2p_scores_c"])[:src_nf], outs["src_p2p_scores_c"]) < 1e-4

    def test_vote_and_nms_survivors(self, golden, our_run):
        graph, outs, _, _ = golden
        out, _ = our_run
        ref_nc = int(graph["lengths"][4][0])
        src_nc = int(graph["lengths"][4][1])
        assert rel(np.asarray(out["shifted_ref_points_c"])[:ref_nc],
                   outs["shifted_ref_points_c"]) < 1e-5
        assert rel(np.asarray(out["shifted_src_points_c"])[:src_nc],
                   outs["shifted_src_points_c"]) < 1e-5
        rv = np.asarray(out["nodes_ref_valid"])[:ref_nc]
        sv = np.asarray(out["nodes_src_valid"])[:src_nc]
        # identical NMS survivor SETS (sizes + per-node numerics below)
        assert rv.sum() == len(outs["ref_n2p_scores_c"])
        assert sv.sum() == len(outs["src_n2p_scores_c"])
        assert rel(np.asarray(out["ref_feats_c"])[:ref_nc][rv], outs["ref_feats_c"]) < 1e-4
        assert rel(np.asarray(out["src_feats_c"])[:src_nc][sv], outs["src_feats_c"]) < 1e-4

    def test_final_transform(self, golden, our_run):
        _, outs, _, _ = golden
        out, _ = our_run
        ours = np.asarray(out["estimated_transform"])
        theirs = outs["estimated_transform"]
        # rotation entries within 1e-4 absolute, translation within 2 mm
        assert np.abs(ours[:3, :3] - theirs[:3, :3]).max() < 1e-4
        assert np.abs(ours[:3, 3] - theirs[:3, 3]).max() < 2e-3

    def test_reverse_export_runs_in_live_reference(self, golden, our_run):
        """jax -> torch e2e: export our params into the reference's state-dict
        schema, load them into the LIVE torch reference model with
        strict=True, run its forward on the stored collate graph, and match
        the golden outputs AND our model's outputs — the proof that a
        TPU-trained checkpoint is consumable by the reference's own tooling
        (reference experiments/model.py:399 key schema, model_infer.py
        GT-free forward)."""
        sys.path.insert(0, os.path.join(REPO, "tests"))
        import ref_oracle

        try:
            ref_oracle.load_reference()
        except Exception as e:  # torch/ext unavailable in this environment
            pytest.skip(f"live reference unavailable: {e}")
        import torch

        # torch>=2 rejects .view(-1) on non-contiguous tensors torch 1.8
        # allowed (same patch as scripts/dump_reference_golden.py)
        import geotransformer.modules.ops.index_select as _isel
        import geotransformer.modules.ops as _ops

        def _index_select(data, index, dim):
            output = data.index_select(dim, index.reshape(-1))
            if index.ndim > 1:
                output_shape = data.shape[:dim] + index.shape + data.shape[dim:][1:]
                output = output.view(*output_shape)
            return output

        _isel.index_select = _index_select
        _ops.index_select = _index_select

        graph, outs, sd, _ = golden
        out, _ = our_run
        from rdmnet_tpu.utils.torch_convert import (
            convert_state_dict,
            export_state_dict,
        )

        # the reverse direction under test: flax tree -> reference schema
        params = convert_state_dict(sd)
        exported = export_state_dict(
            params, {k: tuple(v.shape) for k, v in sd.items()}
        )

        sys.path.insert(0, "/root/reference/experiments")
        from config import make_cfg as ref_make_cfg
        from model_infer import create_model

        cfg = ref_make_cfg()
        cfg.test.vis = False
        cfg.neighbor_limits = [65, 63, 69, 71, 81]
        model = create_model(cfg)
        # strict load against the reference's own schema IS the consumability
        # check: any missing/unexpected/mis-shaped key raises here
        model.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()},
            strict=True,
        )
        model.eval()

        ns = len(graph["points"])
        batch = {
            "points": [torch.from_numpy(graph["points"][i]) for i in range(ns)],
            "lengths": [
                torch.from_numpy(graph["lengths"][i]).long() for i in range(ns)
            ],
            "neighbors": [
                torch.from_numpy(graph["neighbors"][i]).long() for i in range(ns)
            ],
            "subsampling": [
                torch.from_numpy(graph["subsampling"][i]).long()
                for i in range(ns - 1)
            ],
            "upsampling": [
                torch.from_numpy(graph["upsampling"][i]).long()
                for i in range(ns - 1)
            ],
            "features": torch.ones(len(graph["points"][0]), 1),
            "transform": torch.eye(4),
            "batch_size": 1,
            "testing": True,
        }
        with torch.no_grad():
            tout = model(batch)

        # the reference fed with our exported weights must reproduce the
        # golden run (same graph, same numbers, deterministic forward) ...
        t_torch = tout["estimated_transform"].numpy()
        assert np.abs(t_torch[:3, :3] - outs["estimated_transform"][:3, :3]).max() < 1e-5
        assert np.abs(t_torch[:3, 3] - outs["estimated_transform"][:3, 3]).max() < 1e-4
        ref_nf = int(graph["lengths"][1][0])
        assert rel(tout["ref_feats_f"].numpy()[:ref_nf],
                   outs["ref_feats_f"][:ref_nf]) < 1e-5
        # ... and agree with OUR model's output on the same pair — the
        # cross-framework statement users of the export path rely on
        ours_t = np.asarray(out["estimated_transform"])
        assert np.abs(t_torch[:3, :3] - ours_t[:3, :3]).max() < 1e-4
        assert np.abs(t_torch[:3, 3] - ours_t[:3, 3]).max() < 2e-3

    def test_converter_tree_is_exact(self, golden):
        """The converted tree must match our init tree key-for-key."""
        import dataclasses

        import jax

        graph, _, sd, _ = golden
        from rdmnet_tpu.config import make_cfg
        from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud
        from rdmnet_tpu.models import RDMNet
        from rdmnet_tpu.utils.torch_convert import convert_state_dict
        import jax.numpy as jnp

        cfg = make_cfg()
        spec = dataclasses.replace(
            cfg.pyramid, caps=(512, 256, 128, 64, 32),
            neighbor_limits=(16,) * 5, band_caps=(None,) * 5,
        )
        cfg = dataclasses.replace(cfg, pyramid=spec)
        model = RDMNet(cfg)
        rng = np.random.RandomState(0)
        pts = (rng.rand(400, 3) * 30).astype(np.float32)
        rp, rc = pad_cloud(jnp.asarray(pts), 512)
        batch = build_pair_batch(rp, rc, rp, rc, jnp.eye(4), spec)
        params = model.init(jax.random.PRNGKey(0), batch, training=False, with_gt=False)

        def paths(tree):
            return {
                ".".join(k.key for k in p): np.asarray(v).shape
                for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
            }

        ours = paths(params["params"])
        conv = paths(convert_state_dict(sd))
        assert ours == conv
