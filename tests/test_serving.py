"""Serving-export round trip: AOT artifact == live pipeline."""

import numpy as np
import pytest
import jax

from rdmnet_tpu.config import make_tiny_cfg
from rdmnet_tpu.serving import SERVE_OUTPUTS, export_inference, load_exported


@pytest.mark.slow
def test_export_round_trip(tmp_path, rng):
    from rdmnet_tpu.cli.common import build_model_and_params, make_forward, pad_pair_np
    from rdmnet_tpu.models import RDMNet

    cfg = make_tiny_cfg()
    model, params = build_model_and_params(cfg)
    out_dir = str(tmp_path / "artifact")
    export_inference(cfg, params, out_dir, platforms=("cpu",))

    serve, meta = load_exported(out_dir)
    assert meta["cap"] == cfg.pyramid.caps[0]
    assert meta["outputs"] == list(SERVE_OUTPUTS)

    ref = (rng.rand(300, 3) * 20).astype(np.float32)
    src = (rng.rand(280, 3) * 20).astype(np.float32)
    out = serve(ref, src)
    assert out["estimated_transform"].shape == (4, 4)
    assert np.all(np.isfinite(out["estimated_transform"]))

    forward = make_forward(cfg, RDMNet(cfg), with_gt=False)
    rp, rc, sp, sc = pad_pair_np(cfg, ref, src)
    live = forward(params, rp, rc, sp, sc, np.eye(4, dtype=np.float32))
    for k in SERVE_OUTPUTS:
        np.testing.assert_allclose(
            out[k], np.asarray(live[k]), atol=1e-5,
            err_msg=f"artifact output {k} diverges from live pipeline",
        )


@pytest.mark.slow
def test_export_truncates_oversized_cloud(tmp_path, rng):
    """Clouds beyond the exported capacity must pad/truncate, not crash."""
    from rdmnet_tpu.cli.common import build_model_and_params

    cfg = make_tiny_cfg()
    _, params = build_model_and_params(cfg)
    out_dir = str(tmp_path / "artifact")
    export_inference(cfg, params, out_dir, platforms=("cpu",))
    serve, meta = load_exported(out_dir)

    big = (rng.rand(meta["cap"] + 64, 3) * 20).astype(np.float32)
    out = serve(big, big)
    assert np.all(np.isfinite(out["estimated_transform"]))
