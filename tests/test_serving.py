"""Serving-export round trip: AOT artifact == live pipeline."""

import json

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
def test_http_server_round_trip(tmp_path, rng):
    """rdmnet-serve: export an artifact, serve it, register a pair over
    HTTP, and verify the response matches calling the artifact directly."""
    import io
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from rdmnet_tpu.cli.common import build_model_and_params
    from rdmnet_tpu.cli.serve import make_handler

    cfg = make_tiny_cfg()
    _, params = build_model_and_params(cfg)
    out_dir = str(tmp_path / "artifact")
    export_inference(cfg, params, out_dir, platforms=("cpu",))
    serve_fn, meta = load_exported(out_dir)

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(serve_fn, meta))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(url + "/healthz") as r:
            health = json.loads(r.read())
        assert health["ok"] and health["cap"] == cfg.pyramid.caps[0]

        ref = (rng.rand(300, 3) * 20).astype(np.float32)
        src = (rng.rand(280, 3) * 20).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, ref_points=ref, src_points=src)
        req = urllib.request.Request(url + "/register", data=buf.getvalue())
        with urllib.request.urlopen(req) as r:
            out = dict(np.load(io.BytesIO(r.read())))

        direct = serve_fn(ref, src)
        np.testing.assert_allclose(
            out["estimated_transform"], direct["estimated_transform"], atol=1e-6
        )
        sel = direct["corr_scores"] > 0
        assert len(out["corr_scores"]) == int(sel.sum())

        # malformed body -> 400, server stays alive
        bad = urllib.request.Request(url + "/register", data=b"not an npz")
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(url + "/healthz") as r:
            health = json.loads(r.read())
        assert health["requests"] == 1 and health["errors"] == 1
        assert health["bucket_requests"] == {str(cfg.pyramid.caps[0]): 1}
    finally:
        server.shutdown()


@pytest.mark.slow
def test_multi_bucket_dispatch(tmp_path, rng):
    """Multi-bucket artifacts: one compiled program per capacity bucket over
    shared weights; requests dispatch to the smallest bucket that fits."""
    from rdmnet_tpu.cli.common import build_model_and_params

    cfg = make_tiny_cfg()
    _, params = build_model_and_params(cfg)
    out_dir = str(tmp_path / "artifact")
    export_inference(
        cfg, params, out_dir, platforms=("cpu",), bucket_scales=(0.5, 1.0)
    )

    serve, meta = load_exported(out_dir)
    caps = [b["cap"] for b in meta["buckets"]]
    assert caps == sorted(caps) and len(caps) == 2
    assert meta["cap"] == caps[-1] == cfg.pyramid.caps[0]

    small = (rng.rand(caps[0] - 10, 3) * 20).astype(np.float32)
    out = serve(small, small)
    assert serve.last_cap == caps[0]
    assert np.all(np.isfinite(out["estimated_transform"]))

    big = (rng.rand(caps[0] + 10, 3) * 20).astype(np.float32)
    out = serve(big, big)
    assert serve.last_cap == caps[1]
    assert np.all(np.isfinite(out["estimated_transform"]))

    # beyond every bucket: largest bucket serves, truncating
    huge = (rng.rand(caps[1] + 10, 3) * 20).astype(np.float32)
    out = serve(huge, huge)
    assert serve.last_cap == caps[1]
    assert np.all(np.isfinite(out["estimated_transform"]))


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
