"""Shared CLI helpers: model/param setup, padded->dynamic output trimming."""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rdmnet_tpu.config import Config
from rdmnet_tpu.engine.checkpoint import CheckpointManager
from rdmnet_tpu.graph.pyramid import build_pair_batch, pad_cloud
from rdmnet_tpu.models import RDMNet


def enable_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a per-user directory.

    The large-capacity pyramid graphs compile in MINUTES on the remote TPU
    (measured: 13.7 min for the procedural-scene train step, ~20 min for
    the eval forward at caps 4480/.../512 — STATUS round-3); the persistent
    cache turns every rerun at the same shapes into a sub-second load
    (verified on the axon backend: 1.8 s -> 0.25 s across processes).
    Every CLI entrypoint calls this before first compile.

    ``RDMNET_COMPILE_CACHE`` overrides the location; ``0``/``off`` disables
    (the test suite manages its own cache in tests/conftest.py).
    """
    loc = os.environ.get("RDMNET_COMPILE_CACHE", "")
    if loc.strip().lower() in ("0", "off", "none"):
        return
    if jax.config.jax_compilation_cache_dir:
        return  # already configured (conftest, or a caller's explicit choice)
    path = loc or os.path.join(
        os.path.expanduser("~"), ".cache", "rdmnet_tpu", "jax_cache"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: even "fast" 20-40 s compiles dominate short CLI runs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def add_pyramid_overrides(parser) -> None:
    """Per-dataset static-capacity knobs shared by the train/eval CLIs.

    The values come from ``rdmnet_tpu.cli.preprocess calibrate`` (the
    reference recalibrates neighbor limits per run, utils/data.py:195-220;
    band caps are this framework's banded-search capacities, an
    accuracy-relevant static bound surfaced by the `dropped` telemetry)."""
    parser.add_argument(
        "--neighbor_limits", default=None,
        help="per-level neighbor K, comma ints (from `preprocess "
             "calibrate`), e.g. 65,63,69,71,81",
    )
    parser.add_argument(
        "--band_caps", default=None,
        help="per-level banded-search caps, comma ints with 'none' to "
             "disable banding for a level (from `preprocess calibrate`), "
             "e.g. 7168,3584,2304,none,none. Undersized bands clip "
             "neighbors and count in the `dropped` telemetry",
    )
    parser.add_argument(
        "--caps", default=None,
        help="per-level pyramid point capacities, comma ints (e.g. "
             "30000,12288,5120,2048,1024): the static bucket sizes a "
             "dataset's level occupancies must fit — override when the "
             "default halving profile mismatches the data (the `dropped` "
             "telemetry counts clipped voxels). Applied before any "
             "--bucket_scale scaling",
    )
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force the jax backend (the JAX_PLATFORMS env var is NOT "
             "honored when a TPU plugin is installed; this applies the "
             "config update before first device use). cpu = debug/CI runs "
             "without touching the chip",
    )
    parser.add_argument(
        "--cfg_preset", default=None, choices=["tiny"],
        help="config preset override: 'tiny' = config.make_tiny_cfg() "
             "(miniature capacities; CI smoke / plumbing runs only)",
    )


def apply_pyramid_overrides(cfg: Config, args) -> Config:
    """Apply --neighbor_limits/--band_caps onto cfg.pyramid (before any
    --bucket_scale scaling, which multiplies both)."""
    import dataclasses

    pyr = cfg.pyramid
    if getattr(args, "caps", None):
        caps = tuple(int(v) for v in args.caps.split(","))
        if len(caps) != len(pyr.caps):
            raise ValueError(
                f"--caps needs {len(pyr.caps)} per-level values, got {len(caps)}"
            )
        pyr = dataclasses.replace(pyr, caps=caps)
    if getattr(args, "neighbor_limits", None):
        limits = tuple(int(v) for v in args.neighbor_limits.split(","))
        pyr = dataclasses.replace(pyr, neighbor_limits=limits)
    if getattr(args, "band_caps", None):
        bands = tuple(
            None if v.strip().lower() in ("none", "-", "") else int(v)
            for v in args.band_caps.split(",")
        )
        # measured values survive --bucket_scale/--buckets verbatim
        pyr = dataclasses.replace(pyr, band_caps=bands, band_caps_fixed=True)
    return cfg.replace(pyramid=pyr) if pyr is not cfg.pyramid else cfg


def make_cli_cfg(args) -> Config:
    """Shared CLI config selection (test/infer/export/serve):

    * parity predicate — ``--parity_cfg``, or ``--torch_checkpoint``
      without ``--no_parity_cfg``, selects ``make_parity_cfg()``
      (calibrated limits, exact search — required for converted
      reference weights, STATUS.md round-2 #11);
    * ``--coarse_module`` overrides the coarse transformer family.

    CLIs apply their own further overrides (dataset quirks, buckets) on
    the returned config.
    """
    import dataclasses

    if getattr(args, "platform", None):
        # must land before first device use; the env-var spelling is
        # ignored when a TPU plugin is installed
        import jax

        jax.config.update("jax_platforms", args.platform)
    parity = getattr(args, "parity_cfg", False) or (
        getattr(args, "torch_checkpoint", None)
        and not getattr(args, "no_parity_cfg", False)
    )
    if getattr(args, "cfg_preset", None) == "tiny":
        from rdmnet_tpu.config import make_tiny_cfg

        cfg = make_tiny_cfg()
    elif parity:
        from rdmnet_tpu.config import make_parity_cfg

        cfg = make_parity_cfg()
    else:
        from rdmnet_tpu.config import make_cfg

        cfg = make_cfg()
    coarse = getattr(args, "coarse_module", None)
    if coarse is not None:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, coarse_module=coarse)
        )
    return apply_pyramid_overrides(cfg, args)


def build_model_and_params(
    cfg: Config, snapshot_dir: Optional[str] = None, epoch: Optional[int] = None,
    torch_checkpoint: Optional[str] = None, commit_to_device: bool = True,
):
    """Create the model; load params from a snapshot if given, else random
    init (reference testers resolve snapshots by epoch,
    base_tester.py:54-58). ``torch_checkpoint`` loads a reference .pth.tar
    through utils/torch_convert — use with config.make_parity_cfg().

    ``commit_to_device``: device_put the restored params once — required
    before any jitted eval loop (host-resident params re-upload the full
    ~90 MB tree on EVERY call: measured 2290 -> 89 ms/pair on the remote
    link, round 5). Pass False from host-only consumers (cli/convert
    import/export), where an upload + per-leaf fetch-back would be pure
    round-trip waste.
    """
    commit = jax.device_put if commit_to_device else (lambda x: x)
    model = RDMNet(cfg)
    if torch_checkpoint:
        from rdmnet_tpu.utils.torch_convert import (
            convert_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(torch_checkpoint)
        return model, commit({"params": convert_state_dict(sd)})
    rng = np.random.RandomState(0)
    pts = (rng.rand(256, 3) * 10).astype(np.float32)

    if snapshot_dir:
        # a mistyped path must ERROR, not silently evaluate random weights
        if not os.path.isdir(snapshot_dir):
            raise FileNotFoundError(f"snapshot_dir not found: {snapshot_dir}")
        # template-free params-only restore: evaluation never needs the
        # optimizer tree, and a template restore would reject snapshots
        # whose opt_state shape differs from a fresh one (e.g. the
        # MultiSteps wrapper --grad_acc training adds) — exactly the
        # mismatch that broke `rdmnet-test` on a grad_acc-4 run
        mgr = CheckpointManager(snapshot_dir)
        params = mgr.restore_params(step=epoch)
        # orbax restores HOST numpy arrays; without the device commit every
        # jitted eval call re-uploads the whole param tree (~90 MB) —
        # measured 2290 ms/pair vs 89 ms committed, the entire cli/test
        # `proc` mystery of rounds 3-5
        return model, commit(params)

    @jax.jit
    def _init(key):
        rp, rc = pad_cloud(jnp.asarray(pts), cfg.pyramid.caps[0])
        example = build_pair_batch(rp, rc, rp, rc, jnp.eye(4), cfg.pyramid)
        return model.init(key, example, training=False, with_gt=False)

    return model, _init(jax.random.PRNGKey(cfg.seed))


def pad_pair_np(cfg: Config, ref_points: np.ndarray, src_points: np.ndarray):
    """Host-side padding only; the pyramid must be built INSIDE a jitted
    function (eager building pays per-op dispatch latency). Level-0
    truncation is reported via the pyramid's ``dropped`` telemetry — callers
    can recover it as ``len(points) - count``."""
    from rdmnet_tpu.data.loader import pad_points_np

    cap = cfg.pyramid.caps[0]
    rp, n_ref = pad_points_np(ref_points, cap)
    sp, n_src = pad_points_np(src_points, cap)
    return rp, n_ref, sp, n_src


def make_forward(cfg: Config, model, with_gt: bool):
    """Jitted end-to-end pipeline: padded arrays in -> outputs. The pyramid
    builds on device inside the same program as the model."""

    @jax.jit
    def forward(params, rp, rc, sp, sc, transform):
        # eval-time exact f32 matmuls (see Config.eval_matmul_precision)
        with jax.default_matmul_precision(cfg.eval_matmul_precision):
            batch = build_pair_batch(rp, rc, sp, sc, transform, cfg.pyramid)
            return model.apply(params, batch, training=False, with_gt=with_gt)

    return forward


# the model-output keys trim_outputs actually consumes: fetching the WHOLE
# out dict pulled every padded intermediate over the device link — dominated
# by the (cap_f, output_dim) fine feature maps (~11 MB each at the 0.7
# bucket) that the npz schema never uses; on the remote-TPU tunnel that
# volume was the per-pair bottleneck of the whole cli/test loop (measured
# 2.5-7 s/pair in the round-5 hard-tier sweep)
_TRIM_KEYS = (
    "ref_points_f", "src_points_f", "ref_mask_f", "src_mask_f",
    "nodes_ref", "nodes_src", "nodes_ref_valid", "nodes_src_valid",
    "ref_feats_c", "src_feats_c",
    "node_corr_valid", "ref_node_corr_indices", "src_node_corr_indices",
    "gt_node_corr_overlaps", "corr_scores", "ref_corr_points",
    "src_corr_points", "estimated_transform",
)
_TRIM_VIS_KEYS = (
    "ref_mask_c", "src_mask_c", "ref_points_c", "src_points_c",
    "shifted_ref_points_c", "shifted_src_points_c",
)


def trim_outputs(out: Dict, transform: np.ndarray,
                 vis: bool = False) -> Dict[str, np.ndarray]:
    """Convert padded static outputs to the reference's dynamic npz schema
    (reference experiments/test.py:70-98): masked rows dropped, node indices
    remapped to the trimmed node arrays, GT overlaps densified to (C, 2)
    index + overlap lists. ``vis=True`` adds ``vis_*`` extras (original /
    shifted coarse nodes + NMS survivor masks) consumed by the --vis
    exports, never written to the npz dump."""
    # ONE batched fetch of ONLY the consumed keys: per-key np.asarray would
    # serialize a device round trip per array (measured +107 ms for 4 arrays
    # on the remote-device link in serving.load_exported), and fetching the
    # full dict would ship the unused fine feature maps (see _TRIM_KEYS)
    keys = _TRIM_KEYS + (_TRIM_VIS_KEYS if vis else ())
    o = jax.device_get(
        {k: out[k] for k in keys if k in out and hasattr(out[k], "shape")}
    )

    ref_nv = o["nodes_ref_valid"]
    src_nv = o["nodes_src_valid"]
    ref_remap = np.cumsum(ref_nv) - 1
    src_remap = np.cumsum(src_nv) - 1

    result = {
        "ref_points": o["ref_points_f"][o["ref_mask_f"]],   # level-1 points
        "src_points": o["src_points_f"][o["src_mask_f"]],
        "ref_points_f": o["ref_points_f"][o["ref_mask_f"]],
        "src_points_f": o["src_points_f"][o["src_mask_f"]],
        "ref_points_c": o["nodes_ref"][ref_nv],
        "src_points_c": o["nodes_src"][src_nv],
        "ref_feats_c": o["ref_feats_c"][ref_nv],
        "src_feats_c": o["src_feats_c"][src_nv],
        "transform": np.asarray(transform),
    }

    cv = o["node_corr_valid"]
    result["ref_node_corr_indices"] = ref_remap[o["ref_node_corr_indices"][cv]]
    result["src_node_corr_indices"] = src_remap[o["src_node_corr_indices"][cv]]

    if "gt_node_corr_overlaps" in o:
        ov = o["gt_node_corr_overlaps"]
        ri, si = np.nonzero(ov > 0)
        result["gt_node_corr_indices"] = np.stack(
            [ref_remap[ri], src_remap[si]], axis=1
        )
        result["gt_node_corr_overlaps"] = ov[ri, si]

    if "corr_scores" in o:
        sel = o["corr_scores"] > 0
        result["ref_corr_points"] = o["ref_corr_points"][sel]
        result["src_corr_points"] = o["src_corr_points"][sel]
        result["corr_scores"] = o["corr_scores"][sel]
    if "estimated_transform" in o:
        result["estimated_transform"] = o["estimated_transform"]
    if vis:
        # vote/grouping export inputs (reference vis_shifte_node /
        # vis_node_grouping, rdmnet/utils/visualization.py:296-436)
        for side in ("ref", "src"):
            mc = o[f"{side}_mask_c"]
            result[f"vis_{side}_nodes"] = o[f"{side}_points_c"][mc]
            if f"shifted_{side}_points_c" in o:
                result[f"vis_{side}_shifted"] = o[f"shifted_{side}_points_c"][mc]
            result[f"vis_{side}_keep"] = o[f"nodes_{side}_valid"][mc]
    return result
