"""Configuration tree for rdmnet_tpu.

Mirrors the hyperparameter surface of the reference (reference:
experiments/config.py:10-188) but as frozen dataclasses so configs are
hashable and can be closed over by jit'd functions. TPU-specific additions:

* ``PyramidConfig.caps`` — static per-level point capacities (the reference
  has data-dependent level sizes; we pad to fixed caps so the whole graph
  compiles once),
* ``PyramidConfig.neighbor_limits`` — static per-level neighbor K (the
  reference calibrates these at runtime from the train set,
  reference: geotransformer/utils/data.py:195-220; we precompute per-dataset
  constants and provide the same calibration utility offline),
* mesh/parallelism settings.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class PyramidConfig:
    """Static-shape multi-level pyramid spec (replaces runtime calibration)."""

    num_stages: int = 5
    voxel_size: float = 0.3          # reference: config.py:88 init_voxel_size
    search_radius: float = 1.275     # reference: config.py:92 init_radius = 4.25 * 0.3
    # Per-level point capacities (level 0 = input cloud). Defaults sized for
    # KITTI (30k-point training clouds, reference: config.py:46 point_limit);
    # measured demo-scan occupancies are [20524, 8145, 3240, 1139, 431] for a
    # ~20k cloud, so these caps leave ~1.5x headroom at the coarse levels.
    caps: Tuple[int, ...] = (30720, 12288, 5120, 1792, 640)
    # Per-level static neighbor counts (stands in for the reference's
    # calibrated `neighbor_limits`; typical calibrated KITTI values are ~35-40).
    neighbor_limits: Tuple[int, ...] = (40, 40, 40, 40, 40)
    # Upsampling-table width. The decoder consumes ONLY column 0
    # (nearest_upsample, reference functional.py:6-22), so the default
    # searches a single exact nearest neighbor — identical decoder inputs
    # at a fraction of the top-k work. None restores the reference's full
    # neighbor_limits[i + 1] tables (geotransformer/utils/data.py:59-66),
    # needed only when consuming the tables externally (e.g. oracle tests
    # or knn_interpolate-style custom heads).
    upsampling_limit: Optional[int] = 1
    # TPU-accelerated approximate top-k for the neighbor search (None = exact;
    # recall applies to the farthest in-radius neighbors only — measured 12x
    # faster than exact top_k on the 30k-point level; disabled automatically
    # for small supports).
    approx_recall: Optional[float] = 0.95
    # First level whose upsampling table is actually built. The decoder stops
    # at level 1, so upsampling[0] (the largest table, 30k queries) is never
    # consumed — the reference computes-and-ignores it too
    # (utils/data.py:59-66 vs experiments/backbone.py:139-147). Set to 0 to
    # build all tables.
    build_upsampling_from_level: int = 1
    # Banded radius search (ops/radius_search.radius_knn_banded): static
    # band capacity per SUPPORT level — how many x-sorted support rows one
    # query chunk sees. None = full unbanded search at that level. Defaults
    # sized from measured KITTI chunk-band occupancies (max ~5.4k at level 0
    # for 30k-cap scans) with ~30-40% headroom; undersized bands surface in
    # the per-level `dropped` telemetry instead of failing silently.
    band_caps: Tuple[Optional[int], ...] = (7168, 3584, 2304, None, None)
    # True = band_caps are MEASURED values (preprocess calibrate /
    # --band_caps): ``scaled()`` keeps them verbatim instead of scaling
    # them with the bucket — band occupancy depends on the data, not the
    # capacity bucket, whenever clouds fit the bucket.
    band_caps_fixed: bool = False
    # Query rows per banded chunk (smaller = tighter bands, more dispatch).
    band_chunk: int = 512
    # Query tiles processed per search-loop iteration (lax.map batch_size):
    # amortizes per-iteration loop overhead at map_batch x the VMEM
    # footprint without changing results or the band-calibration contract
    # (chunk geometry is untouched; tiles are merely executed in batches).
    # None = one tile per iteration.
    map_batch: Optional[int] = None

    def __post_init__(self):
        assert len(self.caps) == self.num_stages
        assert len(self.neighbor_limits) == self.num_stages
        if len(self.band_caps) != self.num_stages:
            # fit the default band tuple to a non-default stage count
            # (oversized bands harmlessly fall back to the full search)
            fitted = (self.band_caps + (None,) * self.num_stages)[: self.num_stages]
            object.__setattr__(self, "band_caps", fitted)

    def sort_cell(self, lvl: int) -> float:
        """Granularity the level's x-major point order is monotone in:
        2*voxel for the level-0 sort, the level's own grid voxel above
        (single source of truth for the banded search AND its calibration)."""
        return self.voxel_size * (2.0 ** max(lvl, 1))

    def band_chunk_for(self, q_lvl: int) -> int:
        """Query rows per banded chunk: scales with the query level so a
        chunk never spans more than ~1/16 of the scan (a fixed chunk of a
        coarse level would cover most of the x-extent and blow the band)."""
        return min(self.band_chunk,
                   max(128, ((self.caps[q_lvl] // 16 + 63) // 64) * 64))

    def scaled(self, factor: float, multiple: int = 128) -> "PyramidConfig":
        """A bucket variant with capacities scaled by ``factor`` and rounded
        up to ``multiple`` (static-shape point-count bucketing — the
        framework's answer to data-dependent cloud sizes, SURVEY §5)."""
        import dataclasses as _dc

        caps = tuple(
            max(multiple, -(-int(c * factor) // multiple) * multiple)
            for c in self.caps
        )
        if self.band_caps_fixed:
            bands = self.band_caps
        else:
            bands = tuple(
                None if b is None
                else max(multiple, -(-int(b * factor) // multiple) * multiple)
                for b in self.band_caps
            )
        return _dc.replace(self, caps=caps, band_caps=bands)


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """KPConv encoder/decoder (reference: config.py:86-97)."""

    num_stages: int = 5
    init_voxel_size: float = 0.3
    kernel_size: int = 15
    base_radius: float = 4.25
    base_sigma: float = 2.0
    group_norm: int = 32
    input_dim: int = 1
    init_dim: int = 64
    output_dim: int = 256
    # Input features are the all-ones LiDAR convention (reference
    # kitti/dataset.py:188-189): the first ConvBlock's gathered neighbor
    # features then EQUAL the neighbor-validity indicator, which is pure
    # index arithmetic — the (N, H, 1) feature gather is skipped. Set False
    # if feeding real input features.
    ones_input: bool = True
    # Share the geometric kernel-influence tensor across same-level blocks.
    # Valid when every KPConv layer uses the SAME kernel disposition (our
    # fresh-training default: the canonical deterministic kernel). Set False
    # when running converted reference checkpoints — the reference rotates/
    # jitters the kernel independently per layer, so each KPConv must
    # compute influence from its own restored kernel_points.
    shared_influence: bool = True

    @property
    def init_radius(self) -> float:
        return self.base_radius * self.init_voxel_size

    @property
    def init_sigma(self) -> float:
        return self.base_sigma * self.init_voxel_size


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Global model knobs (reference: config.py:100-106)."""

    ground_truth_matching_radius: float = 0.6
    num_points_in_patch: int = 128
    num_sinkhorn_iterations: int = 100
    ground_truth_corres_radius: float = 2.4
    n2p_score_threshold: float = 0.1
    p2p_score_threshold: float = 0.1
    # Coarse transformer family: "thdroformer" (RDMNet default),
    # "geotransformer" (the original GeoTransformer RPE stack the reference
    # keeps as its ablation alternative — import commented at
    # experiments/model.py:9-14, params live at config.py:139-148), or
    # "ape" (absolute-PE ablation, thdroformer.py:368-448).
    coarse_module: str = "thdroformer"


@dataclasses.dataclass(frozen=True)
class CoarseMatchingConfig:
    """reference: config.py:110-114."""

    num_targets: int = 128
    overlap_threshold: float = 0.1
    num_correspondences: int = 256
    dual_normalization: bool = True


@dataclasses.dataclass(frozen=True)
class ThDRoFormerConfig:
    """3D rotary transformer (reference: config.py:117-125)."""

    input_dim: int = 2048
    hidden_dim: int = 128
    output_dim: int = 256
    num_heads: int = 4
    num_layers: int = 4
    input_dim2: int = 256
    num_layers2: int = 4
    # Sparse top-k attention schedule for stage-2 (None = dense; reference
    # default k2=None, config.py:125). Fractions of N kept per layer.
    k2: Optional[Tuple[float, ...]] = None


@dataclasses.dataclass(frozen=True)
class VoteConfig:
    """Vote/offset layer + NMS (reference: config.py:128-136)."""

    model_use_vote: bool = True
    inference_use_vote: bool = True
    max_translate_range: Tuple[float, float, float] = (3.0, 3.0, 3.0)
    mlps: Tuple[int, ...] = (512, 256)
    nms_radius: float = 2.4
    # None = exact full-radius NMS adjacency (default; arguably more correct).
    # An int replicates the reference's adjacency truncation to the last
    # calibrated neighbor limit (vote.py:24-31) — set by make_parity_cfg for
    # strict parity with converted checkpoints; differs from exact only in
    # clusters denser than the limit (ops/nms.py).
    nms_neighbor_limit: Optional[int] = None
    n2n_overlap_threshold: float = 1.2
    n2p_overlap_threshold: float = 0.6
    p2p_overlap_threshold: float = 0.6


@dataclasses.dataclass(frozen=True)
class GeoTransformerConfig:
    """Original GeoTransformer stack, kept for parity/ablation
    (reference: config.py:139-148; superseded by ThDRoFormer in RDMNet)."""

    input_dim: int = 2048
    hidden_dim: int = 128
    output_dim: int = 256
    num_heads: int = 4
    blocks: Tuple[str, ...] = ("self", "cross", "self", "cross", "self", "cross")
    sigma_d: float = 4.8
    sigma_a: float = 15.0
    angle_k: int = 3
    reduction_a: str = "max"


@dataclasses.dataclass(frozen=True)
class FineMatchingConfig:
    """Local-to-global registration (reference: config.py:152-161)."""

    topk: int = 1
    acceptance_radius: float = 0.6
    mutual: bool = False
    confidence_threshold: float = 0.0
    use_dustbin: bool = True
    use_global_score: bool = False
    correspondence_threshold: int = 3
    correspondence_limit: Optional[int] = None
    num_refinement_steps: int = 5


@dataclasses.dataclass(frozen=True)
class CoarseLossConfig:
    """Weighted circle loss (reference: config.py:166-172)."""

    positive_margin: float = 0.1
    negative_margin: float = 1.4
    positive_optimal: float = 0.1
    negative_optimal: float = 1.4
    log_scale: float = 40.0
    positive_overlap: float = 0.1


@dataclasses.dataclass(frozen=True)
class GapLossConfig:
    """Score-gap hinge loss (reference: config.py:175-177)."""

    positive_radius: float = 0.6
    triplet_loss_gamma: float = 0.5


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """reference: config.py:180-183."""

    weight_coarse_loss: float = 1.0
    weight_vote_loss: float = 1.0
    weight_gap_loss: float = 5.0


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """reference: config.py:62-67."""

    acceptance_overlap: float = 0.0
    acceptance_radius: float = 0.6
    inlier_ratio_threshold: float = 0.05
    rre_threshold: float = 5.0   # degrees
    rte_threshold: float = 2.0   # meters


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """RANSAC baseline knobs (reference: config.py:70-73)."""

    distance_threshold: float = 0.3
    num_points: int = 4
    num_iterations: int = 50000


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """reference: config.py:76-82."""

    lr: float = 1e-4
    lr_decay: float = 0.95
    lr_decay_steps: int = 4      # epochs per decay step
    weight_decay: float = 1e-6
    max_epoch: int = 160
    grad_acc_steps: int = 1
    # LR schedule family: "step" is the reference's trainval StepLR
    # (trainval.py:36); "warmup_cosine" is its engine-level alternative
    # (geotransformer/utils/torch.py:143-178) — linear warmup from
    # eta_init x lr to lr over warmup_steps, then cosine to eta_min x lr
    # over the remaining steps (both counted in APPLIED updates, matching
    # the reference's //grad_acc_steps division).
    scheduler: str = "step"
    warmup_steps: int = 0        # micro steps, as the reference counts them
    eta_init: float = 0.1        # warmup start factor (reference default)
    eta_min: float = 0.1         # cosine floor factor (reference default)


@dataclasses.dataclass(frozen=True)
class TrainDataConfig:
    """reference: config.py:43-52."""

    batch_size: int = 1
    point_limit: int = 30000
    use_augmentation: bool = True
    augmentation_noise: float = 0.01
    augmentation_min_scale: float = 0.8
    augmentation_max_scale: float = 1.2
    augmentation_shift: float = 2.0
    augmentation_rotation: float = 1.0
    num_workers: int = 8


@dataclasses.dataclass(frozen=True)
class TestDataConfig:
    """reference: config.py:55-58."""

    batch_size: int = 1
    point_limit: Optional[int] = None
    num_workers: int = 8


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """TPU mesh layout (replaces NCCL DDP, reference: base_trainer.py:63-78)."""

    dp: int = 1                 # data-parallel mesh size: N devices, -1 = all,
                                # 1 = single-device (mesh off); trainval --dp overrides
    scale_lr_by_dp: bool = True  # reference scales lr by world size (base_trainer.py:193-198)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "kitti"       # kitti | kitti360 | apollo | mulran
    dataset_root: str = "/data/KITTI_odometry"
    dataset_360_root: str = "/data/KITTI-360"
    mulran_root: str = "/data/mulran_process"
    apollo_root: str = "/data/apollo"
    benchmark_distance: int = 10


@dataclasses.dataclass(frozen=True)
class Config:
    seed: int = 7351             # reference: config.py:13
    # MXU compute dtype for backbone/transformer matmuls ("float32" or
    # "bfloat16"); norms, softmax, geometry, Sinkhorn and pose math stay f32.
    compute_dtype: str = "float32"
    # jax.default_matmul_precision for evaluation/inference ("default" |
    # "float32" | "highest"). The TPU "default" runs f32 matmuls as
    # single-pass bf16 products (~1e-3 relative); "highest" is exact f32 at
    # a measured ~7% end-to-end cost — the eval/test/infer CLIs use this so
    # reported metrics reflect the trained function, while training and the
    # throughput bench keep "default".
    eval_matmul_precision: str = "highest"
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainDataConfig = dataclasses.field(default_factory=TrainDataConfig)
    test: TestDataConfig = dataclasses.field(default_factory=TestDataConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    ransac: RansacConfig = dataclasses.field(default_factory=RansacConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    pyramid: PyramidConfig = dataclasses.field(default_factory=PyramidConfig)
    backbone: BackboneConfig = dataclasses.field(default_factory=BackboneConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    coarse_matching: CoarseMatchingConfig = dataclasses.field(default_factory=CoarseMatchingConfig)
    thdroformer: ThDRoFormerConfig = dataclasses.field(default_factory=ThDRoFormerConfig)
    vote: VoteConfig = dataclasses.field(default_factory=VoteConfig)
    geotransformer: GeoTransformerConfig = dataclasses.field(default_factory=GeoTransformerConfig)
    fine_matching: FineMatchingConfig = dataclasses.field(default_factory=FineMatchingConfig)
    coarse_loss: CoarseLossConfig = dataclasses.field(default_factory=CoarseLossConfig)
    gap_loss: GapLossConfig = dataclasses.field(default_factory=GapLossConfig)
    loss: LossWeights = dataclasses.field(default_factory=LossWeights)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


def check_geometry_consistent(cfg: Config) -> None:
    """Pyramid and backbone carry coupled geometry constants — a partial
    override (e.g. pyramid.voxel_size without search_radius and
    backbone.init_voxel_size) silently desyncs the voxel grid, the
    neighbor-search radius and the KPConv radii. Raise instead."""
    if abs(cfg.pyramid.voxel_size - cfg.backbone.init_voxel_size) > 1e-9:
        raise ValueError(
            f"pyramid.voxel_size={cfg.pyramid.voxel_size} != "
            f"backbone.init_voxel_size={cfg.backbone.init_voxel_size}: "
            "override both together"
        )
    expected = cfg.backbone.base_radius * cfg.backbone.init_voxel_size
    if abs(cfg.pyramid.search_radius - expected) > 1e-6:
        raise ValueError(
            f"pyramid.search_radius={cfg.pyramid.search_radius} != "
            f"base_radius*voxel_size={expected}: override in lockstep"
        )


def make_cfg(**overrides) -> Config:
    """Build the default KITTI config (reference: config.py:187 make_cfg)."""
    cfg = Config(**overrides)
    check_geometry_consistent(cfg)
    return cfg


def make_parity_cfg(**overrides) -> Config:
    """Reference-faithful KITTI config for CONVERTED torch checkpoints.

    The throughput-oriented defaults deviate from the reference in ways a
    freshly trained model absorbs but a converted checkpoint does not:

    * neighbor_limits: the reference calibrates ~(65, 63, 69, 71, 81) on
      KITTI (80th-percentile neighborhood sizes, utils/data.py:195-220);
      our default 40 changes fine features by ~12% rel under reference
      weights (measured with the golden state_dict on the demo pair).
    * exact radius search (no approx top-k) — measured negligible on its
      own, disabled anyway for exactness;
    * per-layer kernel dispositions (backbone.shared_influence=False) —
      the reference randomizes kernels per layer at build time.

    Use together with utils/torch_convert.convert_state_dict and
    Config.eval_matmul_precision="highest" (the default).
    """
    cfg = Config(**overrides)
    return dataclasses.replace(
        cfg,
        pyramid=dataclasses.replace(
            cfg.pyramid,
            neighbor_limits=(65, 63, 69, 71, 81),
            approx_recall=None,
        ),
        backbone=dataclasses.replace(cfg.backbone, shared_influence=False),
        # reference NMS sees its adjacency truncated to the LAST calibrated
        # neighbor limit (vote.py:11,24-31)
        vote=dataclasses.replace(cfg.vote, nms_neighbor_limit=81),
    )


def make_tiny_cfg() -> Config:
    """A miniature config for unit tests / compile checks: same topology,
    tiny static capacities so everything compiles and runs on CPU quickly."""
    return Config(
        pyramid=PyramidConfig(
            caps=(512, 256, 128, 64, 32),
            neighbor_limits=(16, 16, 16, 16, 16),
        ),
        model=ModelConfig(num_points_in_patch=16, num_sinkhorn_iterations=10),
        coarse_matching=CoarseMatchingConfig(num_targets=16, num_correspondences=32),
        thdroformer=ThDRoFormerConfig(num_layers=1, num_layers2=1),
        vote=VoteConfig(mlps=(64, 32)),
        fine_matching=FineMatchingConfig(num_refinement_steps=2),
    )
