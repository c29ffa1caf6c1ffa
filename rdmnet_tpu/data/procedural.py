"""Procedural LiDAR scene synthesis: dataset-free scans with real occlusion.

The bundled-scan synthetic datasets (scripts/make_synth_kitti.py) transform
ONE fixed geometry by rigid motions, so a held-out test split measures only
*motion* generalization. This module removes that ceiling: it generates
unlimited distinct urban-like scenes (ground plane + yawed boxes for
buildings + vertical cylinders for poles/trunks) and renders each frame by
ray-casting a spinning-LiDAR ray pattern from a moving sensor pose — so
consecutive frames have genuinely different sampling and viewpoint-dependent
occlusion (each scan only sees surfaces facing its own sensor), like real
scan pairs, and test splits can hold out entire scenes.

The reference has no equivalent (it assumes the real datasets are on disk);
this exists so training/eval workflows and CI can run with zero external
data at realistic point statistics. Scans are returned in the SENSOR frame
(sensor ~1.73 m above ground, the KITTI velodyne mount height) as (N, 4)
xyzi float32, voxel-downsampled at the reference's preprocessing resolution
(0.3 m, reference preporcess/downsample_pcd_kitti.py:24).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .preprocess import voxel_downsample_xyzi

SENSOR_HEIGHT = 1.73  # KITTI velodyne mount height above ground (m)


class Terrain(NamedTuple):
    """Smooth ground height field h(x, y) = sum_i amp_i * sin(kx_i x +
    ky_i y + phase_i): a few low-frequency octaves (wavelengths 15-90 m,
    total amplitude < ~1 m, max slope ~0.13) approximating gentle road
    crown / rolling terrain. Replaces the z=0 plane when present."""

    amp: np.ndarray    # (W,)
    kx: np.ndarray     # (W,)
    ky: np.ndarray     # (W,)
    phase: np.ndarray  # (W,)

    def height(self, x, y):
        x = np.asarray(x, np.float64)[..., None]
        y = np.asarray(y, np.float64)[..., None]
        return np.sum(self.amp * np.sin(self.kx * x + self.ky * y
                                        + self.phase), axis=-1)


def _centerline_y(params, x):
    """Corridor centerline y_c(x) = A sin(k x + phi); ``params`` = (A, k,
    phi). Single source of truth — make_scene seats primitives/clutter and
    trajectory() steers with the SAME formula, so changing the
    parameterization in one place moves everything together."""
    a, k, phi = params
    return a * np.sin(k * np.asarray(x, np.float64) + phi)


def _centerline_heading(params, x):
    """Tangent heading of the centerline at x (radians)."""
    a, k, phi = params
    return np.arctan(a * k * np.cos(k * np.asarray(x, np.float64) + phi))


class Scene(NamedTuple):
    """Primitive soup. boxes: (K, 6) cx, cy, yaw, half_w, half_d, height
    (z from 0); cylinders: (M, 4) cx, cy, radius, height. Ground plane z=0
    spans the whole scene.

    Enriched fields (all default-off so pre-enrichment seeds reproduce
    bit-for-bit): ``clutter`` — (C, 6) small boxes INSIDE the corridor
    (parked-car / bin scale occluders, same layout as ``boxes``);
    ``terrain`` — optional smooth ground height field; ``centerline`` —
    (A, k, phi) of the corridor curve y_c(x) = A sin(k x + phi) the
    primitives and trajectory follow (zeros = straight)."""

    boxes: np.ndarray
    cylinders: np.ndarray
    clutter: np.ndarray = np.zeros((0, 6))
    terrain: Terrain | None = None
    centerline: np.ndarray = np.zeros(3)

    def centerline_y(self, x):
        return _centerline_y(self.centerline, x)

    def centerline_heading(self, x):
        return _centerline_heading(self.centerline, x)

    def ground_z(self, x, y):
        if self.terrain is None:
            return np.zeros(np.broadcast(x, y).shape)
        return self.terrain.height(x, y)


def make_scene(
    rng: np.random.RandomState,
    corridor_length: float = 140.0,
    corridor_half_width: float = 6.0,
    n_boxes: int = 14,
    n_cylinders: int = 24,
    enrich: bool = False,
    n_clutter: int = 16,
) -> Scene:
    """Random street-like scene along a +x corridor the sensor drives down.

    Boxes (buildings) keep out of the corridor; cylinders (poles) may stand
    just outside it. Primitive size ranges loosely match urban blocks.

    ``enrich`` adds the realism axes the plain generator lacks (the
    round-4 "procedural ceiling" claim blamed surface/occlusion
    statistics — this is the knob that tests it): a curved corridor
    centerline, a non-planar ground height field, and parked-car/bin
    scale clutter boxes inside the corridor. The enrichment draws happen
    AFTER all plain draws, so ``enrich=False`` consumes the exact rng
    stream of the pre-enrichment generator (seed-addressed roots stay
    reproducible).
    """
    boxes = np.zeros((n_boxes, 6), np.float64)
    for i in range(n_boxes):
        half_w = rng.uniform(2.5, 10.0)
        half_d = rng.uniform(2.5, 10.0)
        cx = rng.uniform(-20.0, corridor_length + 20.0)
        # push the footprint fully outside the corridor
        clearance = corridor_half_width + max(half_w, half_d)
        cy = rng.choice([-1.0, 1.0]) * rng.uniform(clearance, clearance + 30.0)
        boxes[i] = [cx, cy, rng.uniform(0, np.pi), half_w, half_d,
                    rng.uniform(3.0, 12.0)]
    cyls = np.zeros((n_cylinders, 4), np.float64)
    for i in range(n_cylinders):
        cx = rng.uniform(-20.0, corridor_length + 20.0)
        cy = rng.choice([-1.0, 1.0]) * rng.uniform(
            corridor_half_width - 2.0, corridor_half_width + 14.0
        )
        cyls[i] = [cx, cy, rng.uniform(0.12, 0.45), rng.uniform(2.5, 8.0)]
    if not enrich:
        return Scene(boxes=boxes, cylinders=cyls)

    # corridor curvature: heading swings up to ~atan(A*k) ~ 20 deg
    amp = rng.uniform(4.0, 10.0)
    wavelength = rng.uniform(90.0, 150.0)
    centerline = np.array([amp, 2.0 * np.pi / wavelength, rng.uniform(0, 2 * np.pi)])

    # re-seat the straight-corridor primitives onto the curve (offsets were
    # drawn relative to a straight centerline; shifting by y_c keeps the
    # drawn clearances while the corridor bends)
    boxes[:, 1] += _centerline_y(centerline, boxes[:, 0])
    cyls[:, 1] += _centerline_y(centerline, cyls[:, 0])

    # rolling ground: 3 octaves, max slope ~0.13 (gentle road terrain)
    octaves = []
    for wl, amp_hi in ((90.0, 0.65), (45.0, 0.32), (18.0, 0.13)):
        theta = rng.uniform(0, 2 * np.pi)
        k = 2.0 * np.pi / (wl * rng.uniform(0.8, 1.25))
        octaves.append((rng.uniform(0.45, 1.0) * amp_hi,
                        k * np.cos(theta), k * np.sin(theta),
                        rng.uniform(0, 2 * np.pi)))
    terrain = Terrain(*(np.array(col) for col in zip(*octaves)))

    # in-corridor clutter: parked-car / bin scale boxes, roughly aligned
    # with the local corridor tangent, laterally clear of the sensor path
    # (trajectory drifts +-2 m around the centerline; clutter edges stay
    # >= ~2.4 m out)
    clutter = np.zeros((n_clutter, 6), np.float64)
    for i in range(n_clutter):
        cx = rng.uniform(-10.0, corridor_length + 10.0)
        lat = rng.choice([-1.0, 1.0]) * rng.uniform(3.4, corridor_half_width - 0.4)
        yaw = float(_centerline_heading(centerline, cx)) \
            + np.deg2rad(rng.uniform(-8.0, 8.0))
        half_w = rng.uniform(0.45, 1.0)   # lateral half extent
        half_d = rng.uniform(0.7, 2.3)    # along-corridor half extent
        clutter[i] = [cx, float(_centerline_y(centerline, cx)) + lat, yaw,
                      half_d, half_w, rng.uniform(0.8, 2.0)]
    return Scene(boxes=boxes, cylinders=cyls, clutter=clutter,
                 terrain=terrain, centerline=centerline)


def trajectory(
    rng: np.random.RandomState,
    n_frames: int,
    step: float = 10.0,
    scene: Scene | None = None,
) -> np.ndarray:
    """(n_frames, 4, 4) world-from-sensor poses along the corridor.

    ~`step` m forward per frame (the reference pairs KITTI frames >10 m
    apart, generate_kitti_pairs.py:116-133) with small lateral drift,
    heading change, and roll/pitch — enough that consecutive poses differ
    in all six DoF while staying inside the scene corridor.

    With an enriched ``scene`` the pose follows its curved centerline
    (lateral drift measured from y_c(x), heading from the tangent) and
    rides SENSOR_HEIGHT above its terrain — same per-frame rng draws as
    the plain path, so draw order is preserved either way.
    """
    from ..utils.se3_np import euler_zyx_matrix

    poses = np.zeros((n_frames, 4, 4), np.float64)
    for k in range(n_frames):
        x = k * step + rng.uniform(-1.0, 1.0)
        y = rng.uniform(-2.0, 2.0)
        yaw = np.deg2rad(rng.uniform(-8.0, 8.0))
        pitch = np.deg2rad(rng.uniform(-1.5, 1.5))
        roll = np.deg2rad(rng.uniform(-1.5, 1.5))
        z = SENSOR_HEIGHT + rng.uniform(-0.05, 0.05)
        if scene is not None:
            y += float(scene.centerline_y(x))
            yaw += float(scene.centerline_heading(x))
            z += float(scene.ground_z(x, y))
        m = np.eye(4)
        m[:3, :3] = euler_zyx_matrix(yaw, pitch, roll)
        m[:3, 3] = [x, y, z]
        poses[k] = m
    return poses


def _ray_dirs(n_rings: int, n_azimuths: int) -> np.ndarray:
    """(n_rings * n_azimuths, 3) unit directions in the sensor frame:
    HDL-64-like elevation fan (-24.8 deg .. +2 deg) x full azimuth sweep."""
    elev = np.deg2rad(np.linspace(-24.8, 2.0, n_rings))
    az = np.linspace(0.0, 2.0 * np.pi, n_azimuths, endpoint=False)
    e, a = np.meshgrid(elev, az, indexing="ij")
    d = np.stack(
        [np.cos(e) * np.cos(a), np.cos(e) * np.sin(a), np.sin(e)], axis=-1
    )
    return d.reshape(-1, 3)


def _intersect_boxes(o, d, boxes, z_lo=0.0):
    """Min positive hit distance per ray against yawed boxes. o: (3,),
    d: (R, 3), boxes: (K, 6). Returns (R,) t (inf = miss). ``z_lo``
    extends footprints downward (pass < 0 over non-planar terrain so
    boxes sit through the local ground instead of floating)."""
    t_best = np.full(len(d), np.inf)
    for cx, cy, yaw, hw, hd, h in boxes:
        c, s = np.cos(yaw), np.sin(yaw)
        rot = np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])
        ol = rot @ (o - np.array([cx, cy, 0.0]))
        dl = d @ rot.T
        lo = np.array([-hw, -hd, z_lo])
        hi = np.array([hw, hd, h])
        dl_safe = np.where(np.abs(dl) < 1e-12, 1e-12, dl)
        t1 = (lo - ol) / dl_safe
        t2 = (hi - ol) / dl_safe
        tnear = np.minimum(t1, t2).max(axis=1)
        tfar = np.maximum(t1, t2).min(axis=1)
        hit = (tnear <= tfar) & (tnear > 0.1)
        t_best = np.where(hit, np.minimum(t_best, tnear), t_best)
    return t_best


def _intersect_terrain(o, d, terrain, max_range):
    """Nearest intersection with the terrain height field by damped
    fixed-point iteration from the planar solution: t solves
    o_z + t d_z = h(o_xy + t d_xy). Gentle slopes (max ~0.13) against the
    LiDAR down-fan make this contraction converge in a few steps; rays
    whose residual never closes (grazing/upward) are treated as misses —
    every returned point lies ON the surface (residual-checked), so two
    scans of the same scene stay geometrically consistent. Returns (R,) t
    (inf = miss)."""
    down = d[:, 2] < -0.005
    dz = np.where(down, d[:, 2], -1.0)
    t = np.clip((terrain.height(o[0], o[1]) - o[2]) / dz, 0.2, 2.0 * max_range)
    for _ in range(12):
        x = o[0] + t * d[:, 0]
        y = o[1] + t * d[:, 1]
        t_new = np.clip((terrain.height(x, y) - o[2]) / dz, 0.2, 2.0 * max_range)
        t = 0.5 * (t + t_new)  # damping kills the grazing-ray oscillation
    resid = np.abs(o[2] + t * d[:, 2]
                   - terrain.height(o[0] + t * d[:, 0], o[1] + t * d[:, 1]))
    return np.where(down & (resid < 0.05), t, np.inf)


def _intersect_cylinders(o, d, cyls, z_lo=0.0):
    """Min positive hit distance per ray against vertical cylinders
    (side walls only). o: (3,), d: (R, 3), cyls: (M, 4) -> (R,) t.
    ``z_lo`` extends walls downward (non-planar terrain)."""
    if len(cyls) == 0:
        return np.full(len(d), np.inf)
    ox = o[0] - cyls[:, 0]  # (M,)
    oy = o[1] - cyls[:, 1]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]  # (R, 1)
    a = dx * dx + dy * dy  # (R, 1) broadcast to (R, M)
    b = 2.0 * (ox * dx + oy * dy)
    c = ox * ox + oy * oy - cyls[:, 2] ** 2
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    sq = np.sqrt(np.where(ok, disc, 0.0))
    a_safe = np.where(a < 1e-12, 1e-12, a)
    t = (-b - sq) / (2.0 * a_safe)  # nearest root (outside-in hit)
    z = o[2] + t * dz
    valid = ok & (t > 0.1) & (z >= z_lo) & (z <= cyls[:, 3])
    t = np.where(valid, t, np.inf)
    return t.min(axis=1)


def lidar_scan(
    scene: Scene,
    pose: np.ndarray,
    rng: np.random.RandomState,
    n_rings: int = 44,
    n_azimuths: int = 1100,
    max_range: float = 80.0,
    range_noise: float = 0.02,
    voxel_size: float = 0.3,
    fov_deg: float | None = None,
    dropout: float = 0.0,
) -> np.ndarray:
    """Render one scan from a world-from-sensor pose. Returns (N, 4) xyzi
    float32 in the SENSOR frame, voxel-downsampled at `voxel_size`.

    Each ray keeps the nearest positive intersection over {ground (z=0
    plane, or the scene's terrain height field when present), boxes,
    clutter, cylinders}; misses and hits beyond `max_range` are dropped,
    so two scans of the same scene from different poses have genuinely
    different occlusion shadows.

    ``fov_deg`` restricts the azimuthal field of view to a BODY-FIXED
    sector of that width centered on +x (forward): the MulRan sensors lose
    ~70 deg to the vehicle body (reference README.md:108 — pass 290), so
    the blocked sector rotates with the sensor and the pair overlap becomes
    viewpoint-asymmetric, the reference's hardest evaluation regime.

    ``dropout`` discards each return with probability
    ``dropout * (0.35 + 0.65 * (t / max_range))`` — the Velodyne-like
    range-weighted return loss (far/weak returns drop first). 0 draws
    nothing from ``rng``, preserving pre-enrichment rng streams.
    """
    rays = _ray_dirs(n_rings, n_azimuths)
    if fov_deg is not None:
        az = np.degrees(np.arctan2(rays[:, 1], rays[:, 0]))
        rays = rays[np.abs(az) <= fov_deg / 2.0]
    rot, org = pose[:3, :3], pose[:3, 3]
    d = rays @ rot.T  # world-frame directions
    if scene.terrain is not None:
        t_ground = _intersect_terrain(org, d, scene.terrain, max_range)
        z_lo = -2.5  # seat primitives through the +-1 m terrain relief
    else:
        with np.errstate(divide="ignore", invalid="ignore"):
            t_ground = np.where(d[:, 2] < -1e-9, -org[2] / d[:, 2], np.inf)
        z_lo = 0.0
    solids = (np.concatenate([scene.boxes, scene.clutter])
              if len(scene.clutter) else scene.boxes)
    t = np.minimum(t_ground, _intersect_boxes(org, d, solids, z_lo=z_lo))
    t = np.minimum(t, _intersect_cylinders(org, d, scene.cylinders, z_lo=z_lo))
    hit = np.isfinite(t) & (t < max_range)
    if dropout > 0.0:
        p = dropout * (0.35 + 0.65 * t[hit] / max_range)
        keep = rng.rand(hit.sum()) >= p
        hit[np.flatnonzero(hit)[~keep]] = False
    t = t[hit] + rng.randn(hit.sum()) * range_noise
    pts_world = org + t[:, None] * d[hit]
    pts_sensor = (pts_world - org) @ rot  # rot^T applied from the right
    # intensity: range-attenuated pseudo-reflectance (real datasets carry
    # intensity; the model's input features are all-ones so the value only
    # exercises the 4-column file schema)
    inten = (1.0 / (1.0 + t / 20.0)).astype(np.float32)
    scan = np.concatenate(
        [pts_sensor.astype(np.float32), inten[:, None]], axis=1
    )
    return voxel_downsample_xyzi(scan, voxel_size)


def procedural_sequence(
    seed: int,
    n_frames: int,
    n_rings: int = 44,
    n_azimuths: int = 1100,
    step: float = 10.0,
    fov_deg: float | None = None,
    enrich: bool = False,
    dropout: float = 0.0,
):
    """One scene + trajectory -> (scans, poses): scans[k] is the (N, 4)
    sensor-frame xyzi cloud at poses[k] (world-from-sensor 4x4).

    GT pair transform aligning frame j onto frame i (the datasets' GT-file
    convention, reference kitti/dataset.py:17-38) is
    ``inv(poses[i]) @ poses[j]``.

    ``enrich`` switches on the realism axes (curved corridor, non-planar
    terrain, in-corridor clutter — see ``make_scene``); ``dropout`` adds
    range-weighted return loss (see ``lidar_scan``). Defaults reproduce
    pre-enrichment roots bit-for-bit.
    """
    rng = np.random.RandomState(seed)
    scene = make_scene(rng, corridor_length=max(60.0, n_frames * step + 30.0),
                       enrich=enrich)
    poses = trajectory(rng, n_frames, step=step,
                       scene=scene if enrich else None)
    scans = [
        lidar_scan(scene, poses[k], rng, n_rings=n_rings,
                   n_azimuths=n_azimuths, fov_deg=fov_deg, dropout=dropout)
        for k in range(n_frames)
    ]
    return scans, poses
