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


class Scene(NamedTuple):
    """Primitive soup. boxes: (K, 6) cx, cy, yaw, half_w, half_d, height
    (z from 0); cylinders: (M, 4) cx, cy, radius, height. Ground plane z=0
    spans the whole scene."""

    boxes: np.ndarray
    cylinders: np.ndarray


def make_scene(
    rng: np.random.RandomState,
    corridor_length: float = 140.0,
    corridor_half_width: float = 6.0,
    n_boxes: int = 14,
    n_cylinders: int = 24,
) -> Scene:
    """Random street-like scene along a +x corridor the sensor drives down.

    Boxes (buildings) keep out of the corridor; cylinders (poles) may stand
    just outside it. Primitive size ranges loosely match urban blocks.
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
    return Scene(boxes=boxes, cylinders=cyls)


def trajectory(
    rng: np.random.RandomState,
    n_frames: int,
    step: float = 10.0,
) -> np.ndarray:
    """(n_frames, 4, 4) world-from-sensor poses along the corridor.

    ~`step` m forward per frame (the reference pairs KITTI frames >10 m
    apart, generate_kitti_pairs.py:116-133) with small lateral drift,
    heading change, and roll/pitch — enough that consecutive poses differ
    in all six DoF while staying inside the scene corridor.
    """
    from ..utils.se3_np import euler_zyx_matrix

    poses = np.zeros((n_frames, 4, 4), np.float64)
    for k in range(n_frames):
        x = k * step + rng.uniform(-1.0, 1.0)
        y = rng.uniform(-2.0, 2.0)
        yaw = np.deg2rad(rng.uniform(-8.0, 8.0))
        pitch = np.deg2rad(rng.uniform(-1.5, 1.5))
        roll = np.deg2rad(rng.uniform(-1.5, 1.5))
        m = np.eye(4)
        m[:3, :3] = euler_zyx_matrix(yaw, pitch, roll)
        m[:3, 3] = [x, y, SENSOR_HEIGHT + rng.uniform(-0.05, 0.05)]
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


def _intersect_boxes(o, d, boxes):
    """Min positive hit distance per ray against yawed boxes. o: (3,),
    d: (R, 3), boxes: (K, 6). Returns (R,) t (inf = miss)."""
    t_best = np.full(len(d), np.inf)
    for cx, cy, yaw, hw, hd, h in boxes:
        c, s = np.cos(yaw), np.sin(yaw)
        rot = np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])
        ol = rot @ (o - np.array([cx, cy, 0.0]))
        dl = d @ rot.T
        lo = np.array([-hw, -hd, 0.0])
        hi = np.array([hw, hd, h])
        dl_safe = np.where(np.abs(dl) < 1e-12, 1e-12, dl)
        t1 = (lo - ol) / dl_safe
        t2 = (hi - ol) / dl_safe
        tnear = np.minimum(t1, t2).max(axis=1)
        tfar = np.maximum(t1, t2).min(axis=1)
        hit = (tnear <= tfar) & (tnear > 0.1)
        t_best = np.where(hit, np.minimum(t_best, tnear), t_best)
    return t_best


def _intersect_cylinders(o, d, cyls):
    """Min positive hit distance per ray against vertical cylinders
    (side walls only). o: (3,), d: (R, 3), cyls: (M, 4) -> (R,) t."""
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
    valid = ok & (t > 0.1) & (z >= 0.0) & (z <= cyls[:, 3])
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
) -> np.ndarray:
    """Render one scan from a world-from-sensor pose. Returns (N, 4) xyzi
    float32 in the SENSOR frame, voxel-downsampled at `voxel_size`.

    Each ray keeps the nearest positive intersection over {ground z=0,
    boxes, cylinders}; misses and hits beyond `max_range` are dropped, so
    two scans of the same scene from different poses have genuinely
    different occlusion shadows.

    ``fov_deg`` restricts the azimuthal field of view to a BODY-FIXED
    sector of that width centered on +x (forward): the MulRan sensors lose
    ~70 deg to the vehicle body (reference README.md:108 — pass 290), so
    the blocked sector rotates with the sensor and the pair overlap becomes
    viewpoint-asymmetric, the reference's hardest evaluation regime.
    """
    rays = _ray_dirs(n_rings, n_azimuths)
    if fov_deg is not None:
        az = np.degrees(np.arctan2(rays[:, 1], rays[:, 0]))
        rays = rays[np.abs(az) <= fov_deg / 2.0]
    rot, org = pose[:3, :3], pose[:3, 3]
    d = rays @ rot.T  # world-frame directions
    with np.errstate(divide="ignore", invalid="ignore"):
        t_ground = np.where(d[:, 2] < -1e-9, -org[2] / d[:, 2], np.inf)
    t = np.minimum(t_ground, _intersect_boxes(org, d, scene.boxes))
    t = np.minimum(t, _intersect_cylinders(org, d, scene.cylinders))
    hit = np.isfinite(t) & (t < max_range)
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
):
    """One scene + trajectory -> (scans, poses): scans[k] is the (N, 4)
    sensor-frame xyzi cloud at poses[k] (world-from-sensor 4x4).

    GT pair transform aligning frame j onto frame i (the datasets' GT-file
    convention, reference kitti/dataset.py:17-38) is
    ``inv(poses[i]) @ poses[j]``.
    """
    rng = np.random.RandomState(seed)
    scene = make_scene(rng, corridor_length=max(60.0, n_frames * step + 30.0))
    poses = trajectory(rng, n_frames, step=step)
    scans = [
        lidar_scan(scene, poses[k], rng, n_rings=n_rings,
                   n_azimuths=n_azimuths, fov_deg=fov_deg)
        for k in range(n_frames)
    ]
    return scans, poses
