"""Headless 3D visualization: PLY point-cloud dumps + rendered trajectory
views.

The reference's optional ``viz3d`` OpenGL windows (icp_odometry.py:209-240,
backend.py:258-260, replay.py:114-121) cannot exist headless; the equivalent
capability here is file-based: dump the registered map as a standard PLY
(openable in MeshLab/CloudCompare/Open3D) and render matplotlib 3D/top-down
trajectory+map views to PNG.
"""
from __future__ import annotations

import struct
from pathlib import Path
from typing import Optional

import numpy as np


def write_ply(file_path: str, points: np.ndarray,
              colors: Optional[np.ndarray] = None,
              binary: bool = True) -> None:
    """Writes an (N, 3) float cloud (+ optional (N, 3) uint8 colors) as PLY."""
    points = np.ascontiguousarray(np.asarray(points, np.float32))
    assert points.ndim == 2 and points.shape[1] == 3, points.shape
    n = points.shape[0]
    if colors is not None:
        colors = np.ascontiguousarray(np.asarray(colors))
        if colors.dtype != np.uint8:
            colors = np.clip(colors * 255.0, 0, 255).astype(np.uint8)
        assert colors.shape == (n, 3)

    header = ["ply",
              "format binary_little_endian 1.0" if binary
              else "format ascii 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header.append("end_header")

    path = Path(file_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if binary:
            if colors is None:
                f.write(points.tobytes())
            else:
                rec = np.zeros(n, dtype=[("xyz", np.float32, 3),
                                         ("rgb", np.uint8, 3)])
                rec["xyz"] = points
                rec["rgb"] = colors
                f.write(rec.tobytes())
        else:
            for i in range(n):
                row = f"{points[i, 0]} {points[i, 1]} {points[i, 2]}"
                if colors is not None:
                    row += f" {colors[i, 0]} {colors[i, 1]} {colors[i, 2]}"
                f.write((row + "\n").encode("ascii"))


def read_ply(file_path: str) -> np.ndarray:
    """Reads back the xyz of a PLY written by ``write_ply`` (for tests)."""
    with open(file_path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = int(next(h for h in header if h.startswith("element vertex"))
                .split()[-1])
        has_color = any("uchar red" in h for h in header)
        binary = any("binary" in h for h in header)
        if binary:
            if has_color:
                rec = np.frombuffer(
                    f.read(), dtype=[("xyz", np.float32, 3),
                                     ("rgb", np.uint8, 3)], count=n)
                return np.array(rec["xyz"])
            return np.frombuffer(f.read(), np.float32,
                                 count=3 * n).reshape(n, 3).copy()
        rows = [f.readline().split()[:3] for _ in range(n)]
        return np.asarray(rows, np.float32)


def aggregate_map_cloud(clouds: list, relative_poses: np.ndarray,
                        voxel_size: float = 0.2,
                        max_points: int = 2_000_000) -> np.ndarray:
    """Expresses per-frame clouds in the FIRST frame via the relative-pose
    chain and grid-samples the union (host-side numpy)."""
    absolute = np.eye(4)
    out = []
    for i, cloud in enumerate(clouds):
        if i > 0:
            absolute = absolute @ np.asarray(relative_poses[i], np.float64)
        pts = np.asarray(cloud, np.float64)[:, :3]
        out.append(pts @ absolute[:3, :3].T + absolute[:3, 3])
    merged = np.concatenate(out, axis=0)
    if voxel_size > 0:
        coords = np.floor(merged / voxel_size).astype(np.int64)
        _, first = np.unique(coords, axis=0, return_index=True)
        merged = merged[np.sort(first)]
    if merged.shape[0] > max_points:
        step = merged.shape[0] // max_points + 1
        merged = merged[::step]
    return merged.astype(np.float32)


def render_map_views(file_prefix: str, map_cloud: np.ndarray,
                     absolute_poses: Optional[np.ndarray] = None,
                     max_render_points: int = 200_000) -> list:
    """Renders a top-down and a 3D view of the map (+trajectory) to PNGs.

    Returns the list of written paths.  Matplotlib Agg -- fully headless.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = map_cloud
    if pts.shape[0] > max_render_points:
        pts = pts[:: pts.shape[0] // max_render_points + 1]
    z = pts[:, 2]
    zlo, zhi = np.quantile(z, 0.02), np.quantile(z, 0.98)
    written = []

    fig, ax = plt.subplots(figsize=(10, 10))
    ax.scatter(pts[:, 0], pts[:, 1], c=np.clip(z, zlo, zhi), s=0.3,
               cmap="viridis", linewidths=0)
    if absolute_poses is not None:
        t = np.asarray(absolute_poses)[:, :3, 3]
        ax.plot(t[:, 0], t[:, 1], "r-", linewidth=1.5, label="trajectory")
        ax.legend()
    ax.set_aspect("equal")
    ax.set_title("map (top-down, colored by z)")
    top = f"{file_prefix}_map_topdown.png"
    fig.savefig(top, dpi=120, bbox_inches="tight")
    plt.close(fig)
    written.append(top)

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=np.clip(z, zlo, zhi),
               s=0.2, cmap="viridis", linewidths=0)
    if absolute_poses is not None:
        t = np.asarray(absolute_poses)[:, :3, 3]
        ax.plot(t[:, 0], t[:, 1], t[:, 2], "r-", linewidth=1.5)
    ax.set_title("map (3D)")
    three_d = f"{file_prefix}_map_3d.png"
    fig.savefig(three_d, dpi=120, bbox_inches="tight")
    plt.close(fig)
    written.append(three_d)
    return written
