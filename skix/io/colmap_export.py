"""COLMAP text-format export of cameras / poses / points.

Capability parity with the reference's pycolmap export path (SURVEY.md
§2.6: vggt/vggt/dependency/ vggsfm tracker + pycolmap export) at the
interchange level: writes the standard COLMAP sparse-model text triplet
(cameras.txt, images.txt, points3D.txt) readable by COLMAP/nerfstudio/
gsplat tooling.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from skix.geometry.rotations import matrix_to_quat


def export_colmap_text(
    out_dir: str | Path,
    K,                      # (3, 3) shared PINHOLE intrinsics
    image_hw,               # (H, W)
    Rs,                     # (N, 3, 3) world→camera
    ts,                     # (N, 3)
    image_names: Optional[Sequence[str]] = None,
    points3d: Optional[np.ndarray] = None,   # (P, 3)
    point_colors: Optional[np.ndarray] = None,  # (P, 3) uint8
) -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    K = np.asarray(K)
    H, W = image_hw
    Rs = np.asarray(Rs)
    ts = np.asarray(ts)
    N = len(Rs)
    names = (list(image_names) if image_names is not None
             else [f"frame_{i:06d}.png" for i in range(N)])

    with open(out_dir / "cameras.txt", "w") as f:
        f.write("# Camera list: CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        f.write(f"1 PINHOLE {W} {H} {K[0, 0]:.6f} {K[1, 1]:.6f} "
                f"{K[0, 2]:.6f} {K[1, 2]:.6f}\n")

    with open(out_dir / "images.txt", "w") as f:
        f.write("# Image list: IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, "
                "CAMERA_ID, NAME\n#   POINTS2D[] as (X, Y, POINT3D_ID)\n")
        quats = np.asarray(matrix_to_quat(Rs))
        for i in range(N):
            qw, qx, qy, qz = quats[i]
            tx, ty, tz = ts[i]
            f.write(f"{i + 1} {qw:.8f} {qx:.8f} {qy:.8f} {qz:.8f} "
                    f"{tx:.8f} {ty:.8f} {tz:.8f} 1 {names[i]}\n\n")

    with open(out_dir / "points3D.txt", "w") as f:
        f.write("# 3D point list: POINT3D_ID, X, Y, Z, R, G, B, ERROR, "
                "TRACK[] as (IMAGE_ID, POINT2D_IDX)\n")
        if points3d is not None:
            pts = np.asarray(points3d)
            cols = (np.asarray(point_colors) if point_colors is not None
                    else np.full((len(pts), 3), 128, np.uint8))
            for i, (p, c) in enumerate(zip(pts, cols)):
                f.write(f"{i + 1} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        f"{int(c[0])} {int(c[1])} {int(c[2])} 0.0\n")
    return out_dir


def read_colmap_images_txt(path: str | Path):
    """Parse images.txt back to (quats (N,4) wxyz, ts (N,3), names) — for
    round-trip validation."""
    quats, ts, names = [], [], []
    lines = [ln for ln in Path(path).read_text().splitlines()
             if ln and not ln.startswith("#")]
    for ln in lines[::2] if len(lines) % 2 == 0 else lines:
        parts = ln.split()
        if len(parts) < 10:
            continue
        quats.append([float(x) for x in parts[1:5]])
        ts.append([float(x) for x in parts[5:8]])
        names.append(parts[9])
    return np.asarray(quats), np.asarray(ts), names
