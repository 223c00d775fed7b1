"""Exporters: TUM-style pose logs, binary PLY point clouds, segmentation PNGs —
format-compatible with the reference's export hooks so martinruenz/dataset-tools
evaluation scripts work unchanged.

Reference formats:
  * poses-<id>.txt: `ts x y z qx qy qz qw` per line (CoFusion::exportPoses,
    Core/CoFusion.cpp:758-783; pose assembly :502-519 — camera poses are
    cam->world, object poses are P_cam * P_obj^-1);
  * cloud-<id>.ply: binary_little_endian; float x,y,z; uchar r,g,b; float
    nx,ny,nz, radius; only surfels above the model's confidence threshold;
    normals exported FLIPPED (Core/CoFusion.cpp:646-756, flip at :711-713);
  * segmentation PNGs: mask ids as 8-bit gray, Mask####.png (CoFusion.cpp:235-240).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from cofusion_tpu.ops import lie


def pose_to_tum_line(timestamp, pose: np.ndarray) -> str:
    t = pose[:3, 3]
    q = np.asarray(lie.rotmat_to_quat(pose[:3, :3]))
    vals = [t[0], t[1], t[2], q[0], q[1], q[2], q[3]]
    return str(timestamp) + " " + " ".join(_fmt_float(v) for v in vals)


def _fmt_float(v: float) -> str:
    # mimic default C++ operator<< float formatting (6 significant digits)
    return f"{float(v):.6g}"


def export_poses(path: str, pose_log: list[tuple[int, np.ndarray]], model: int, export_dir: str) -> str:
    """Write poses-<model>.txt.  `pose_log` entries: (timestamp, (M,4,4) poses).
    For model > 0 the caller must already have composed P_cam * P_obj^-1."""
    os.makedirs(export_dir, exist_ok=True)
    filename = os.path.join(export_dir, f"poses-{model}.txt")
    with open(filename, "w") as fs:
        for ts, poses in pose_log:
            fs.write(pose_to_tum_line(ts, poses[model]) + "\n")
    return filename


def load_tum_trajectory(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Returns (timestamps (T,), poses (T,4,4)) from a TUM `ts x y z qx qy qz qw`
    file (GroundTruthOdometry input format, GUI/Tools/GroundTruthOdometry.cpp:25-57
    uses comma-separated; exported logs use spaces — accept both)."""
    ts, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            if len(parts) < 8:
                continue
            ts.append(float(parts[0]))
            x, y, z, qx, qy, qz, qw = map(float, parts[1:8])
            T = np.eye(4, dtype=np.float64)
            T[:3, :3] = np.asarray(lie.quat_to_rotmat(np.array([qx, qy, qz, qw], np.float32)))
            T[:3, 3] = (x, y, z)
            poses.append(T)
    return np.asarray(ts), np.asarray(poses)


def export_ply(
    path: str,
    surfels: dict,
    conf_threshold: float,
    transform: np.ndarray | None = None,
) -> int:
    """Write a reference-format binary PLY.  `surfels` is
    models.surfel_model.download() output; returns the number of points written.

    `transform`: the Tp = P_global * P_model^-1 object-to-world transform
    (CoFusion.cpp:695-698); normals are transformed and flipped like the
    reference (:702-713)."""
    conf = surfels["conf"]
    keep = conf > conf_threshold
    pos = surfels["pos"][keep].astype(np.float32)
    col = np.clip(surfels["color"][keep], 0, 255).astype(np.uint8)
    nor = surfels["normal"][keep].astype(np.float32)
    rad = surfels["radius"][keep].astype(np.float32)
    if transform is not None:
        R, t = transform[:3, :3].astype(np.float32), transform[:3, 3].astype(np.float32)
        pos = pos @ R.T + t
        nor = nor @ np.linalg.inv(R).astype(np.float32)  # inverse-transpose^T
    nor = -nor  # reference flips exported normals (CoFusion.cpp:711-713)

    n = pos.shape[0]
    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "property float radius\n"
        "end_header\n"
    )
    rec = struct.Struct("<fffBBBffff")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        buf = bytearray()
        for i in range(n):
            buf += rec.pack(
                pos[i, 0], pos[i, 1], pos[i, 2],
                col[i, 0], col[i, 1], col[i, 2],
                nor[i, 0], nor[i, 1], nor[i, 2], rad[i],
            )
        f.write(bytes(buf))
    return n


def read_ply(path: str) -> dict:
    """Read back a reference-format PLY (for tests / round-tripping)."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        n = int([l for l in header.decode().splitlines() if l.startswith("element vertex")][0].split()[-1])
        rec = struct.Struct("<fffBBBffff")
        data = f.read(rec.size * n)
    pos = np.zeros((n, 3), np.float32)
    col = np.zeros((n, 3), np.uint8)
    nor = np.zeros((n, 3), np.float32)
    rad = np.zeros((n,), np.float32)
    for i in range(n):
        vals = rec.unpack_from(data, i * rec.size)
        pos[i] = vals[0:3]
        col[i] = vals[3:6]
        nor[i] = vals[6:9]
        rad[i] = vals[9]
    return {"pos": pos, "color": col, "normal": nor, "radius": rad}


def export_mask_png(path: str, mask: np.ndarray) -> None:
    """Segmentation export (-es flag; CoFusion.cpp:235-240): ids as 8-bit gray;
    suppressed 255 labels are zeroed like the reference's THRESH_TOZERO_INV at
    254."""
    import cv2

    m = mask.astype(np.uint8)
    m = np.where(m > 254, 0, m).astype(np.uint8)
    cv2.imwrite(path, m)


# per-model label colors (Core/Shaders/color_table.glsl, 31 entries; label 0 =
# dark background, suppressed 255 -> black)
_COLOR_TABLE = np.array(
    [
        (0.1, 0.1, 0.1), (0, 0, 1), (1, 0, 0), (0, 1, 0), (1, 0.10, 0.72),
        (1, 0.82, 0), (0, 0.51, 0.96), (0, 0.55, 0.27), (0.65, 0.37, 0.24),
        (0.31, 0, 0.41), (0, 1, 0.96), (0.24, 0.48, 0.55), (0.93, 0.65, 1),
        (0.82, 1, 0.58), (0.72, 0.31, 1), (0.89, 0.10, 0.34), (0.51, 0.51, 0),
        (0, 1, 0.58), (0.37, 0, 0.17), (0.96, 0.51, 0.06), (0.79, 1, 0),
        (0.17, 0.24, 0), (0, 0.20, 0.75), (1, 0.79, 0.51), (0, 0.17, 0.37),
        (0.62, 0.44, 0.55), (0.31, 0.72, 0.06), (0.62, 0.75, 1),
        (0.58, 0.62, 0.48), (1, 0.48, 0.68), (0.62, 0.03, 0),
    ],
    np.float32,
)


def colorize_labels(mask: np.ndarray) -> np.ndarray:
    """Label ids -> RGB uint8 per color_table.glsl; 255 (suppressed) -> black."""
    ids = mask.astype(np.int64) % len(_COLOR_TABLE)
    rgb = (_COLOR_TABLE[ids] * 255.0).astype(np.uint8)
    return np.where((mask == 255)[..., None], np.uint8(0), rgb)


def export_label_png(path: str, mask: np.ndarray) -> None:
    """-el export: colorized label image (GUI/MainController.cpp:394-397 renders
    the scene in DRAW_LABEL mode; headless equivalent = colorized mask)."""
    import cv2

    cv2.imwrite(path, colorize_labels(mask)[..., ::-1])


def export_normal_png(path: str, normal: np.ndarray, valid: np.ndarray) -> None:
    """-en export: normals as RGB (n*0.5+0.5, the usual normal-map encoding the
    reference's DRAW_NORMALS shader path uses)."""
    import cv2

    img = np.clip((normal * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
    img = np.where(valid[..., None], img, np.uint8(0))
    cv2.imwrite(path, img[..., ::-1])


def export_viewport_png(path: str, image: np.ndarray, valid: np.ndarray | None = None) -> None:
    """-ev export: predicted RGB view of the global model
    (GUI/MainController.cpp:404-407)."""
    import cv2

    img = np.clip(image, 0, 255).astype(np.uint8)
    if valid is not None:
        img = np.where(valid[..., None], img, np.uint8(0))
    cv2.imwrite(path, img[..., ::-1])


def ate_rmse(est: np.ndarray, gt: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE (TUM benchmark metric) with optional SE(3)
    alignment (Horn/umeyama on the translation tracks) — the metric used by
    dataset-tools to evaluate the reference's `-ep` exports."""
    p = np.asarray([T[:3, 3] for T in est])
    q = np.asarray([T[:3, 3] for T in gt])
    if align and len(p) >= 3:
        mp, mq = p.mean(0), q.mean(0)
        pc, qc = p - mp, q - mq
        U, _, Vt = np.linalg.svd(pc.T @ qc)
        S = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
        R = (U @ S @ Vt).T
        p = (p - mp) @ R.T + mq
    return float(np.sqrt(np.mean(np.sum((p - q) ** 2, axis=1))))
