"""Regenerate the committed mini-EuRoC fixture (tests/fixtures/mini_euroc).

EuRoC ASL layout (`mav0/cam0/{data.csv,data/*.png}` + TUM ground truth),
120 frames of 240x180 uint8 imagery rendered from a textured-plane world
under true perspective — real gradients for the ORB front end, exact poses
for the evaluation gate (the reference's rosbag evaluation flow replayed
from files, `central_management_interface/main.py:270-317`).

The trajectory SWEEPS OUT (frames 0-59) and RETURNS along a laterally
offset path (frames 60-119) that re-observes the first segment's views:
the revisit exercises the place-recognition / loop-trigger path on
realistic imagery, not just synthetic in-memory worlds.

Run from the repo root:  python tools/make_mini_euroc.py
"""

import csv
import os

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "mini_euroc")
T0_NS = 1403636579763555584
N_FRAMES = 120
H, W = 180, 240
FX = FY = 200.0
CX, CY = 120.0, 90.0
FPS = 10.0


def revisit_trajectory(n=N_FRAMES):
    """Out-and-back camera path over the plane: the return pass re-observes
    the outbound views (lateral offset 0.06 m, matched heading)."""
    import jax.numpy as jnp
    from dvm_slam_tpu.geometry import lie

    poses_wc = []
    half = n // 2
    for i in range(n):
        if i < half:
            s = i / max(half - 1, 1)
            cx = 3.2 * np.sin(s * np.pi / 2)          # 0 -> 3.2, eased
            cz = 0.8 * s
            cy = 0.04 * np.sin(2 * np.pi * s)
            yaw = 0.12 * np.sin(s * np.pi)
        else:
            s = (i - half) / max(half - 1, 1)
            cx = 3.2 * np.cos(s * np.pi / 2)          # 3.2 -> 0
            cz = 0.8 * (1.0 - s) + 0.1
            cy = 0.06 + 0.04 * np.sin(2 * np.pi * s)
            yaw = -0.12 * np.sin(s * np.pi)
        q = np.asarray(lie.so3_exp(jnp.asarray([0.0, yaw, 0.0], jnp.float32)))
        T_wc = np.concatenate([q, [cx, cy, cz]]).astype(np.float32)
        poses_wc.append(T_wc)
    return poses_wc


def main():
    import jax.numpy as jnp
    from PIL import Image

    from dvm_slam_tpu.geometry import lie
    from dvm_slam_tpu.io import synthetic

    world = synthetic.PlaneWorld(seed=11, tex_size=2048, plane_z=6.0,
                                 extent=30.0)
    K = jnp.asarray([FX, FY, CX, CY], jnp.float32)
    data_dir = os.path.join(OUT, "mav0", "cam0", "data")
    os.makedirs(data_dir, exist_ok=True)
    for f in os.listdir(data_dir):
        os.unlink(os.path.join(data_dir, f))

    poses_wc = revisit_trajectory()
    rows = []
    gt_lines = ["# ts x y z qx qy qz qw"]
    for i, T_wc in enumerate(poses_wc):
        T_cw = np.asarray(lie.se3_inv(jnp.asarray(T_wc)))
        img = np.asarray(world.render(jnp.asarray(T_cw), K, H, W))
        img8 = np.clip(img, 0, 255).astype(np.uint8)
        ns = T0_NS + int(round(i * 1e9 / FPS))
        name = f"{ns}.png"
        Image.fromarray(img8).save(os.path.join(data_dir, name))
        rows.append((ns, name))
        qw, qx, qy, qz = T_wc[:4]
        x, y, z = T_wc[4:7]
        gt_lines.append(
            f"{ns / 1e9:.6f} {x:.6f} {y:.6f} {z:.6f} "
            f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}")

    with open(os.path.join(OUT, "mav0", "cam0", "data.csv"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["#timestamp [ns]", "filename"])
        for ns, name in rows:
            w.writerow([ns, name])
    with open(os.path.join(OUT, "gt_tum.txt"), "w") as f:
        f.write("\n".join(gt_lines) + "\n")
    print(f"wrote {len(rows)} frames to {data_dir}")


if __name__ == "__main__":
    main()
