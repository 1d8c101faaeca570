"""Result visualization: tracked-bbox video rendering and gradient-flow
plots (ref utils/visualize_mot.py, utils/gradients.py).

Host-side, OpenCV-based - visualization stays off the TPU path.
"""

from __future__ import annotations

import colorsys
import glob
import os
import random
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

KITTI_CATS = {"Pedestrian": 0, "Car": 1, "Cyclist": 2}


def generate_colors(n: int = 30, seed: int = 0):
    """n visually distinct RGB tuples (fills the role of the reference's
    track-color table, utils/visualize_mot.py:24-35, differently): walk the
    hue circle by the golden-ratio conjugate from a seeded start, alternating
    two value levels so neighboring track ids stay distinguishable at any n.
    """
    phi_conj = 0.6180339887498949
    hue = random.Random(seed).random()
    colors = []
    for i in range(max(n, 1)):
        hue = (hue + phi_conj) % 1.0
        value = 0.75 if i % 2 else 0.95
        rgb = colorsys.hsv_to_rgb(hue, 0.9, value)
        colors.append(tuple(int(round(255 * v)) for v in rgb))
    return colors


def parse_kitti_results(path: str) -> Tuple[Dict[int, List], int]:
    """result txt -> ({frame: [x1, y1, x2, y2, track, cat, score]}, max_track)."""
    frames = defaultdict(list)
    max_track = 0
    with open(path) as f:
        for line in f:
            t = line.strip().split(" ")
            frame, track = int(t[0]), int(t[1])
            cat = KITTI_CATS.get(t[2], 0)
            box = [float(t[6]), float(t[7]), float(t[8]), float(t[9])]
            frames[frame].append(box + [track, cat, float(t[17])])
            max_track = max(max_track, track)
    return frames, max_track


def draw_tracks(img, rows, colors):
    import cv2

    for r in rows:
        x1, y1, x2, y2, track = r[0], r[1], r[2], r[3], int(r[4])
        c = colors[track % len(colors)]
        cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), c, 2,
                      lineType=cv2.LINE_AA)
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        cv2.putText(img, str(track), (int(cx), int(cy)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, c, 1, lineType=cv2.LINE_AA)
    return img


def render_sequence_video(result_path: str, image_dir: str, out_path: str,
                          fps: float = 10.0, size=(1024, 375)):
    """Render one sequence's tracking video (ref visualize_mot.py:49-87)."""
    import cv2

    frames, max_track = parse_kitti_results(result_path)
    colors = generate_colors(max_track + 1)
    images = sorted(glob.glob(os.path.join(image_dir, "*.png")))
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    for frame_id, img_path in enumerate(images):
        img = cv2.imread(img_path)
        if img is None:
            continue
        draw_tracks(img, frames.get(frame_id, []), colors)
        writer.write(cv2.resize(img, size))
    writer.release()
    return out_path


def plot_grad_flow(grad_trees: List, out_path: str):
    """Average |grad| per parameter across one or more grad pytrees
    (ref utils/gradients.py:9-35).  Biases are skipped like the original."""
    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ave, boundaries, total = [], [], 0
    for tree in grad_trees:
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for kp, g in leaves:
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
            if g is None or "bias" in name or name.endswith("/b"):
                continue
            ave.append(float(np.mean(np.abs(np.asarray(g)))))
            total += 1
        boundaries.append(total)

    fig, ax = plt.subplots(figsize=(10, 5))
    ax.plot(ave, alpha=0.3, color="b")
    ax.hlines(0, 0, len(ave) + 1, linewidth=1, color="k")
    for b in boundaries[:-1]:
        ax.axvline(b, color="r", alpha=0.3)
    ax.set_xlim(0, max(len(ave), 1))
    ax.set_xlabel("Layers")
    ax.set_ylabel("Average Gradient Magnitude")
    ax.set_title("Gradient flow")
    ax.grid(True)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
