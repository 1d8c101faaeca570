"""Functional subset of torchvision.transforms used by the reference
(Resize, ToTensor, Normalize — /root/reference/dataset/kitti_mot.py:369-380)."""

from __future__ import annotations

import numpy as np
import torch


class Resize:
    def __init__(self, size):
        self.size = size  # (h, w)

    def __call__(self, im):
        from PIL import Image

        h, w = self.size
        return im.resize((w, h), Image.BILINEAR)


class ToTensor:
    def __call__(self, im):
        arr = np.asarray(im, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr.transpose(2, 0, 1).copy())


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std
