"""AliveV1 dataset: the older tuple-pickle schema.

Parity: /root/reference/data/alivev1.py — samples stored as tuples
``(points, rgb, labels, instance_labels, pose)`` with a full_scale crop.
Loads through the same padded pipeline as AliveV2 (load_sample already
normalises tuple pickles to the dict schema); this subclass adds the v1
full-scale crop behaviour (alivev1.py:18-60).
"""

from __future__ import annotations

import numpy as np

from .dataset import AliveV2Dataset, DataConfig


class AliveV1Dataset(AliveV2Dataset):
    def __init__(self, *args, full_scale=(128, 512), **kw):
        super().__init__(*args, **kw)
        self.full_scale = full_scale

    def __getitem__(self, i):
        item = super().__getitem__(i)
        if item is None:
            return None
        # v1 crop: clip voxel extent to full_scale around the origin
        # (alivev1.py keeps points whose scaled coords fall inside the grid)
        scale = self.cfg.scale
        lim = self.full_scale[1] / 2.0 / scale
        m = np.all(np.abs(item["points"]) < lim, axis=-1)
        if m.sum() < 1:
            return None
        for k in ("points", "feats", "labels"):
            item[k] = item[k][m]
        return item
