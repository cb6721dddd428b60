"""Checkpoint save/restore with the reference's naming & retention semantics.

Parity: /root/reference/utils/utils.py:62-126 (``checkpoint_save`` /
``checkpoint_restore``): files named ``{exp_name}-%09d.ckpt`` per epoch,
restore auto-picks the latest by sorted glob, retention keeps power-of-2 and
save_freq-multiple epochs and deletes the previously saved one otherwise.

Serialization uses flax.serialization msgpack over the full train-state
pytree (params + batch_stats + opt_state) — the orbax-style single-file
equivalent of the reference's torch ``.pth``.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Tuple

import flax.serialization
import jax
import numpy as np


def is_power2(num: int) -> bool:
    return num != 0 and ((num & (num - 1)) == 0)


def is_multiple(num: int, multiple: int) -> bool:
    return num != 0 and num % multiple == 0


def _path(exp_path: str, exp_name: str, epoch: int) -> str:
    return os.path.join(exp_path, f"{exp_name}-{epoch:09d}.ckpt")


def checkpoint_save(state, exp_path: str, exp_name: str, epoch: int,
                    save_freq: int = 16) -> str:
    """Save the train-state pytree; prune the previous epoch unless it is a
    power of 2 or a save_freq multiple (utils.py:79-84)."""
    os.makedirs(exp_path, exist_ok=True)
    state = jax.device_get(state)
    path = _path(exp_path, exp_name, epoch)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(state))

    # retention: delete epoch-1 file unless it should be kept
    prev = epoch - 1
    if prev > 0 and not (is_multiple(prev, save_freq) or is_power2(prev)):
        prev_path = _path(exp_path, exp_name, prev)
        if os.path.isfile(prev_path):
            os.remove(prev_path)
    return path


def latest_checkpoint(exp_path: str, exp_name: str) -> Optional[str]:
    paths = sorted(glob.glob(os.path.join(exp_path, f"{exp_name}-*.ckpt")))
    return paths[-1] if paths else None


def checkpoint_restore(state_template, exp_path: str, exp_name: str,
                       f: Optional[str] = None) -> Tuple[object, int]:
    """Restore into a same-structure template; returns (state, epoch).

    ``f`` overrides the file path (like the reference's ``f=`` arg).  With no
    checkpoint found, returns (template, 0) — mirroring the reference's
    epoch=-1/0 semantics of "start from scratch".
    """
    path = f or latest_checkpoint(exp_path, exp_name)
    if path is None or not os.path.isfile(path):
        return state_template, 0
    with open(path, "rb") as f_in:
        state = flax.serialization.from_bytes(state_template, f_in.read())
    epoch = int(os.path.basename(path).rsplit("-", 1)[-1].split(".")[0])
    return state, epoch
