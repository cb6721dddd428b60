"""Reference-checkpoint interop: import torch ``.pth`` weights into the
flax parameter pytree.

The reference saves ``{epoch, model_state_dict, optimizer_state_dict}``
(utils/utils.py:62-126) where the model is a MinkowskiEngine network.  The
kernel layouts map 1:1 by construction:

- ``ME.MinkowskiConvolution.kernel`` is ``[K, Cin, Cout]`` — identical to
  our ``SparseConv*`` kernels (k=1 convs are stored 2-D ``[Cin, Cout]`` by
  ME and reshaped to ``[1, Cin, Cout]`` here).
- ``ME.MinkowskiBatchNorm`` wraps ``nn.BatchNorm1d`` as ``<name>.bn.*`` —
  weight/bias → scale/bias params, running_mean/var → batch_stats.
- ``torch.nn.Linear.weight`` is ``[out, in]`` → transposed to flax
  ``kernel [in, out]``; ``ME.MinkowskiLinear`` nests it as
  ``<name>.linear.*``.
- ``nn.Sequential`` children are numbered (``block1.0`` → ``block1_0``,
  ``downsample.0/1`` → ``downsample_conv``/``downsample_norm``,
  ``pose_regression.0/2`` → ``pose_fc1/2``,
  ``regression.0/2`` → ``regression_fc1/2``).

Kernel-offset enumeration order caveat: ME enumerates hypercube kernel
offsets in a fixed region-iterator order; ours is K3_OFFSETS /K2_OFFSETS
(x slowest, z fastest — sparse/hierarchy.py:38).  If an imported model's
convolutions appear rotated, pass ``k_perm`` mapping ME order → ours.
"""

from __future__ import annotations

import re
import typing

import numpy as np


# torch-key regex -> flax-path substitution (applied in order)
_RULES = [
    # containers / numbering
    (re.compile(r"^module\."), ""),
    (re.compile(r"\bblock(\d+)\.(\d+)\."), r"block\1_\2."),
    (re.compile(r"\bdownsample\.0\."), "downsample_conv."),
    (re.compile(r"\bdownsample\.1\."), "downsample_norm."),
    (re.compile(r"\boutput_layer\.0\."), "output_bn."),
    (re.compile(r"\bpose_regression\.0\."), "pose_fc1."),
    (re.compile(r"\bpose_regression\.2\."), "pose_fc2."),
    (re.compile(r"\bregression\.0\.linear\."), "regression_fc1.dense."),
    (re.compile(r"\bregression\.2\.linear\."), "regression_fc2.dense."),
    (re.compile(r"\blinear\."), "dense."),
]

_BACKBONE_PREFIXES = ("conv0p1s1", "bn0", "conv1p1s2", "bn1", "conv2p2s2",
                      "bn2", "conv3p4s2", "bn3", "conv4p8s2", "bn4", "block",
                      "convtr", "bntr", "final")


def _translate_key(key: str) -> typing.Optional[typing.Tuple[str, tuple]]:
    """Map one torch state-dict key to (collection, flax path tuple).

    Returns None for keys with no flax counterpart (num_batches_tracked).
    """
    if key.endswith("num_batches_tracked"):
        return None
    for pat, repl in _RULES:
        key = pat.sub(repl, key)

    # BatchNorm wrapper: <name>.bn.{weight,bias,running_mean,running_var}
    m = re.match(r"^(.*)\.bn\.(weight|bias|running_mean|running_var)$", key)
    if m:
        name, field = m.groups()
        path = tuple(name.split("."))
        if field == "weight":
            return "params", path + ("scale",)
        if field == "bias":
            return "params", path + ("bias",)
        if field == "running_mean":
            return "batch_stats", path + ("mean",)
        return "batch_stats", path + ("var",)

    if key.endswith(".kernel"):
        return "params", tuple(key.split("."))
    m = re.match(r"^(.*)\.(weight|bias)$", key)
    if m:
        name, field = m.groups()
        path = tuple(name.split("."))
        return "params", path + ("kernel" if field == "weight" else "bias",)
    return "params", tuple(key.split("."))


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def import_state_dict(state_dict, variables_template, k_perm=None,
                      strict: bool = True):
    """Map a torch state dict onto ``{"params", "batch_stats"}`` variables.

    Args:
      state_dict: ``{torch_key: array-like}`` (values may be torch tensors).
      variables_template: the flax variables dict whose structure/shapes the
        import must match (e.g. from ``model.init``).
      k_perm: optional ``[K]`` permutation applied to 3-D conv kernels'
        leading axis (ME offset order → K3_OFFSETS/K2_OFFSETS order).
      strict: raise on unmatched/mismatched keys instead of skipping.

    Returns a new variables dict with imported weights.
    """
    flat = {c: _flatten(variables_template.get(c, {}))
            for c in ("params", "batch_stats")}
    # backbone keys live under 'unet' in the RobotNet* wrappers
    has_unet = any(p and p[0] == "unet" for p in flat["params"])

    imported = {c: dict(f) for c, f in flat.items()}
    assigned = {c: set() for c in flat}
    unmatched = []
    for tkey, val in state_dict.items():
        tr = _translate_key(str(tkey))
        if tr is None:
            continue
        coll, path = tr
        if has_unet and path[0].startswith(_BACKBONE_PREFIXES):
            path = ("unet",) + path
        arr = np.asarray(getattr(val, "numpy", lambda: val)())
        target = flat[coll].get(path)
        if target is None:
            unmatched.append((str(tkey), coll, path))
            continue
        tshape = tuple(np.shape(target))
        if arr.ndim == 2 and len(tshape) == 3 and tshape[0] == 1:
            arr = arr[None]  # ME k=1 conv kernels are stored 2-D
        elif arr.ndim == 2 and arr.shape == tshape[::-1]:
            arr = arr.T      # torch Linear [out, in] -> flax [in, out]
        if k_perm is not None and arr.ndim == 3 and len(tshape) == 3:
            arr = arr[np.asarray(k_perm)]
        if arr.shape != tshape:
            unmatched.append((f"{tkey} shape {arr.shape} != {tshape}",
                              coll, path))
            continue
        imported[coll][path] = arr.astype(np.asarray(target).dtype)
        assigned[coll].add(path)
    if unmatched and strict:
        lines = "\n".join(f"  {k} -> {c}:{'/'.join(p)}"
                          for k, c, p in unmatched[:20])
        raise KeyError(f"{len(unmatched)} torch keys did not map onto the "
                       f"flax template:\n{lines}")
    # the reverse direction: template params that NO checkpoint key wrote
    # keep their random init — a silently-wrong model (ADVICE r2).  Under
    # strict, require every template param to have been assigned.
    missing = [(c, p) for c in ("params", "batch_stats")
               for p in flat[c] if p not in assigned[c]]
    if missing and strict:
        lines = "\n".join(f"  {c}:{'/'.join(p)}" for c, p in missing[:20])
        raise KeyError(
            f"{len(missing)} template parameters received no value from the "
            f"checkpoint (pass strict=False to keep their init):\n{lines}")
    out = {c: _unflatten(f) for c, f in imported.items()}
    for c in variables_template:
        out.setdefault(c, variables_template[c])
    return out


def import_pth_variables(path: str, variables_template, k_perm=None,
                         strict: bool = True):
    """Load a reference ``.pth`` checkpoint file and import its weights.

    Accepts both the reference's ``{"model_state_dict": ...}`` wrapper
    (utils/utils.py:67) and a bare state dict.
    """
    import torch

    try:
        # .pth files come from the untrusted upstream ecosystem; the
        # weights-only loader refuses pickled code execution
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # legacy pickles (e.g. wrapped in custom classes) need the unsafe
        # loader — only reached after the safe one failed
        blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model_state_dict", blob) if isinstance(blob, dict) \
        else blob
    return import_state_dict(state, variables_template, k_perm=k_perm,
                             strict=strict)
