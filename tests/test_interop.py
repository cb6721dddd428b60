"""Reference .pth checkpoint import onto the flax pytree (train/interop.py).

The reference's real checkpoints are not available in this environment
(git-LFS missing, SURVEY.md §2.3), so these tests synthesize torch state
dicts with the reference's exact key naming (ME module attribute names,
nn.Sequential numbering, BatchNorm .bn wrapper, Linear [out, in] weights)
and verify every leaf lands in the right place with the right layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrcc_tpu.models import RobotNet, RobotNetSegmentation
from mrcc_tpu.sparse import build_hierarchy, voxelize
from mrcc_tpu.train.interop import import_pth_variables, import_state_dict


def _template(model):
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(1, 256, 3)),
                      jnp.float32) * 0.1
    mask = jnp.ones((1, 256), bool)
    vox, _, _ = voxelize(pts, pts, mask, 0.05, 128)
    levels = build_hierarchy(vox, 4, capacities=(64, 64, 64, 64))
    variables = model.init(jax.random.PRNGKey(0), vox.feats, levels)
    return variables, (vox, levels)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _torch_name(coll, path, bn_modules):
    """Inverse translation: flax path -> reference torch state-dict key."""
    parts = [p for p in path[:-1] if p != "unet"]
    leaf = path[-1]
    name = ".".join(parts)
    # sequential numbering / head renames
    import re

    name = re.sub(r"block(\d+)_(\d+)", r"block\1.\2", name)
    name = name.replace("downsample_conv", "downsample.0")
    name = name.replace("downsample_norm", "downsample.1")
    name = name.replace("output_bn", "output_layer.0")
    name = name.replace("pose_fc1", "pose_regression.0")
    name = name.replace("pose_fc2", "pose_regression.2")
    name = name.replace("regression_fc1.dense", "regression.0.linear")
    name = name.replace("regression_fc2.dense", "regression.2.linear")

    if tuple(p for p in path[:-1]) in bn_modules:
        field = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                 "var": "running_var"}[leaf]
        return f"{name}.bn.{field}"
    if leaf == "kernel" and "linear" in name:
        return f"{name}.weight"
    if leaf == "kernel" and "pose_regression" in name:
        return f"{name}.weight"
    return f"{name}.{leaf}"


def _synth_state_dict(variables):
    """Build a torch-style state dict covering every flax leaf with unique
    values, in the reference's on-disk layout."""
    rng = np.random.default_rng(7)
    bn_modules = {p[:-1] for p in _flatten(variables["batch_stats"])}
    state, expected = {}, {}
    for coll in ("params", "batch_stats"):
        for path, leaf in _flatten(variables[coll]).items():
            val = rng.normal(size=np.shape(leaf)).astype(np.float32)
            if path[-1] == "var":
                val = np.abs(val) + 0.1  # running variance must be positive
            expected[(coll, path)] = val
            key = _torch_name(coll, path, bn_modules)
            arr = val
            if key.endswith("linear.weight") or (
                    "pose_regression" in key and key.endswith("weight")):
                arr = val.T  # torch Linear stores [out, in]
            elif key.endswith(".kernel") and val.shape[0] == 1:
                arr = val[0]  # ME k=1 convs store 2-D kernels
            state[key] = arr
    return state, expected


class TestImport:
    @pytest.mark.parametrize("model", [
        RobotNetSegmentation(backbone="minkunet14A", in_channels=3,
                             num_classes=3),
        RobotNet(backbone="minkunet14A", in_channels=3, out_channels=7),
    ])
    def test_all_leaves_land(self, model):
        variables, _ = _template(model)
        state, expected = _synth_state_dict(variables)
        out = import_state_dict(state, variables, strict=True)
        for (coll, path), val in expected.items():
            got = out[coll]
            for k in path:
                got = got[k]
            np.testing.assert_allclose(np.asarray(got), val, rtol=1e-6,
                                       err_msg=f"{coll}:{'/'.join(path)}")

    def test_forward_runs_after_import(self):
        model = RobotNetSegmentation(backbone="minkunet14A", in_channels=3,
                                     num_classes=3)
        variables, (vox, levels) = _template(model)
        state, _ = _synth_state_dict(variables)
        out_vars = import_state_dict(state, variables, strict=True)
        out_vars = jax.tree_util.tree_map(jnp.asarray, out_vars)
        logits = model.apply(out_vars, vox.feats, levels)
        assert np.isfinite(np.asarray(logits)).all()

    def test_strict_rejects_unknown_keys(self):
        model = RobotNetSegmentation(backbone="minkunet14A", in_channels=3,
                                     num_classes=3)
        variables, _ = _template(model)
        state, _ = _synth_state_dict(variables)
        state["not.a.real.layer.weight"] = np.zeros((3, 3), np.float32)
        with pytest.raises(KeyError):
            import_state_dict(state, variables, strict=True)

    def test_pth_file_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        model = RobotNetSegmentation(backbone="minkunet14A", in_channels=3,
                                     num_classes=3)
        variables, _ = _template(model)
        state, expected = _synth_state_dict(variables)
        tstate = {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in state.items()}
        path = tmp_path / "seg-000000042.pth"
        torch.save({"epoch": 42, "model_state_dict": tstate,
                    "optimizer_state_dict": {}}, str(path))
        out = import_pth_variables(str(path), variables, strict=True)
        (coll, p), val = next(iter(expected.items()))
        got = out[coll]
        for k in p:
            got = got[k]
        np.testing.assert_allclose(np.asarray(got), val, rtol=1e-6)
