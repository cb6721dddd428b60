"""Test/eval entry mains — one per reference test*.py script."""

from __future__ import annotations

import os

import numpy as np

from ..config import Config
from ..train import checkpoint as ckpt
from ..utils.logger import get_logger
from .common import ensure_dataset, exp_name_of, make_datasets, select_pose_model


def _load_variables(cfg, model, init_fn):
    """Restore model variables from TEST.checkpoint or the exp dir; fall
    back to fresh init (logged) so harnesses run self-contained."""
    variables = init_fn()
    test_ckpt = cfg()["TEST"].get("checkpoint")
    state_tmpl = {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})}
    restored, epoch = ckpt.checkpoint_restore(
        state_tmpl, cfg.exp_path, exp_name_of(cfg), f=test_ckpt)
    if epoch == 0:
        get_logger().warning("no checkpoint found; evaluating fresh init")
    return {"params": restored["params"],
            "batch_stats": restored["batch_stats"]}


def _init_on_sample(cfg, model, dataset, cap=2048):
    import jax
    import jax.numpy as jnp

    from ..sparse import build_hierarchy, voxelize

    item = next((dataset[i] for i in range(len(dataset))
                 if dataset[i] is not None), None)
    batch = dataset.collate([item])
    qsize = dataset.cfg.quantization_size

    @jax.jit
    def init_fn(key, points, feats, mask):
        vox, _, _ = voxelize(points, feats, mask, qsize, cap)
        levels = build_hierarchy(vox, 4, capacities=(cap, cap // 2, cap // 4,
                                                     cap // 8))
        return model.init(key, vox.feats, levels)

    return lambda: init_fn(jax.random.PRNGKey(0),
                           jnp.asarray(batch["points"]),
                           jnp.asarray(batch["feats"]),
                           jnp.asarray(batch["mask"]))


def test_pose(cfg: Config = None):
    """test.py parity: pose regression eval over the configured split."""
    from ..eval import evaluate_pose

    cfg = cfg or Config.from_args()
    model, _ = select_pose_model(cfg)
    data_cfg = cfg.data_config()
    split = cfg()["TEST"].get("split", "test")
    ds = make_datasets(cfg, data_cfg, splits=(split,))
    variables = _load_variables(cfg, model, _init_on_sample(cfg, model, ds))
    pv = (data_cfg.scale if cfg()["DATA"].get("voxelize_position") else 1.0)
    out = os.path.join(cfg.exp_path, f"result_{split}.json")
    res = evaluate_pose(model, variables, ds, position_voxelization=pv,
                        out_path=out)
    get_logger().info(f"pose eval -> {out}: "
                      f"{res['overall']}")
    return res


def test_segmentation(cfg: Config = None):
    """test_segmentation.py parity."""
    from ..eval import evaluate_segmentation
    from ..models import RobotNetSegmentation

    cfg = cfg or Config.from_args()
    d = cfg()["DATA"]
    model = RobotNetSegmentation(
        backbone=cfg()["STRUCTURE"].get("backbone", "minkunet"),
        in_channels=d.get("input_channel", 3),
        num_classes=d.get("classes", 3))
    data_cfg = cfg.data_config()
    data_cfg.data_type = None
    split = cfg()["TEST"].get("split", "test")
    ds = make_datasets(cfg, data_cfg, splits=(split,))
    variables = _load_variables(cfg, model, _init_on_sample(cfg, model, ds))
    out = os.path.join(cfg.exp_path, f"result_segmentation_{split}.json")
    res = evaluate_segmentation(model, variables, ds, out_path=out)
    get_logger().info(f"segmentation eval -> {out}: {res['overall']}")
    return res


def test_key_points(cfg: Config = None):
    """test_key_points.py parity (sparse path)."""
    from ..eval import evaluate_key_points
    from ..models import RobotNetSegmentation

    cfg = cfg or Config.from_args()
    d = cfg()["DATA"]
    data_cfg = cfg.data_config()
    data_cfg.keypoints_enabled = True
    data_cfg.data_type = "ee_seg"
    model = RobotNetSegmentation(
        backbone=cfg()["STRUCTURE"].get("backbone", "minkunet"),
        in_channels=d.get("input_channel", 3),
        num_classes=data_cfg.num_of_keypoints)
    split = cfg()["TEST"].get("split", "test")
    ds = make_datasets(cfg, data_cfg, splits=(split,))
    variables = _load_variables(cfg, model, _init_on_sample(cfg, model, ds))
    out = os.path.join(cfg.exp_path, f"result_key_points_{split}.json")
    res = evaluate_key_points(model, variables, ds,
                              num_keypoints=data_cfg.num_of_keypoints,
                              out_path=out)
    get_logger().info(f"keypoint eval -> {out}: {res['overall']}")
    return res


def test_vote(cfg: Config = None):
    """test_vote.py parity."""
    from ..eval import evaluate_vote
    from ..models import RobotNetVote

    cfg = cfg or Config.from_args()
    d = cfg()["DATA"]
    data_cfg = cfg.data_config()
    data_cfg.voting_enabled = True
    num_classes = 2 if data_cfg.data_type == "ee_seg" else 4
    model = RobotNetVote(
        backbone=cfg()["STRUCTURE"].get("backbone", "minkunet"),
        in_channels=d.get("input_channel", 3), num_classes=num_classes)
    split = cfg()["TEST"].get("split", "test")
    ds = make_datasets(cfg, data_cfg, splits=(split,))
    variables = _load_variables(cfg, model, _init_on_sample(cfg, model, ds))
    out = os.path.join(cfg.exp_path, f"result_vote_{split}.json")
    res = evaluate_vote(model, variables, ds,
                        ee_r=cfg()["PARAM"].get("ee_r", 0.02), out_path=out)
    get_logger().info(f"vote eval -> {out}: {res['overall']}")
    return res


def test_feature_extractor(cfg: Config = None):
    """test_feature-extractor.py parity: embedding quality (recall@1)."""
    import jax
    import jax.numpy as jnp

    from ..data.ycb import YCBDataset
    from ..models.featurenet import FeatureNet
    from ..sparse import build_hierarchy, voxelize
    from ..train.metric_learning import pairwise_dist

    cfg = cfg or Config.from_args()
    ds = YCBDataset(num_classes=8, samples_per_class=6, max_points=1024)
    model = FeatureNet(in_channels=3, out_channels=16, backbone="minkunet34A")
    cap = 1024
    caps = (cap, cap // 2, cap // 4, cap // 8)
    import jax

    @jax.jit
    def init_fn(key, points, feats, mask):
        vox, _, _ = voxelize(points, feats, mask, 1 / 200.0, cap)
        levels = build_hierarchy(vox, 4, capacities=caps)
        return model.init(key, vox.feats, levels)

    @jax.jit
    def embed_impl(variables, points, feats, mask):
        vox, _, _ = voxelize(points, feats, mask, 1 / 200.0, cap)
        levels = build_hierarchy(vox, 4, capacities=caps)
        return model.apply(variables, vox.feats, levels)

    def make_embed(variables):
        return lambda points, feats, mask: embed_impl(variables, points,
                                                      feats, mask)

    embs = []
    labels = []
    embed = None
    for batch in ds.batches(8, shuffle=False):
        points = jnp.asarray(batch["points"])
        feats = jnp.asarray(batch["feats"])
        mask = jnp.asarray(batch["mask"])
        if embed is None:
            variables = init_fn(jax.random.PRNGKey(0), points, feats, mask)
            state_tmpl = {"params": variables["params"],
                          "batch_stats": variables["batch_stats"]}
            restored, epoch = ckpt.checkpoint_restore(
                state_tmpl, cfg.exp_path, exp_name_of(cfg),
                f=cfg()["TEST"].get("checkpoint"))
            embed = make_embed({"params": restored["params"],
                                "batch_stats": restored["batch_stats"]})
        embs.append(np.asarray(embed(points, feats, mask)))
        labels.append(batch["labels"])
    embs = np.concatenate(embs)
    labels = np.concatenate(labels)
    d = np.array(pairwise_dist(jnp.asarray(embs)))  # writable copy
    np.fill_diagonal(d, np.inf)
    nn = d.argmin(axis=1)
    recall1 = float((labels[nn] == labels).mean())
    get_logger().info(f"feature-extractor recall@1: {recall1:.3f}")
    return {"recall@1": recall1}


def test_app(cfg: Config = None, n_samples=20):
    """app/test.py parity: full-pipeline benchmark + calibration report."""
    from ..app import InferenceConfig, InferenceEngine, SyntheticDataEngine
    from ..app.data_engine import PickleDataEngine
    from ..eval.benchmark import BenchmarkApp

    cfg = cfg or Config.from_args()
    icfg = cfg.inference_config()
    engine = InferenceEngine(icfg)
    source_path = cfg()["INFERENCE"].get("data_source")
    if source_path and all(os.path.isfile(p)
                           for p in str(source_path).split(",")):
        source = PickleDataEngine(source_path,
                                  split=cfg()["TEST"].get("split", "test"))
    else:
        source = SyntheticDataEngine()
    gt = cfg()["TEST"].get("gt_base_to_cam_pose")
    app = BenchmarkApp(engine, source, gt, n_samples=n_samples,
                       ignore_unconfident=cfg()["TEST"].get(
                           "ignore_unconfident", True))
    out = os.path.join(cfg.exp_path,
                       cfg()["TEST"].get("output", "test_results.xlsx"))
    res = app.run(out_path=out)
    get_logger().info(f"benchmark report -> {res['report']}")
    return res
