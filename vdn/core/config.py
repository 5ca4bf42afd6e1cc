"""Master experiment config: the reference's switchboard, made live.

The reference ships a legacy master config (reference
configs/config.yaml:1-213) with experiment/wandb/model/loss/training/
dataset switches — but nothing in the reference actually loads it (the
scripts are argparse-driven; ``grep -rn "configs/config.yaml"`` over the
reference *.py files finds no loader).  vdn implements the switchboard
for real: ``--config configs/config.yaml`` on the train CLIs overlays
the file's values onto the argparse defaults, with explicitly-passed
CLI flags still winning.

The ``datasets:`` + ``dataset_common:`` sections use the same shape the
dataset factory consumes (reference data/dataset_factory.py:18-161), so
the master config file doubles as the ``--dataset-config`` and the
``enabled:`` flags become the dataset selection.
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, List, Optional, Sequence

import yaml

__all__ = ["load_master_config", "enabled_datasets", "overlay_args"]


def load_master_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if not isinstance(cfg, dict):
        raise ValueError(f"master config {path!r} is not a mapping")
    return cfg


def enabled_datasets(cfg: Dict[str, Any]) -> List[str]:
    """Keys with ``enabled: true`` in the ``datasets:`` switchboard
    (reference config.yaml:76-200: per-dataset ``enabled``/``class_name``
    switches).  The key doubles as the factory lookup name, so the
    master config's datasets section is directly loadable by
    ``create_datasets`` (vdn/data/factory.py:53-87)."""
    return [name for name, dcfg in (cfg.get("datasets") or {}).items()
            if dcfg.get("enabled", False)]


def _get(cfg: Dict[str, Any], *path, default=None):
    node: Any = cfg
    for key in path:
        if not isinstance(node, dict) or key not in node:
            return default
        node = node[key]
    return node


def _loss_weight_defaults(cfg: Dict[str, Any], supported: Dict[str, str],
                          defaults: Dict[str, Any]) -> None:
    """Map the ``loss_weights:`` block (reference config.yaml:53-58) onto
    trainer kwargs.  ``affine_invariant`` is the base objective's weight
    and must stay 1.0 (the vdn loss stack fixes it, like the reference
    VideoDepthLoss); unsupported non-zero weights warn rather than fail
    so legacy configs still load."""
    weights = cfg.get("loss_weights") or {}
    for key, value in weights.items():
        if key == "affine_invariant":
            if float(value) != 1.0:
                warnings.warn(
                    "loss_weights.affine_invariant is fixed at 1.0 (the "
                    "base objective); other terms scale relative to it")
            continue
        if key in supported:
            defaults[supported[key]] = float(value)
        elif float(value) != 0.0:
            warnings.warn(f"loss_weights.{key}={value} is not supported "
                          "by this trainer and was ignored")


def overlay_args(parser, cfg: Dict[str, Any], family: str,
                 argv: Optional[Sequence[str]] = None) -> None:
    """Overlay master-config values as new argparse defaults.

    ``family`` is ``"v1"`` (research depth+normal harness, reference
    scripts/train.py) or ``"refine"`` (v2..v5 refinement harness,
    reference scripts/train_v4.py).  Explicit CLI flags passed in
    ``argv`` still override because defaults only apply to absent flags.
    """
    defaults: Dict[str, Any] = {}

    name = _get(cfg, "experiment", "name")
    if name:
        defaults["run_name"] = str(name)
    if _get(cfg, "wandb", "enabled", default=False):
        defaults["use_wandb"] = True
    seed = _get(cfg, "environment", "seed")
    if seed is not None:
        defaults["seed"] = int(seed)

    tr = cfg.get("training") or {}
    for src, dst in (("batch_size", "batch_size"),
                     ("learning_rate", "initial_lr"),
                     ("num_epochs", "epochs"),
                     ("save_model_interval", "save_interval"),
                     ("eval_interval", "val_interval"),
                     ("resume", "resume")):
        if src in tr:
            defaults[dst] = tr[src]

    log = cfg.get("logging") or {}
    if "log_dir" in log:
        defaults["log_dir"] = log["log_dir"]
    if "checkpoint_dir" in log:
        defaults["checkpoint_dir"] = log["checkpoint_dir"]

    model = cfg.get("model") or {}
    if family == "v1":
        # reference config model.version: "v1" (dino) / "v2" (hiera).
        # The research model the config drives is hiera-only — the dino
        # import in reference models/video_depth_model.py:12 is unused —
        # so only the hiera mode is real.
        version = model.get("version", "v2")
        if version == "v1":
            raise ValueError(
                "model.version 'v1' (dino research encoder) is dead in "
                "the reference (video_depth_model.py assembles Hiera "
                "encoders only); use version 'v2' with an "
                "encoder_model hiera_* name")
        if "encoder_model" in model:
            defaults["encoder"] = model["encoder_model"]
        if "attention_feature_levels" in model:
            defaults["attention_levels"] = ",".join(
                str(v) for v in model["attention_feature_levels"])
        if model.get("prediction_mode") == "depth":
            defaults["use_residual"] = False
        _loss_weight_defaults(cfg, {"tgm_loss": "stable_scale",
                                    "normal_l1": "normal_loss_scale"},
                              defaults)
    elif family == "refine":
        version = model.get("version", 4)
        if isinstance(version, str):
            version = int(version.lstrip("v"))
        defaults["model_version"] = int(version)
        if "encoder_model" in model:
            defaults["encoder"] = model["encoder_model"]
        _loss_weight_defaults(cfg, {"tgm_loss": "stable_scale",
                                    "depth_ssim": "ssim_loss_scale"},
                              defaults)
    else:
        raise ValueError(f"unknown trainer family {family!r}")

    known = {a.dest for a in parser._actions}
    unknown = set(defaults) - known
    if unknown:
        raise ValueError(f"master config mapped onto unknown CLI args: "
                         f"{sorted(unknown)}")
    parser.set_defaults(**defaults)
