"""CLI integration: torch checkpoint -> conversion -> inference -> files."""

import json
import os

import cv2
import numpy as np
import pytest
import torch

from tests import _reference

_reference.add_reference_to_path()


@pytest.mark.slow
def test_run_image_cli(tmp_path):
    from depth_anything_v2.depth_anything_v2 import DepthAnythingV2 as RefDA2
    torch.manual_seed(0)
    ref = RefDA2(encoder="vits", features=64,
                 out_channels=[48, 96, 192, 384]).eval()
    ckpt = tmp_path / "da2_vits.pth"
    torch.save(ref.state_dict(), str(ckpt))

    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    cv2.imwrite(str(img_dir / "a.png"),
                rng.integers(0, 255, (70, 70, 3), np.uint8))

    outdir = tmp_path / "out"
    from vdn.cli.run import main
    # vits preset uses features=64 / out=[48,96,192,384] == this checkpoint
    main(["--img-path", str(img_dir), "--encoder", "vits",
          "--checkpoint", str(ckpt), "--outdir", str(outdir),
          "--input-size", "56", "--pred-only", "--compute-dtype", "fp32"])
    assert (outdir / "a.png").exists()
    vis = cv2.imread(str(outdir / "a.png"))
    assert vis.shape == (70, 70, 3)


@pytest.mark.slow
def test_run_video_cli_streaming(tmp_path):
    from video_depth_anything.video_depth_stream import (
        VideoDepthAnything as RefVDA)
    torch.manual_seed(0)
    ref = RefVDA(encoder="vits", features=64,
                 out_channels=[48, 96, 192, 384]).eval()
    ckpt = tmp_path / "vda_vits.pth"
    torch.save(ref.state_dict(), str(ckpt))

    # synthetic 4-frame video
    video = tmp_path / "in.mp4"
    w = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 8,
                        (64, 64))
    rng = np.random.default_rng(1)
    for _ in range(4):
        w.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    w.release()

    outdir = tmp_path / "out"
    from vdn.cli.run_video import main
    main(["--video-path", str(video), "--encoder", "vits",
          "--checkpoint", str(ckpt), "--outdir", str(outdir),
          "--input-size", "56", "--streaming", "--compute-dtype", "fp32"])
    depths = np.load(outdir / "in_depths.npy")
    assert depths.shape == (4, 64, 64)
    assert (outdir / "in_vis.mp4").exists()


def test_app_demo_roundtrip():
    """Web demo serves an image -> depth round trip (reference app.py)."""
    import base64
    import json
    import urllib.request

    import cv2

    from vdn.cli.app import build_pipeline, serve

    pipe = build_pipeline("vits", checkpoint=None, input_size=56)
    server = serve(pipe, port=0, background=True)
    try:
        port = server.server_address[1]
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=60).read()
        assert b"Compute Depth" in page

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (60, 80, 3), np.uint8)
        ok, buf = cv2.imencode(".png", img)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.tobytes(),
            method="POST")
        out = json.loads(urllib.request.urlopen(req, timeout=300).read())
        for key in ("input", "colored", "gray", "raw16"):
            png = base64.b64decode(out[key])
            arr = cv2.imdecode(np.frombuffer(png, np.uint8),
                               cv2.IMREAD_UNCHANGED)
            assert arr is not None and arr.shape[:2] == (60, 80), key
    finally:
        server.shutdown()


def _make_sintel_fixture(tmp_path, seq_len=4, out_size=28):
    """Tiny on-disk Sintel-format dataset + yaml config for CLI drives."""
    import cv2
    import struct
    import yaml

    root = tmp_path / "sintel"
    rng = np.random.default_rng(0)
    for sub in ("rgb", "depth", "depth_anything_v2"):
        os.makedirs(root / sub / "scene_a", exist_ok=True)
    for i in range(8):
        cv2.imwrite(str(root / "rgb" / "scene_a" / f"f_{i:04d}.png"),
                    rng.integers(0, 255, (40, 56, 3), np.uint8))
        arr = (rng.random((40, 56)) * 30 + 0.3).astype(np.float32)
        buf = struct.pack("<f", 202021.25) + struct.pack("<ii", 56, 40)
        with open(root / "depth" / "scene_a" / f"f_{i:04d}.dpt", "wb") as f:
            f.write(buf + arr.tobytes())
        cv2.imwrite(
            str(root / "depth_anything_v2" / "scene_a" / f"f_{i:04d}.png"),
            (rng.random((40, 56)) * 60000).astype(np.uint16))
    cfg = {
        "dataset_common": {"sequence_length": seq_len,
                           "sequence_stride": seq_len,
                           "output_size": [out_size, out_size],
                           "use_random_crop": False},
        "datasets": {"Sintel": {
            "train_split": 0.5,
            "data_types": ["rgb", "depth", "depth_anything_v2", "mask"],
            "params": {"root_dir": str(root)},
        }},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return cfg_path


def test_train_cli_with_resume(tmp_path):
    """Drive the training CLI end-to-end twice: a 1-epoch run that saves an
    async checkpoint, then --resume continuing to epoch 2."""
    cfg_path = _make_sintel_fixture(tmp_path)

    from vdn.cli.train import main
    common = ["--dataset-config", str(cfg_path), "--datasets", "Sintel",
              "--encoder", "vits", "--model-version", "4",
              "--batch-size", "1", "--compute-dtype", "fp32",
              "--val-interval", "99", "--save-interval", "1",
              "--checkpoint-dir", str(tmp_path / "ckpts"),
              "--log-dir", str(tmp_path / "logs")]
    main(common + ["--epochs", "1"])
    ckdir = tmp_path / "ckpts" / "refine_v4"
    assert any(ckdir.iterdir()), "no checkpoint written"
    main(common + ["--epochs", "2", "--resume"])


def test_master_config_overlay(tmp_path):
    """The reference's legacy master config switchboard (reference
    configs/config.yaml:1-213 — which nothing in the reference actually
    loads) is live in vdn: --config sets defaults, enabled: selects
    datasets, explicit flags still win."""
    import argparse
    import yaml

    from vdn.core.config import (enabled_datasets, load_master_config,
                                 overlay_args)

    master = {
        "experiment": {"name": "exp-a"},
        "wandb": {"enabled": False},
        "environment": {"seed": 7},
        "model": {"version": "v2", "encoder_model": "hiera_test",
                  "attention_feature_levels": [3],
                  "prediction_mode": "depth"},
        "loss_weights": {"affine_invariant": 1.0, "tgm_loss": 2.0,
                         "normal_l1": 0.25, "depth_ssim": 0.0},
        "training": {"batch_size": 3, "learning_rate": 5e-4,
                     "num_epochs": 9, "eval_interval": 4,
                     "save_model_interval": 2},
        "datasets": {"Sintel": {"enabled": True, "train_split": 0.5,
                                "params": {"root_dir": "/nowhere"}},
                     "VKitti": {"enabled": False, "train_split": 0.5,
                                "params": {"root_dir": "/nowhere"}}},
    }
    path = tmp_path / "master.yaml"
    path.write_text(yaml.safe_dump(master))
    cfg = load_master_config(str(path))
    assert enabled_datasets(cfg) == ["Sintel"]

    parser = argparse.ArgumentParser()
    parser.add_argument("--run-name", default=None)
    parser.add_argument("--use-wandb", action="store_true")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--encoder", default="hiera_base_224")
    parser.add_argument("--attention-levels", default="2,3")
    parser.add_argument("--use-residual", action="store_true", default=True)
    parser.add_argument("--stable-scale", type=float, default=0.0)
    parser.add_argument("--normal-loss-scale", type=float, default=0.0)
    parser.add_argument("--batch-size", type=int, default=6)
    parser.add_argument("--initial-lr", type=float, default=1e-4)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--val-interval", type=int, default=1)
    parser.add_argument("--save-interval", type=int, default=1)
    overlay_args(parser, cfg, "v1")
    # explicit flag wins over the config value
    args = parser.parse_args(["--batch-size", "11"])
    assert args.run_name == "exp-a" and args.seed == 7
    assert args.encoder == "hiera_test"
    assert args.attention_levels == "3"
    assert args.use_residual is False      # prediction_mode: depth
    assert args.stable_scale == 2.0        # tgm_loss
    assert args.normal_loss_scale == 0.25  # normal_l1
    assert args.initial_lr == 5e-4 and args.epochs == 9
    assert args.val_interval == 4 and args.save_interval == 2
    assert args.batch_size == 11           # CLI override

    # the dead "v1 -> dino" reference switch raises with a pointer
    cfg_v1 = dict(cfg, model={"version": "v1"})
    with pytest.raises(ValueError, match="dead in"):
        overlay_args(parser, cfg_v1, "v1")


def test_train_cli_master_config(tmp_path):
    """Drive the refine CLI end-to-end from a master config alone: the
    datasets: section doubles as the factory config, training: values
    become defaults."""
    import yaml

    fixture_cfg = yaml.safe_load(_make_sintel_fixture(tmp_path).read_text())
    master = {
        "model": {"version": 4, "encoder_model": "vits"},
        "training": {"batch_size": 1, "num_epochs": 1,
                     "eval_interval": 99, "save_model_interval": 1},
        "loss_weights": {"affine_invariant": 1.0, "tgm_loss": 10.0},
        "logging": {"checkpoint_dir": str(tmp_path / "ckpts"),
                    "log_dir": str(tmp_path / "logs")},
        "datasets": {"Sintel": dict(fixture_cfg["datasets"]["Sintel"],
                                    enabled=True)},
        "dataset_common": fixture_cfg["dataset_common"],
    }
    master_path = tmp_path / "master.yaml"
    master_path.write_text(yaml.safe_dump(master))

    from vdn.cli.train import main
    main(["--config", str(master_path), "--compute-dtype", "fp32"])
    assert any((tmp_path / "ckpts" / "refine_v4").iterdir())


def test_train_v1_cli_with_eval_and_resume(tmp_path):
    """Drive the v1 harness end-to-end (reference scripts/train.py:413-530):
    train + validate-per-epoch + async checkpoint, then --resume — the
    same surface RefineTrainer's CLI has."""
    cfg_path = _make_sintel_fixture(tmp_path, seq_len=2, out_size=64)

    from vdn.cli.train_v1 import main
    common = ["--dataset-config", str(cfg_path), "--datasets", "Sintel",
              "--encoder", "hiera_test", "--sequence-length", "2",
              "--attention-levels", "3",
              "--batch-size", "1",
              "--val-interval", "1", "--save-interval", "1",
              "--debug-nans",
              "--checkpoint-dir", str(tmp_path / "ckpts"),
              "--log-dir", str(tmp_path / "logs")]
    main(common + ["--epochs", "1"])
    ckdir = tmp_path / "ckpts" / "video_depth_normal_v1"
    assert any(ckdir.iterdir()), "no checkpoint written"
    # validation metrics were logged
    logs = list((tmp_path / "logs").glob("*.metrics.jsonl"))
    rec = [json.loads(line) for line in
           logs[0].read_text().strip().split("\n")][-1]
    assert any(k.startswith("validation/") for k in rec), rec
    main(common + ["--epochs", "2", "--resume"])


@pytest.mark.slow
def test_run_metric_and_pointcloud_cli(tmp_path):
    """Metric-depth inference CLI (reference metric_depth/run.py) and the
    pointcloud CLI (reference metric_depth/depth_to_pointcloud.py).
    Metric checkpoints are layout-identical to the relative ones minus
    the memory block (the sigmoid head has the same parameters), so the
    fixture filters a reference DA2 state_dict to pretrained.*/depth_head.*."""
    from depth_anything_v2.depth_anything_v2 import DepthAnythingV2 as RefDA2
    torch.manual_seed(0)
    ref = RefDA2(encoder="vits", features=64,
                 out_channels=[48, 96, 192, 384]).eval()
    state = {k: v for k, v in ref.state_dict().items()
             if k.startswith(("pretrained.", "depth_head."))}
    ckpt = tmp_path / "metric_vits.pth"
    torch.save(state, str(ckpt))

    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    rng = np.random.default_rng(3)
    cv2.imwrite(str(img_dir / "a.png"),
                rng.integers(0, 255, (70, 70, 3), np.uint8))

    outdir = tmp_path / "out"
    from vdn.cli.run_metric import main
    main(["--img-path", str(img_dir), "--encoder", "vits",
          "--load-from", str(ckpt), "--outdir", str(outdir),
          "--input-size", "56", "--max-depth", "20", "--save-numpy",
          "--pred-only", "--compute-dtype", "fp32"])
    depth = np.load(outdir / "a_raw_depth_meter.npy")
    assert depth.shape == (70, 70)
    assert depth.min() >= 0 and depth.max() <= 20 + 1e-5
    assert (outdir / "a.png").exists()

    pc_dir = tmp_path / "pc"
    from vdn.cli.pointcloud import main as pc_main
    pc_main(["--img-path", str(img_dir), "--encoder", "vits",
             "--load-from", str(ckpt), "--outdir", str(pc_dir),
             "--input-size", "56", "--max-depth", "20",
             "--compute-dtype", "fp32"])
    ply = (pc_dir / "a.ply").read_text().splitlines()
    assert ply[0] == "ply"
    n = int([l for l in ply if l.startswith("element vertex")][0].split()[-1])
    assert n > 0 and len(ply) > n  # header + n vertex lines
