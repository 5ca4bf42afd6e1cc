"""Refinement trainer (v4 semantics), TPU-native.

Re-design of the reference canonical trainer
(reference scripts/train_v4.py:443-649):

- AdamW + cosine-annealing-warm-restarts (T_0=10000, T_mult=2), stepped
  per iteration (reference :536-537, :573)
- the temporal head is frozen (reference :493-494) — via optax.masked
- batch preprocessing: RGB clamp+ImageNet-norm, depth clamp>=0 (+ optional
  per-clip masked min-max norm), GT depth -> disparity 1/clamp(d, 1e-8)
  (reference :31-119, :558)
- checkpoint rename maps (head->temporal_head etc., reference :475-489)
  are applied at torch-state conversion time
- the training step is one jitted SPMD function; the mesh's 'data' axis
  replaces DDP (gradient psum is inserted by XLA)
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vdn.train.losses import video_depth_loss

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

V4_RENAME_MAP = {
    # reference scripts/train_v4.py:475-480
    "head": "temporal_head",
    "final_res2": "shift_head",
    "final_scale2": "scale_head",
}


def rename_with_map(key: str, rename_map: Dict[str, str]) -> str:
    for old, new in rename_map.items():
        if key.startswith(old):
            return key.replace(old, new, 1)
    return key


def cosine_warm_restarts(init_lr: float, t_0: int = 10_000,
                         t_mult: int = 2, eta_min: float = 0.0
                         ) -> optax.Schedule:
    """torch CosineAnnealingWarmRestarts as an optax schedule."""
    assert t_mult >= 1

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(step, t_0)
            t_i = float(t_0)
        else:
            # cycle k starts at T_0 * (t_mult^k - 1) / (t_mult - 1)
            ratio = step * (t_mult - 1) / t_0 + 1
            k = jnp.floor(jnp.log(ratio) / math.log(t_mult))
            start = t_0 * (jnp.power(float(t_mult), k) - 1) / (t_mult - 1)
            t_i = t_0 * jnp.power(float(t_mult), k)
            t_cur = step - start
        return eta_min + (init_lr - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * t_cur / t_i))

    return schedule


def preprocess_rgb_sequences(rgb: jnp.ndarray) -> jnp.ndarray:
    """[B, S, H, W, 3] in 0-1 -> clamped + ImageNet-normalized
    (reference train_v4.py:31-48)."""
    rgb = jnp.clip(rgb, 0.0, 1.0)
    return (rgb - IMAGENET_MEAN) / IMAGENET_STD


def preprocess_depth_sequences(depth: jnp.ndarray,
                               masks: Optional[jnp.ndarray],
                               norm: bool = True) -> jnp.ndarray:
    """[B, S, H, W] -> clamp>=0 (+ optional per-clip masked min-max norm)
    (reference train_v4.py:70-119)."""
    depth = jnp.clip(depth, 0.0, None)
    if not norm:
        return depth
    b = depth.shape[0]
    if masks is None:
        flat = depth.reshape(b, -1)
        mn = flat.min(axis=1).reshape(b, 1, 1, 1)
        mx = flat.max(axis=1).reshape(b, 1, 1, 1)
        return (depth - mn) / jnp.clip(mx - mn, 1e-8, None)
    m = masks > 0
    mn = jnp.min(jnp.where(m, depth, jnp.inf).reshape(b, -1), axis=1)
    mx = jnp.max(jnp.where(m, depth, -jnp.inf).reshape(b, -1), axis=1)
    mn = mn.reshape(b, 1, 1, 1)
    mx = mx.reshape(b, 1, 1, 1)
    out = jnp.clip((depth - mn) / jnp.clip(mx - mn, 1e-8, None), 0.0, 1.0)
    any_valid = m.reshape(b, -1).any(axis=1).reshape(b, 1, 1, 1)
    return jnp.where(any_valid, out, 0.0)


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"],
    meta_fields=[])


def _path_contains(path, name: str) -> bool:
    return any(getattr(p, "key", None) == name for p in path)


def _dp_shardings(mesh):
    """(batch, replicated) NamedShardings for data-parallel training: the
    leading batch axis over the mesh's 'data' axis, everything else
    replicated."""
    from jax.sharding import NamedSharding, PartitionSpec
    from vdn.parallel.mesh import DATA_AXIS
    return (NamedSharding(mesh, PartitionSpec(DATA_AXIS)),
            NamedSharding(mesh, PartitionSpec()))


def _pin_batch(mesh, *arrays):
    """Re-assert the data-parallel layout inside the jitted step so GSPMD
    cannot drift activations off the batch axis."""
    if mesh is None:
        return arrays
    batch_s, _ = _dp_shardings(mesh)
    return tuple(jax.lax.with_sharding_constraint(a, batch_s)
                 for a in arrays)


class RefineTrainer:
    """v4 refinement training: model(input_depths) vs GT disparity."""

    def __init__(self, model, initial_lr: float = 1e-5,
                 final_lr: float = 0.0, t_0: int = 10_000, t_mult: int = 2,
                 alpha: float = 0.5, stable_scale: float = 10.0,
                 ssim_loss_scale: float = 0.0,
                 freeze_temporal_head: bool = True,
                 weight_decay: float = 0.01, mesh=None):
        self.model = model
        self.loss_kwargs = dict(alpha=alpha, stable_scale=stable_scale,
                                ssim_loss_scale=ssim_loss_scale)
        schedule = cosine_warm_restarts(initial_lr, t_0, t_mult, final_lr)
        tx = optax.adamw(schedule, weight_decay=weight_decay)
        if freeze_temporal_head:
            # frozen subtree gets zero updates (optax.masked would leak the
            # raw gradients through as updates for the masked-out leaves)
            def label_fn(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "frozen" if _path_contains(
                        path, "temporal_head") else "train", params)
            tx = optax.multi_transform(
                {"train": tx, "frozen": optax.set_to_zero()}, label_fn)
        self.tx = tx
        self._freeze_temporal_head = freeze_temporal_head
        self.mesh = mesh
        if mesh is None:
            self._train_step = jax.jit(self._train_step_impl,
                                       donate_argnums=(0,))
            self._eval_step = jax.jit(self._eval_step_impl)
        else:
            # SPMD data parallelism, the reference's DDP
            # (scripts/train_v4.py:443-470): batch pinned to the mesh's
            # 'data' axis, params/opt replicated; XLA inserts the gradient
            # all-reduce over ICI.
            batch_s, rep = _dp_shardings(mesh)
            self._train_step = jax.jit(
                self._train_step_impl, donate_argnums=(0,),
                in_shardings=(rep, batch_s, batch_s, batch_s),
                out_shardings=(rep, rep))
            self._eval_step = jax.jit(
                self._eval_step_impl,
                in_shardings=(rep, batch_s, batch_s, batch_s),
                out_shardings=rep)

    def init_state(self, params) -> TrainState:
        return TrainState(params=params, opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    def _loss(self, params, input_depths, gt_disp, masks):
        if self._freeze_temporal_head:
            # stop_gradient makes the frozen leaves constants under
            # autodiff — the trace-level equivalent of the reference's
            # requires_grad=False (scripts/train_v4.py:493-494).  Inside
            # the jitted step XLA already DCE'd the frozen dW matmuls
            # (they only fed optax.set_to_zero; flop-count-verified
            # identical), so this guards the non-jit/export paths and
            # keeps the jaxpr honest rather than buying step time.
            params = jax.tree_util.tree_map_with_path(
                lambda path, x: jax.lax.stop_gradient(x)
                if _path_contains(path, "temporal_head") else x, params)
        pred = self.model.apply(params, input_depths)
        loss_dict = video_depth_loss(pred, gt_disp, masks,
                                     **self.loss_kwargs)
        return loss_dict["total_loss"], loss_dict

    def _train_step_impl(self, state: TrainState, input_depths, gt_depths,
                         masks):
        input_depths, gt_depths, masks = _pin_batch(
            self.mesh, input_depths, gt_depths, masks)
        gt_disp = 1.0 / jnp.clip(gt_depths, 1e-8, None)
        (_, loss_dict), grads = jax.value_and_grad(
            self._loss, has_aux=True)(state.params, input_depths, gt_disp,
                                      masks)
        import os
        if os.environ.get("VDN_GRAD_BARRIER", "1") != "0":
            # keep the AdamW update out of the dW dot fusions: the fused
            # epilogue drags the encoder dW matmuls to ~70-80% of peak
            # (b2t8 trace 2026-08-20); the barrier is an identity on the
            # grads and A/B'd 675.9 -> 668.3 ms.  VDN_GRAD_BARRIER=0
            # reverts.
            grads = jax.lax.optimization_barrier(grads)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss_dict

    def _eval_step_impl(self, params, input_depths, gt_depths, masks):
        gt_disp = 1.0 / jnp.clip(gt_depths, 1e-8, None)
        _, loss_dict = self._loss(params, input_depths, gt_disp, masks)
        return loss_dict

    def train_step(self, state: TrainState, batch: Dict[str, np.ndarray]
                   ) -> Tuple[TrainState, Dict[str, float]]:
        """batch: {'depth_anything_v2': [B,S,H,W], 'depth': [B,S,H,W],
        'mask': [B,S,H,W]} (the reference batch contract,
        train_v4.py:548-559)."""
        input_depths = preprocess_depth_sequences(
            jnp.asarray(batch["depth_anything_v2"]),
            jnp.asarray(batch["mask"]), norm=False)
        state, loss_dict = self._train_step(
            state, input_depths, jnp.asarray(batch["depth"]),
            jnp.asarray(batch["mask"]).astype(jnp.float32))
        return state, loss_dict

    def eval_step(self, state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        input_depths = preprocess_depth_sequences(
            jnp.asarray(batch["depth_anything_v2"]),
            jnp.asarray(batch["mask"]), norm=False)
        return self._eval_step(state.params, input_depths,
                               jnp.asarray(batch["depth"]),
                               jnp.asarray(batch["mask"]).astype(
                                   jnp.float32))


class V1Trainer:
    """v1 research-model training (reference scripts/train.py:413-460):
    depth+normal objective over the dual-Hiera model — VideoDepthLoss +
    VideoNormalLoss * normal_loss_scale, same AdamW + warm-restart
    schedule, input depths scaled and GT converted to disparity."""

    def __init__(self, model, initial_lr: float = 1e-5,
                 final_lr: float = 0.0, t_0: int = 10_000, t_mult: int = 2,
                 alpha: float = 0.5, stable_scale: float = 10.0,
                 normal_loss_scale: float = 1.0,
                 input_depth_max: float = 65535.0,
                 weight_decay: float = 0.01):
        from vdn.ops.normals import normal_vector
        from vdn.train.losses import video_normal_loss

        self.model = model
        self.normal_loss_scale = normal_loss_scale
        self.input_depth_max = input_depth_max
        self.loss_kwargs = dict(alpha=alpha, stable_scale=stable_scale)
        schedule = cosine_warm_restarts(initial_lr, t_0, t_mult, final_lr)
        self.tx = optax.adamw(schedule, weight_decay=weight_decay)

        def loss_fn(params, input_depths, rgbs, gt_disp, masks):
            pred_depths, pred_normals = model.apply(params, input_depths,
                                                    rgbs)
            depth_dict = video_depth_loss(pred_depths, gt_disp, masks,
                                          **self.loss_kwargs)
            gt_normals = normal_vector(gt_disp)
            normal_dict = video_normal_loss(pred_normals, gt_normals,
                                            masks)
            total = (depth_dict["total_loss"]
                     + normal_dict["normal_loss"] * normal_loss_scale)
            return total, {**depth_dict, **normal_dict,
                           "total_loss": total}

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, input_depths, rgbs, gt_depths, masks):
            gt_disp = 1.0 / jnp.clip(gt_depths, 1e-8, None)
            (_, loss_dict), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, input_depths, rgbs,
                                       gt_disp, masks)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss_dict

        self._train_step = train_step

        @jax.jit
        def eval_step(params, input_depths, rgbs, gt_depths, masks):
            gt_disp = 1.0 / jnp.clip(gt_depths, 1e-8, None)
            _, loss_dict = loss_fn(params, input_depths, rgbs, gt_disp,
                                   masks)
            return loss_dict

        self._eval_step = eval_step

    def init_state(self, params) -> TrainState:
        return TrainState(params=params, opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    def _preprocess(self, batch):
        rgbs = preprocess_rgb_sequences(jnp.asarray(batch["rgb"]))
        input_depths = preprocess_depth_sequences(
            jnp.asarray(batch["depth_anything_v2"]),
            jnp.asarray(batch["mask"]), norm=False) / self.input_depth_max
        return rgbs, input_depths

    def train_step(self, state, batch):
        """batch: rgb [B,S,H,W,3] 0-1, depth_anything_v2/depth/mask
        [B,S,H,W] (reference train.py:426-440 preprocessing)."""
        rgbs, input_depths = self._preprocess(batch)
        return self._train_step(
            state, input_depths, rgbs, jnp.asarray(batch["depth"]),
            jnp.asarray(batch["mask"]).astype(jnp.float32))

    def eval_step(self, state, batch):
        """Validation losses, no update (reference train.py:376-410
        ``validate`` — same criteria under torch.no_grad)."""
        rgbs, input_depths = self._preprocess(batch)
        return self._eval_step(
            state.params, input_depths, rgbs, jnp.asarray(batch["depth"]),
            jnp.asarray(batch["mask"]).astype(jnp.float32))
