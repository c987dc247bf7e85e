"""Training step + state + checkpointing.

The reference's train.py hot loop (SURVEY.md §3.1) becomes one jitted
function: forward (train-mode BN), target assignment, multi-part loss,
backward, SGD update, BN-state merge — all inside a single XLA program.
Checkpoints are orbax (train-state resume, SURVEY.md §5 "checkpoint /
resume") plus ``.weights`` export for cross-framework interchange.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config.hyp import Hyp
from ..models.darknet import NetworkSpec, apply_network
from .loss import compute_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    state: Any          # BN running stats
    opt_state: Any
    step: jnp.ndarray   # scalar int32


def make_optimizer(lr_schedule: Callable, momentum: float = 0.9,
                   weight_decay: float = 5e-4) -> optax.GradientTransformation:
    """SGD + momentum + decoupled weight decay on conv kernels only
    (biases/BN exempt, darknet convention)."""
    def kernel_mask(params):
        return jax.tree.map_with_path(
            lambda path, _: any(getattr(k, "key", "") == "kernel"
                                for k in path), params)

    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=kernel_mask),
        optax.sgd(learning_rate=lr_schedule, momentum=momentum,
                  nesterov=False),
    )


def init_train_state(spec: NetworkSpec, params, state,
                     optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, state=state,
                      opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(spec: NetworkSpec,
                    optimizer: optax.GradientTransformation,
                    hyp: Optional[Hyp] = None,
                    axis_name: Optional[str] = None,
                    compute_dtype=jnp.float32,
                    device_aug: bool = False,
                    aug_seed: int = 0) -> Callable:
    """Build the (jittable) train step.

    With ``axis_name`` set, gradients and BN batch statistics are averaged
    across the named mesh axis (psum over ICI) — the TPU-native equivalent
    of the reference's optional DataParallel (SURVEY.md §2 "parallelism").
    The returned function is pure: shard_map/jit it at the call site.

    ``device_aug=True`` fuses mosaic/rotation/flip/HSV augmentation into the
    step itself (BASELINE config #5: on-device augmentation); the PRNG key
    is folded from the step counter (and the mesh axis index under DP) so
    every step/device augments differently yet reproducibly.
    """
    hyp = hyp or Hyp()
    yolo_specs = spec.yolo_specs
    img_size = spec.img_size

    def loss_fn(params, state, imgs, targets, valid, step):
        x = imgs.astype(jnp.float32) / 255.0
        if device_aug:
            from ..data.augment_device import augment_batch

            key = jax.random.fold_in(jax.random.PRNGKey(aug_seed), step)
            if axis_name is not None:
                key = jax.random.fold_in(key,
                                         jax.lax.axis_index(axis_name))
            x, targets, valid = augment_batch(key, x, targets, valid, hyp)
        x = x.astype(compute_dtype)
        heads, new_state = apply_network(spec, params, state, x, train=True,
                                         axis_name=axis_name)
        heads = [h.astype(jnp.float32) for h in heads]
        total, comp = compute_loss(heads, targets, valid, yolo_specs,
                                   img_size, hyp)
        return total, (new_state, comp)

    def train_step(ts: TrainState, imgs, targets, valid
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (loss, (new_state, comp)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params, ts.state, imgs, targets,
                                   valid, ts.step)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            comp = jax.lax.pmean(comp, axis_name)
        updates, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        new_ts = TrainState(params=new_params, state=new_state,
                            opt_state=new_opt, step=ts.step + 1)
        comp["grad_norm"] = optax.global_norm(grads)
        return new_ts, comp

    return train_step


# ----------------------------- checkpointing -------------------------------

def save_checkpoint(ckpt_dir: str, ts: TrainState, step: int,
                    keep: int = 3) -> None:
    """Orbax checkpoint of the full train state (resume semantics of the
    reference's last.pt, SURVEY.md §5)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(dataclasses.asdict(ts)))


def load_checkpoint(ckpt_dir: str, ts_template: TrainState
                    ) -> Tuple[TrainState, int]:
    """Restore the latest checkpoint into the template's structure."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(
                dataclasses.asdict(ts_template)))
    ts = TrainState(**restored)
    return ts, step
