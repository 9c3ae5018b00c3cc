"""Optimizer: 3-group SGD + warmup/decay schedules, as optax transforms.

Counterpart of the reference's get_optimizer (architectures/yolov5.py:48-71,
yolov7.py:50-80) and the per-step warmup interpolation in
DetTrainer.optimizer_step (core/train/det_trainer.py:184-216):

  * group "bias":   conv/head biases — no weight decay, lr warms from
                    warmup_bias_lr down to the schedule.
  * group "norm":   BN scales (and v7 Implicit params) — no weight decay.
  * group "weight": conv kernels — weight decay 5e-4.
  * momentum warms from warmup_momentum to momentum over the warmup steps.
  * after warmup, lr follows linear (v5) or cosine (v7) decay over epochs.

Implemented as a single optax GradientTransformation over the full pytree:
per-leaf masks select the groups; the warmup interpolation is computed from
the step count inside the transform, so the whole thing lives in the jitted
train step (no host-side LR mutation like the reference).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def label_params(params) -> dict:
    """Assign each param leaf to 'bias' / 'norm' / 'weight'.

    BN scale leaves are named 'scale'; Implicit leaves 'implicit' (v7 puts
    them in the no-decay group, yolov7.py:60-71); biases 'bias'; conv kernels
    'kernel'.
    """

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        leaf = path[-1]
        if leaf == "bias":
            return "bias"
        if leaf in ("scale", "implicit"):
            return "norm"
        return "weight"

    return walk(params, ())


def lr_schedules(hyp: dict, max_epochs: int, steps_per_epoch: int,
                 cosine: bool = False) -> tuple[Callable, Callable, Callable]:
    """Returns (lr_weight(step), lr_bias(step), momentum(step)) callables.

    Warmup length: nw = max(warmup_epochs * steps_per_epoch, 100)
    (reference det_trainer.py:218-219). During warmup the base lr
    interpolates 0 -> schedule (bias: warmup_bias_lr -> schedule) and
    momentum warmup_momentum -> momentum (det_trainer.py:184-216).
    """
    lr0 = float(hyp["lr0"])
    lrf = float(hyp["lrf"])
    mom = float(hyp.get("momentum", 0.937))
    wmom = float(hyp.get("warmup_momentum", 0.8))
    wbias = float(hyp.get("warmup_bias_lr", 0.1))
    nw = max(int(float(hyp.get("warmup_epochs", 3.0)) * steps_per_epoch), 100)

    def epoch_factor(step):
        e = step / steps_per_epoch
        if cosine:
            # v7: ((1 - cos(e*pi/E)) / 2) * (lrf - 1) + 1 (yolov7.py:77)
            return ((1 - jnp.cos(e * math.pi / max_epochs)) / 2) * (lrf - 1) + 1
        # v5 linear: (1 - e/E) * (1 - lrf) + lrf (yolov5.py:68)
        return (1 - e / max_epochs) * (1.0 - lrf) + lrf

    def lr_weight(step):
        target = lr0 * epoch_factor(step)
        frac = jnp.clip(step / nw, 0.0, 1.0)
        return jnp.where(step < nw, frac * target, target)

    def lr_bias(step):
        target = lr0 * epoch_factor(step)
        frac = jnp.clip(step / nw, 0.0, 1.0)
        return jnp.where(step < nw, wbias + frac * (target - wbias), target)

    def momentum(step):
        frac = jnp.clip(step / nw, 0.0, 1.0)
        return jnp.where(step < nw, wmom + frac * (mom - wmom), mom)

    return lr_weight, lr_bias, momentum


class SGDState(NamedTuple):
    step: jnp.ndarray
    momentum_buf: optax.Updates


def yolo_sgd(
    params,
    hyp: dict,
    max_epochs: int,
    steps_per_epoch: int,
    cosine: bool = False,
) -> optax.GradientTransformation:
    """Nesterov SGD with grouped lr/decay and in-graph warmup.

    Matches torch.optim.SGD(nesterov=True) update:
      buf = mu * buf + grad (+ wd * param for decayed group)
      update = -lr * (grad + wd*param + mu * buf)
    with time-varying lr (per group) and mu.
    """
    labels = label_params(params)
    lr_w, lr_b, mom_fn = lr_schedules(hyp, max_epochs, steps_per_epoch, cosine)
    wd = float(hyp.get("weight_decay", 0.0))

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return SGDState(step=jnp.zeros((), jnp.int32), momentum_buf=zeros)

    def update(grads, state, params):
        step = state.step
        mu = mom_fn(step)
        lrw = lr_w(step)
        lrb = lr_b(step)

        def leaf_update(g, buf, p, label):
            g = g + (wd * p if label == "weight" else 0.0)
            new_buf = mu * buf + g
            d = g + mu * new_buf  # nesterov
            lr = lrb if label == "bias" else lrw
            return -lr * d, new_buf

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_b = treedef.flatten_up_to(state.momentum_buf)
        flat_p = treedef.flatten_up_to(params)
        flat_l = treedef.flatten_up_to(labels)
        out = [
            leaf_update(g, b, p, l)
            for g, b, p, l in zip(flat_g, flat_b, flat_p, flat_l)
        ]
        updates = treedef.unflatten([u for u, _ in out])
        new_buf = treedef.unflatten([b for _, b in out])
        return updates, SGDState(step=step + 1, momentum_buf=new_buf)

    return optax.GradientTransformation(init, update)


def make_optimizer(params, hyp: dict, max_epochs: int, steps_per_epoch: int,
                   cosine: bool = False,
                   grad_clip: float = 10.0) -> optax.GradientTransformation:
    """Full chain: global-norm clip (reference pl.Trainer gradient_clip_val=10,
    scripts/main.py:44) + grouped SGD."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        yolo_sgd(params, hyp, max_epochs, steps_per_epoch, cosine),
    )
