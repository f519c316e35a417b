"""Optimizers and LR schedules matching the reference's training recipe.

Adam with betas (B1, B2) = (0, 0.999), eps 1e-6, zero weight decay
(reference: model.py:410-416, 858-864); optional amsgrad / adabelief
(reference flags: config.json:116,119); LR schedules 'default' (constant),
'CosAnnealLR' (epoch-stepped cosine to lr/4, reference: model.py:420-422)
and 'CosAnnealWarmRes' (warm restarts T_0=10, T_mult=2, model.py:423-425).
Gradient clipping sits *after* ortho-reg, as in the reference step order
(train_fns.py:185-192).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def make_lr_schedule(base_lr: float, sched_version: str, num_epochs: int,
                     steps_per_epoch: int):
    """Return an optax schedule over *steps*, replicating the reference's
    epoch-granular scheduler stepping (reference: train.py:244-247)."""
    if sched_version in ("default", None) or steps_per_epoch <= 0:
        return base_lr
    eta_min = base_lr / 4.0

    if sched_version == "CosAnnealLR":
        def sched(step):
            epoch = step // steps_per_epoch
            t = jnp.minimum(epoch, num_epochs) / max(num_epochs, 1)
            return eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t))
        return sched

    if sched_version == "CosAnnealWarmRes":
        def sched(step):
            epoch = (step // steps_per_epoch).astype(jnp.float32)
            # T_0=10, T_mult=2: restart boundaries at 10*(2^k - 1)
            k = jnp.floor(jnp.log2(epoch / 10.0 + 1.0))
            t_start = 10.0 * (2.0 ** k - 1.0)
            t_i = 10.0 * 2.0 ** k
            t_cur = (epoch - t_start) / t_i
            return eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t_cur))
        return sched

    return base_lr


def make_optimizer(lr, b1: float, b2: float, eps: float,
                   clip_norm: float | None = None,
                   amsgrad: bool = False, ada_belief: bool = False):
    # A constant lr is wrapped as a schedule so the optax state structure
    # (ScaleByScheduleState with a step count) is IDENTICAL for every
    # sched_version. Otherwise init_train_state (which runs before the
    # loader exists, steps_per_epoch unknown -> constant) builds a
    # different tree than the train step's scheduled optimizer, and a
    # checkpoint trained under one sched_version cannot resume under
    # another (the flagship's post-peak CosAnnealLR leg does exactly
    # that). Legacy EmptyState-serialized optim msgpacks are grafted by
    # utils/checkpoint.load_checkpoint.
    sched = lr if callable(lr) else (lambda _count, _lr=lr: _lr)
    if ada_belief:
        opt = optax.adabelief(sched, b1=b1, b2=b2, eps=eps)
    elif amsgrad:
        opt = optax.amsgrad(sched, b1=b1, b2=b2, eps=eps)
    else:
        opt = optax.adam(sched, b1=b1, b2=b2, eps=eps)
    if clip_norm is not None:
        return optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    return opt
