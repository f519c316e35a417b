"""The fused GAN train step: one jitted XLA program per iteration.

Reproduces the reference's training semantics (reference: train_fns.py:20-206)
as a single functional step — D phase(s), G phase, EMA — with all state
(params, optimizer moments, BN running stats, SN singular vectors) threaded
explicitly. Detach points match the reference exactly:

  * D phase: G runs in train mode but its output is stop-gradient
    (reference: torch.set_grad_enabled(train_G), model.py:973); G's BN
    running stats and SN u vectors still update during this pass.
  * DiffAugment is applied to generated images only (model.py:977-978).
  * split_D: separate fake/real D passes; SN power iteration runs per pass,
    as in the reference (layers.py:151-165 runs per forward call).
  * G phase: fresh z, gradients flow through (already-updated) D into G;
    D's weights are constants (we differentiate wrt G params only).
  * IEA loss reuses cls_embed_real from the D phase (reference quirk
    SURVEY.md §2.4.3, train_fns.py:172); it is stop-gradient inside iea_loss.
  * EMA update every iteration, decay 0 before ema_start
    (train_fns.py:195-196, utils/__init__.py:825-831).

Deliberate quirk fixes (documented deviations from the reference):
  * G's optimizer steps unconditionally (reference accidentally gated the
    step on clip_norm, train_fns.py:190-192 — SURVEY.md §2.4.1). Set
    config["replicate_G_step_bug"]=True to reproduce the bug.
  * metrics are always defined (reference NameErrors when optional losses
    are off, SURVEY.md §2.4.2).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ieagan_tpu import losses
from ieagan_tpu.ops.diff_aug import diff_augment, cr_diff_augment
from ieagan_tpu.train.ortho import apply_ortho_reg, shared_blacklist


class TrainState(struct.PyTreeNode):
    params_G: Any
    params_D: Any
    state_G: Any  # {'batch_stats': ..., 'spectral': ...}
    state_D: Any  # {'spectral': ...}
    opt_G: Any
    opt_D: Any
    params_G_ema: Any
    state_G_ema: Any
    itr: jnp.ndarray  # int32 scalar


def init_train_state(G, D, config, rng) -> TrainState:
    """Initialize all parameters/state for training."""
    es = int(config["n_classes"])
    batch = es * int(config.get("events_per_batch", 1))
    kG, kD, kr = jax.random.split(rng, 3)
    z = jnp.zeros((batch, int(config["dim_z"])), jnp.float32)
    y = jnp.tile(jnp.arange(es, dtype=jnp.int32),
                 int(config.get("events_per_batch", 1)))
    x = jnp.zeros((batch, int(config["resolution"]), _width(config), 1),
                  jnp.float32)
    g_tx, d_tx = make_optimizers(config)

    # ONE jitted init for the whole TrainState: G.init + D.init + optax
    # init + the EMA copies. Splitting these (or leaving the copies and
    # zeros_like eager) dispatches dozens of small executables, each a
    # separate round-trip compile on a network-attached TPU — measured
    # >15 min of init on the tunneled chip vs one compile here.
    def _build():
        gv = G.init({"params": kG, "rdof": kr}, z, y, train=False)
        dv = D.init({"params": kD}, x, y, train=False)
        params_G = gv["params"]
        state_G = {k: v for k, v in gv.items() if k != "params"}
        params_D = dv["params"]
        state_D = {k: v for k, v in dv.items() if k != "params"}
        return TrainState(
            params_G=params_G, params_D=params_D,
            state_G=state_G, state_D=state_D,
            opt_G=g_tx.init(params_G), opt_D=d_tx.init(params_D),
            # EMA starts as a *copy* of the source params (reference:
            # utils/__init__.py:817-821). The copies are also relied on to
            # keep the donated train step sound: ema leaves must not alias
            # params_G leaves. XLA does not *document* that identical jit
            # root outputs get distinct buffers — this is backend-verified
            # behavior (axon TPU + XLA:CPU), guarded by
            # test_driver.py::test_ema_survives_donated_step so a future
            # backend/XLA change fails loudly.
            params_G_ema=jax.tree_util.tree_map(jnp.copy, params_G),
            state_G_ema=jax.tree_util.tree_map(jnp.copy, state_G),
            itr=jnp.zeros((), jnp.int32))

    return jax.jit(_build)()


def _width(config) -> int:
    # output width = resolution * H_base (e.g. 256 * 3 = 768); the bottom
    # grid is bottom_width x (bottom_width * H_base) (reference: model.py:316-320).
    return int(config["resolution"]) * int(config["H_base"])


def make_optimizers(config, steps_per_epoch: int = 0):
    from ieagan_tpu.train.optim import make_optimizer, make_lr_schedule
    g_lr = make_lr_schedule(float(config["G_lr"]), config.get("sched_version", "default"),
                            int(config.get("num_epochs", 1)), steps_per_epoch)
    d_lr = make_lr_schedule(float(config["D_lr"]), config.get("sched_version", "default"),
                            int(config.get("num_epochs", 1)), steps_per_epoch)
    clip = config.get("clip_norm", None)
    g_tx = make_optimizer(g_lr, float(config["G_B1"]), float(config["G_B2"]),
                          float(config["adam_eps"]), clip_norm=clip,
                          amsgrad=bool(config.get("amsgrad", False)),
                          ada_belief=bool(config.get("ada_belief", False)))
    d_tx = make_optimizer(d_lr, float(config["D_B1"]), float(config["D_B2"]),
                          float(config["adam_eps"]), clip_norm=clip,
                          amsgrad=bool(config.get("amsgrad", False)),
                          ada_belief=bool(config.get("ada_belief", False)))
    return g_tx, d_tx


def make_train_step(G, D, config, steps_per_epoch: int = 0, *,
                    z_schedule=None, capture_grads: bool = False) -> Callable:
    """Build the jittable train step: (state, x, y, rng) -> (state, metrics).

    x: (B, H, W, 1) real images in [-1, 1]; y: (B,) int labels; B is
    events_per_batch * event_size. Not jitted here — callers wrap with
    jax.jit / pjit with the desired shardings.

    Test seams (used by the reference gradient-parity oracle,
    tests/test_model_parity.py): ``z_schedule`` replaces the per-phase
    latent draws with the given arrays, consumed in call order (D-phase
    accumulations first, then G-phase); ``capture_grads`` adds the
    post-ortho accumulated gradient trees to the metrics under
    ``_grads_D`` / ``_grads_G``.
    """
    g_tx, d_tx = make_optimizers(config, steps_per_epoch)
    contra_lambda = float(config["contra_lambda"])
    unif_on = bool(config["Uniformity_loss"])
    unif_lambda = float(config["unif_lambda"])
    iea_on = bool(config["IEA_loss"])
    iea_lambda = float(config["IEA_lambda"])
    con_reg = bool(config["Con_reg"])
    cr_lambda = float(config["cr_lambda"])
    do_diff_aug = bool(config["diff_aug"])
    # The policy string must actually reach the augment chain — it was
    # silently dropped until round 5 (every diff_aug_policy A/B arm
    # trained byte-identically to its control).
    diff_aug_policy = str(config.get("diff_aug_policy",
                                     "color,translation,cutout"))
    # Quirk fix (default ON, like the G-step fix below): the reference
    # augments ONLY the generator output in its G_D forward — real images
    # reach D raw (reference: model.py:972-982). That hands D a trivial
    # real/fake tell (cutout holes, translation zero-bands exist only on
    # fakes) and D saturates on any dataset; DiffAugment's own semantics
    # (Zhao et al. 2020) require T on both branches. diff_aug_real=False
    # reproduces the upstream behavior.
    diff_aug_real = bool(config.get("diff_aug_real", True))
    n_classes = int(config["n_classes"])
    dim_z = int(config["dim_z"])
    z_var = float(config.get("z_var", 1.0))
    # split_D=False runs one concatenated D pass. NOTE a documented deviation:
    # the reference's concat mode feeds the mixed [fake; real] batch to the
    # RRM as ONE 80-long sequence (model.py:918 h.unsqueeze(0)); here the RRM
    # by default operates per event (fake and real events as separate
    # sequences), preserving the intra-event semantics in both modes. Set
    # config["rrm_full_batch_sequence"]=True for reference bit-parity.
    split_D = bool(config["split_D"])
    num_D_steps = int(config["num_D_steps"])
    num_D_acc = int(config["num_D_accumulations"])
    num_G_acc = int(config["num_G_accumulations"])
    g_ortho = float(config["G_ortho"])
    d_ortho = float(config["D_ortho"])
    ema_on = bool(config["ema"])
    ema_decay = float(config["ema_decay"])
    ema_start = int(config["ema_start"])
    strategy = config["conditional_strategy"]
    pos_collected = bool(config["pos_collected_numerator"])
    replicate_g_bug = bool(config.get("replicate_G_step_bug", False))
    clip_norm = config.get("clip_norm", None)
    # The reference hardcodes 1.0 (train_fns.py:46-47); the config key is
    # this repo's documented extension (core/config.py "temperature") and
    # must actually be read — it was dead until round 5 (the temp05 A/B
    # arm trained byte-identically to its control).
    temperature = float(config.get("temperature", 1.0))
    margin = 0.0

    _z_iter = iter(z_schedule) if z_schedule is not None else None

    def sample_z(key, batch):
        if _z_iter is not None:
            return jnp.asarray(next(_z_iter), jnp.float32)
        return jax.random.normal(key, (batch, dim_z), jnp.float32) * (z_var ** 0.5)

    def g_forward(params_G, state_G, z, y, rdof_key):
        out, ups = G.apply({"params": params_G, **state_G}, z, y, train=True,
                           rngs={"rdof": rdof_key},
                           mutable=list(state_G.keys()))
        return out, ups

    def d_forward(params_D, state_D, x, y):
        out, ups = D.apply(
            {"params": params_D, **state_D}, x, y, train=True,
            mutable=list(state_D.keys()))
        if strategy == "Proj":
            # Proj returns the scalar score only (reference: model.py:939-944)
            return (None, None, jnp.squeeze(out, -1) if out.ndim > 1 else out), ups
        return out, ups

    def train_step(state: TrainState, x, y, rng):
        batch = x.shape[0]
        metrics = {}
        mask = losses.make_mask(y, n_classes)
        state_G, state_D = state.state_G, state.state_D
        params_G = state.params_G
        params_D = state.params_D
        opt_D = state.opt_D
        embed_real_for_iea = None

        # ---------------- D phase ----------------
        for d_step in range(num_D_steps):
            grads_acc = None
            aux_out = None
            for acc in range(num_D_acc):
                rng, kz, krdof, kaug = jax.random.split(rng, 4)
                z = sample_z(kz, batch)

                def d_loss_fn(p_D, state_G, state_D):
                    fake, g_ups = g_forward(params_G, state_G, z, y, krdof)
                    fake = jax.lax.stop_gradient(fake)
                    if do_diff_aug:
                        fake_in = diff_augment(kaug, fake, diff_aug_policy)
                        x_in = (diff_augment(jax.random.fold_in(kaug, 7), x,
                                             diff_aug_policy)
                                if diff_aug_real else x)
                    else:
                        fake_in = fake
                        x_in = x
                    if split_D:
                        # Separate fake/real D passes (reference:
                        # model.py:985-1010); SN u updates twice per step,
                        # as upstream.
                        (_, embed_f, score_f), d_ups = d_forward(
                            p_D, state_D, fake_in, y)
                        (proxy_r, embed_r, score_r), d_ups = d_forward(
                            p_D, d_ups, x_in, y)
                    else:
                        # Concat mode (reference: model.py:1023-1086): one D
                        # pass over [fake; real] — halves SN power-iteration
                        # work and better fills the batch dimension.
                        both, d_ups = d_forward(
                            p_D, state_D,
                            jnp.concatenate([fake_in, x_in], axis=0),
                            jnp.concatenate([y, y], axis=0))
                        proxy_all, embed_all, score_all = both
                        nb = fake_in.shape[0]
                        embed_f, embed_r = embed_all[:nb], embed_all[nb:]
                        proxy_r = None if proxy_all is None else proxy_all[nb:]
                        score_f, score_r = score_all[:nb], score_all[nb:]
                    loss_real, loss_fake = losses.loss_hinge_dis(score_f, score_r)
                    d_loss = loss_real + loss_fake
                    mets = {"D_loss_real": loss_real, "D_loss_fake": loss_fake}
                    if strategy == "Contra":
                        d_loss = d_loss + contra_lambda * losses.conditional_contrastive_loss(
                            embed_r, proxy_r, mask, y, temperature, margin,
                            pos_collected)
                        if con_reg:
                            rng2 = jax.random.fold_in(kaug, 1)
                            x_aug = cr_diff_augment(rng2, x)
                            (_, embed_ra, score_ra), d_ups = d_forward(p_D, d_ups, x_aug, y)
                            consistency = (losses.l2_loss(score_r, score_ra)
                                           + losses.l2_loss(embed_r, embed_ra))
                            d_loss = d_loss + cr_lambda * consistency
                        if unif_on:
                            u = losses.unif_loss(embed_r)
                            d_loss = d_loss + unif_lambda * u
                            mets["unif_loss_d"] = u
                    elif strategy == "Proj" and con_reg:
                        # Proj-strategy consistency reg (train_fns.py:57-66)
                        rng2 = jax.random.fold_in(kaug, 1)
                        x_aug = cr_diff_augment(rng2, x)
                        (_, _, score_ra), d_ups = d_forward(p_D, d_ups, x_aug, y)
                        d_loss = d_loss + cr_lambda * losses.l2_loss(
                            score_r, score_ra)
                    d_loss = d_loss / float(num_D_acc)
                    return d_loss, (g_ups, d_ups, embed_r, mets)

                (d_loss, (g_ups, d_ups, embed_r, mets)), grads = (
                    jax.value_and_grad(d_loss_fn, has_aux=True)(
                        params_D, state_G, state_D))
                state_G, state_D = g_ups, d_ups
                embed_real_for_iea = jax.lax.stop_gradient(embed_r)
                aux_out = mets
                grads_acc = grads if grads_acc is None else jax.tree_util.tree_map(
                    jnp.add, grads_acc, grads)
            grads_acc = apply_ortho_reg(grads_acc, params_D, d_ortho)
            if capture_grads:
                metrics["_grads_D"] = grads_acc
            updates, opt_D = d_tx.update(grads_acc, opt_D, params_D)
            params_D = optax.apply_updates(params_D, updates)
            metrics.update(aux_out)

        # ---------------- G phase ----------------
        grads_acc = None
        g_mets = None
        for acc in range(num_G_acc):
            rng, kz, krdof, kaug = jax.random.split(rng, 4)
            z = sample_z(kz, batch)

            def g_loss_fn(p_G, state_G, state_D):
                fake, g_ups = g_forward(p_G, state_G, z, y, krdof)
                if do_diff_aug:
                    fake = diff_augment(kaug, fake, diff_aug_policy)
                (proxy_f, embed_f, score_f), d_ups = d_forward(
                    params_D, state_D, fake, y)
                g_loss = losses.loss_hinge_gen(score_f)
                mets = {}
                if strategy == "Contra":
                    g_loss = g_loss + contra_lambda * losses.conditional_contrastive_loss(
                        embed_f, proxy_f, mask, y, temperature, margin,
                        pos_collected)
                    if iea_on:
                        il = losses.iea_loss(embed_f, embed_real_for_iea)
                        g_loss = g_loss + iea_lambda * il
                        mets["iea_loss"] = il
                        # reference nests the G uniformity term under IEA_loss
                        # (train_fns.py:176-178) — preserved.
                        if unif_on:
                            ug = losses.unif_loss(embed_f)
                            g_loss = g_loss + unif_lambda * ug
                            mets["unif_loss_g"] = ug
                g_loss = g_loss / float(num_G_acc)
                mets["G_loss"] = g_loss
                return g_loss, (g_ups, d_ups, mets)

            (g_loss, (g_ups, d_ups, g_mets)), grads = (
                jax.value_and_grad(g_loss_fn, has_aux=True)(
                    params_G, state_G, state_D))
            state_G, state_D = g_ups, d_ups
            grads_acc = grads if grads_acc is None else jax.tree_util.tree_map(
                jnp.add, grads_acc, grads)
        grads_acc = apply_ortho_reg(grads_acc, params_G, g_ortho,
                                    blacklist=shared_blacklist)
        if capture_grads:
            metrics["_grads_G"] = grads_acc
        if not (replicate_g_bug and clip_norm is None):
            updates, opt_G = g_tx.update(grads_acc, state.opt_G, params_G)
            params_G = optax.apply_updates(params_G, updates)
            opt_G_new = opt_G
        else:
            opt_G_new = state.opt_G
        metrics.update(g_mets)

        # ---------------- EMA ----------------
        itr = state.itr + 1
        if ema_on:
            decay = jnp.where(itr < ema_start, 0.0, ema_decay).astype(jnp.float32)
            ema_fn = lambda e, p: e * decay + p * (1.0 - decay) \
                if jnp.issubdtype(jnp.asarray(e).dtype, jnp.floating) else p
            params_G_ema = jax.tree_util.tree_map(ema_fn, state.params_G_ema,
                                                  params_G)
            state_G_ema = jax.tree_util.tree_map(ema_fn, state.state_G_ema,
                                                 state_G)
        else:
            params_G_ema, state_G_ema = state.params_G_ema, state.state_G_ema

        new_state = state.replace(
            params_G=params_G, params_D=params_D, state_G=state_G,
            state_D=state_D, opt_G=opt_G_new, opt_D=opt_D,
            params_G_ema=params_G_ema, state_G_ema=state_G_ema, itr=itr)
        metrics = {k: v if k.startswith("_") else jnp.asarray(v, jnp.float32)
                   for k, v in metrics.items()}
        return new_state, metrics

    return train_step
