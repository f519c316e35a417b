"""Loss suite: hinge, conditional-contrastive (2C), IEA attention-KL,
hypersphere uniformity, consistency l2, gradient penalties.

All pure functions over scores/embeddings; reductions in float32.
Reference: loss.py:8-288.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def loss_hinge_dis(dis_fake, dis_real):
    """Hinge D loss -> (loss_real, loss_fake) (reference: loss.py:30-33)."""
    loss_real = jnp.mean(jax.nn.relu(1.0 - dis_real.astype(jnp.float32)))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + dis_fake.astype(jnp.float32)))
    return loss_real, loss_fake


def loss_hinge_gen(dis_fake):
    """Hinge G loss (reference: loss.py:36-38)."""
    return -jnp.mean(dis_fake.astype(jnp.float32))


def unif_loss(x, t: float = 2.0):
    """Hypersphere uniformity: log mean_{i<j} exp(-t ||xi-xj||²)
    (reference: loss.py:8-9, via torch.pdist over unique pairs)."""
    x = x.astype(jnp.float32)
    n = x.shape[0]
    sq = jnp.sum(jnp.square(x), axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    d2 = jnp.maximum(d2, 0.0)
    iu = jnp.triu(jnp.ones((n, n), bool), k=1)
    vals = jnp.where(iu, jnp.exp(-t * d2), 0.0)
    return jnp.log(jnp.sum(vals) / (n * (n - 1) / 2))


def iea_loss(k_f, k_r):
    """Intra-event-aware loss: KL(softmax(k_r k_rᵀ) || softmax(k_f k_fᵀ))
    with the real-attention target detached, batchmean reduction
    (reference: loss.py:14-27)."""
    k_f = k_f.astype(jnp.float32)
    k_r = jax.lax.stop_gradient(k_r.astype(jnp.float32))
    logits_f = k_f @ k_f.T
    logits_r = k_r @ k_r.T
    log_p_f = jax.nn.log_softmax(logits_f, axis=-1)
    p_r = jax.nn.softmax(logits_r, axis=-1)
    # KLDivLoss(reduction="batchmean"): sum(p_r * (log p_r - log p_f)) / B
    log_p_r = jax.nn.log_softmax(logits_r, axis=-1)
    kld = jnp.sum(p_r * (log_p_r - log_p_f)) / k_f.shape[0]
    return kld


def l2_loss(a, b):
    """MSE consistency loss (reference: loss.py:41-44)."""
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def make_mask(labels, n_cls: int):
    """(n_cls, B) 0/1 mask of same-class membership (reference:
    utils/__init__.py:266-275), jit-friendly."""
    return (jnp.arange(n_cls)[:, None] == labels[None, :]).astype(jnp.int32)


def _cosine_sim_matrix(x, y, eps: float = 1e-8):
    # torch.nn.CosineSimilarity semantics: clamp norms at eps.
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    return xn @ yn.T


def conditional_contrastive_loss(inst_embed, proxy, negative_mask, labels,
                                 temperature, margin,
                                 pos_collected_numerator: bool = False):
    """2C conditional-contrastive loss (reference: loss.py:79-132).

    inst_embed: (B, D) instance embeddings; proxy: (B, D) per-instance class
    proxies (already gathered by label); negative_mask: (n_cls, B) from
    ``make_mask``; labels: (B,).
    """
    b = inst_embed.shape[0]
    sim = _cosine_sim_matrix(inst_embed, inst_embed)
    offdiag = ~jnp.eye(b, dtype=bool)
    instance_zone = jnp.exp((sim - margin) / temperature)
    # cosine(inst, proxy) row-wise
    i2p = jnp.sum(
        (inst_embed / jnp.maximum(jnp.linalg.norm(
            inst_embed.astype(jnp.float32), axis=-1, keepdims=True), 1e-8))
        * (proxy / jnp.maximum(jnp.linalg.norm(
            proxy.astype(jnp.float32), axis=-1, keepdims=True), 1e-8)),
        axis=-1)
    inst2proxy_positive = jnp.exp((i2p - margin) / temperature)
    if pos_collected_numerator:
        mask = negative_mask[labels]  # (B, B)
        mask = jnp.where(offdiag, mask, 0)
        inst2inst_positives = jnp.where(offdiag, instance_zone, 0.0) * mask
        numerator = inst2proxy_positive + jnp.sum(inst2inst_positives, axis=1)
    else:
        numerator = inst2proxy_positive
    denominator = inst2proxy_positive + jnp.sum(
        jnp.where(offdiag, instance_zone, 0.0), axis=1)
    return -jnp.mean(jnp.log(temperature * (numerator / denominator)))


def conditional_contrastive_loss_plus(inst_embed, proxy, negative_mask, labels,
                                      temperature, margin):
    """2C+ variant: proxy-to-instance + instance-to-instance terms
    (reference: loss.py:135-190)."""
    b = inst_embed.shape[0]
    p2i = jnp.exp((_cosine_sim_matrix(proxy, inst_embed) - margin) / temperature)
    i2i = jnp.exp((_cosine_sim_matrix(inst_embed, inst_embed) - margin) / temperature)
    mask = negative_mask[labels].astype(jnp.float32)  # (B, B)
    p2i_num = jnp.sum(p2i * mask, axis=1)
    i2i_num = jnp.sum(i2i * mask, axis=1)
    p2i_den = jnp.sum(p2i, axis=1)
    i2i_den = jnp.sum(i2i, axis=1)
    return (-jnp.mean(jnp.log(temperature * (p2i_num / p2i_den)))
            - jnp.mean(jnp.log(temperature * (i2i_num / i2i_den))))


def set_temperature(conditional_strategy, tempering_type, start_temperature,
                    end_temperature, step_count, tempering_step, total_step):
    """Temperature schedule (reference: loss.py:47-76)."""
    if conditional_strategy != "Contra":
        return "no"
    if tempering_type == "continuous":
        return (start_temperature + step_count
                * (end_temperature - start_temperature) / total_step)
    if tempering_type == "discrete":
        interval = total_step // (tempering_step + 1)
        return (start_temperature + (step_count // interval)
                * (end_temperature - start_temperature) / tempering_step)
    return start_temperature


def gradient_penalty(d_apply, variables, real, fake, labels, key,
                     conditional_strategy: str = "Contra"):
    """WGAN-GP style penalty on interpolates (reference: loss.py:193-229,
    defined upstream but unused by the train loop — provided for parity)."""
    b = real.shape[0]
    alpha = jax.random.uniform(key, (b, 1, 1, 1), dtype=real.dtype)
    interp = alpha * real + (1 - alpha) * fake

    def score(x):
        outs = d_apply(variables, x, labels)
        s = outs[2] if conditional_strategy == "Contra" else outs
        return jnp.sum(s)

    grads = jax.grad(score)(interp)
    gnorm = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(b, -1)), axis=1) + 1e-12)
    return jnp.mean(jnp.square(gnorm - 1.0))


def gradient_penalty_dragan(d_apply, variables, real, labels, key,
                            conditional_strategy: str = "Contra"):
    """DRAGAN-style penalty on noise perturbations around the real data
    (reference: loss.py:232-265 calc_derv4dra, unused by the train loop —
    provided for parity)."""
    b = real.shape[0]
    k_alpha, k_noise = jax.random.split(key)
    alpha = jax.random.uniform(k_alpha, (b, 1, 1, 1), dtype=real.dtype)
    # torch .std() is the unbiased estimator (ddof=1)
    std = jnp.std(real, ddof=1)
    differences = 0.5 * std * jax.random.uniform(k_noise, real.shape,
                                                 dtype=real.dtype)
    interp = real + alpha * differences

    def score(x):
        outs = d_apply(variables, x, labels)
        s = outs[2] if conditional_strategy == "Contra" else outs
        return jnp.sum(s)

    grads = jax.grad(score)(interp)
    gnorm = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(b, -1)), axis=1) + 1e-12)
    return jnp.mean(jnp.square(gnorm - 1.0))


def latent_gradient_norm(g_apply, d_apply, z, labels,
                         conditional_strategy: str = "Contra"):
    """Gradient of D(G(z)) w.r.t. the latents and its squared 2-norm per
    sample, (grads, norm[:, None]) (reference: loss.py:268-293 calc_derv,
    unused by the train loop — provided for parity)."""
    def score(zz):
        outs = d_apply(g_apply(zz, labels), labels)
        s = outs[2] if conditional_strategy == "Contra" else outs
        return jnp.sum(s)

    grads = jax.grad(score)(z)
    gnorm = jnp.sum(jnp.square(grads), axis=1)[:, None]
    return grads, gnorm
