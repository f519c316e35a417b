"""Discriminator: BigGAN-deep stack + RRM over per-image embeddings and a
contrastive (hypersphere) conditioning head.

Mirrors reference behavior (reference: model.py:490-944):
  forward (model.py:902-944, Contra strategy):
    h = conv stack(x); h = sum-pool(relu(h))          (B, 16ch)
    out = linear0(h)                 # adversarial score, pre-RRM features
    proxy = sn_embed[y]                               (B, hyper)
    h = RRM(h per event)             # RRM_embed      (B, 16ch)
    embed = LayerNorm(linear1(h))                     (B, hyper)
    [RRM_prx_D: proxy = RRM(proxy per event)]
    [nonlinear_embed: embed = linear2(act(embed))]
    [normalize_embed: l2-normalize proxy & embed]
    returns (proxy, embed, out)
"""

from __future__ import annotations

import functools
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ieagan_tpu.models.arch import d_arch
from ieagan_tpu.ops.spectral import SNDense, SNConv, SNEmbed
from ieagan_tpu.ops.norm import LayerNorm
from ieagan_tpu.ops.attention import SelfAttention2d, CBAMAttention, ILA
from ieagan_tpu.ops.rrm import RelationalReasoning
from ieagan_tpu.models.generator import ACTIVATIONS


def avg_pool_2x2(x):
    """2x2 stride-2 average pool (reference: F.avg_pool2d, model.py:497).

    Kept as reduce-window: reformulations that avoid its spatial-minor
    layout (strided-slice add, reshape+mean) were measured to blow the
    flagship step's HBM budget at compile (18-22G vs 15.75G) — their
    backwards break the auto-remat schedule the baseline relies on."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DBlock(nn.Module):
    """BigGAN-deep discriminator bottleneck block (reference: model.py:490-557):
    1x1 -> 3x3 -> 3x3 (pre-activations) -> avgpool -> 1x1, with a
    concat-grown shortcut (channels in -> out via conv on the extra part)."""
    in_channels: int
    out_channels: int
    which_conv: Any
    activation: Any
    preactivation: bool = True
    downsample: bool = False
    channel_ratio: int = 4

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        hidden = self.out_channels // self.channel_ratio
        act = self.activation
        h = nn.relu(x) if self.preactivation else x
        h = self.which_conv(hidden, kernel_size=(1, 1), name="conv1")(
            h, update_stats=update_stats)
        h = self.which_conv(hidden, kernel_size=(3, 3), name="conv2")(
            act(h), update_stats=update_stats)
        h = self.which_conv(hidden, kernel_size=(3, 3), name="conv3")(
            act(h), update_stats=update_stats)
        h = act(h)
        if self.downsample:
            h = avg_pool_2x2(h)
        h = self.which_conv(self.out_channels, kernel_size=(1, 1), name="conv4")(
            h, update_stats=update_stats)
        # shortcut (reference: model.py:534-539)
        sc = x
        if self.downsample:
            sc = avg_pool_2x2(sc)
        if self.in_channels != self.out_channels:
            extra = self.which_conv(self.out_channels - self.in_channels,
                                    kernel_size=(1, 1), name="conv_sc")(
                                        sc, update_stats=update_stats)
            sc = jnp.concatenate([sc, extra], axis=-1)
        return h + sc


class Discriminator(nn.Module):
    D_ch: int = 32
    D_wide: bool = True
    D_depth: int = 2
    resolution: int = 256
    D_attn: str = "32"
    n_classes: int = 40
    attn_type: str = "sa"
    num_D_SVs: int = 1
    num_D_SV_itrs: int = 1
    D_activation: str = "inplace_relu"
    conditional_strategy: str = "Contra"
    SN_eps: float = 1e-6
    output_dim: int = 1
    D_param: str = "SN"
    hypersphere_dim: int = 1024
    nonlinear_embed: bool = False
    normalize_embed: bool = True
    prior_embed: bool = False
    RRM_prx_D: bool = False
    RRM_embed: bool = True
    n_head_D: int = 4
    event_size: int = 40
    # Reference bit-parity: feed the WHOLE input batch to RR_D/RR_Dproxy as
    # one sequence (reference model.py:918,930 h.unsqueeze(0) — in concat
    # mode that is a mixed 2*event_size [fake; real] sequence). Default
    # keeps per-event sequences, the documented deviation (train/step.py).
    rrm_full_batch_sequence: bool = False
    dtype: Any = jnp.float32
    use_pallas: bool = False
    # False / True / "wide" — "wide" remats only the first two (input-
    # resolution) stages, D's analog of the generator's policy.
    remat: Any = False

    @classmethod
    def from_config(cls, config: dict, dtype=None) -> "Discriminator":
        keys = {f for f in cls.__dataclass_fields__}
        kwargs = {k: v for k, v in config.items() if k in keys}
        kwargs["event_size"] = int(config.get("n_classes", 40))
        # Reference reads n_head_D which is absent from config.json, silently
        # defaulting to 4 (SURVEY.md §2.3) — reproduced by this filter.
        if dtype is not None:
            kwargs["dtype"] = dtype
        kwargs["use_pallas"] = bool(config.get("use_pallas_attention", False))
        r = config.get("remat_D")
        if r is None:
            r = config.get("remat", False)
        kwargs["remat"] = r if isinstance(r, str) else bool(r)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, x, y, train: bool = True, update_stats: bool = None):
        """x: (B, H, W, 1) images in [-1,1]; y: (B,) int labels.
        Returns (cls_proxy, cls_embed, out) under the Contra strategy."""
        if update_stats is None:
            update_stats = train
        arch = d_arch(self.D_ch, self.D_attn)[self.resolution]
        act = ACTIVATIONS[self.D_activation]
        sn_kw = dict(num_svs=self.num_D_SVs, num_itrs=self.num_D_SV_itrs,
                     eps=self.SN_eps, dtype=self.dtype)
        which_conv = functools.partial(SNConv, **sn_kw)
        which_linear = functools.partial(SNDense, **sn_kw)
        which_embedding = functools.partial(SNEmbed, **sn_kw)

        def _stem(mdl, xin, update_stats):
            # input_conv + the first block as ONE remat segment: with them
            # remat'd separately, the saved residual is input_conv's
            # 32-channel map — the single largest allocation in the epb=3
            # OOM dump (1.41GiB per D pass at batch 120, saved twice under
            # split_D). Folded, the residual is the 1-channel image (47MB).
            h = which_conv(arch["in_channels"][0], kernel_size=(3, 3),
                           name="input_conv")(xin, update_stats=update_stats)
            return DBlock(in_channels=arch["in_channels"][0],
                          out_channels=arch["out_channels"][0],
                          which_conv=which_conv, activation=act,
                          preactivation=False,
                          downsample=arch["downsample"][0],
                          name="blocks_0_0")(h, update_stats)

        fold_stem = bool(self.remat)  # True and "wide" both remat stage 0
        if fold_stem:
            h = nn.remat(_stem, static_argnums=(2,))(
                self, x.astype(self.dtype), update_stats)
        else:
            h = _stem(self, x.astype(self.dtype), update_stats)
        remat_cls = nn.remat(DBlock, static_argnums=(2,))
        for index in range(len(arch["out_channels"])):
            if self.remat == "wide":
                block_cls = remat_cls if index < 2 else DBlock
            else:
                block_cls = remat_cls if self.remat else DBlock
            for d_index in range(self.D_depth):
                if index == 0 and d_index == 0:
                    continue  # folded into _stem above
                h = block_cls(
                    in_channels=(arch["in_channels"][index] if d_index == 0
                                 else arch["out_channels"][index]),
                    out_channels=arch["out_channels"][index],
                    which_conv=which_conv, activation=act,
                    preactivation=(index > 0 or d_index > 0),
                    downsample=(arch["downsample"][index] and d_index == 0),
                    name=f"blocks_{index}_{d_index}")(h, update_stats)
            if arch["attention"][arch["resolution"][index]]:
                ch_out = arch["out_channels"][index]
                if self.attn_type == "sa":
                    h = SelfAttention2d(ch_out, which_conv, dtype=self.dtype,
                                        use_pallas=self.use_pallas,
                                        name=f"attn_{index}")(
                                            h, update_stats=update_stats)
                elif self.attn_type == "cbam":
                    h = CBAMAttention(ch_out, which_conv, dtype=self.dtype,
                                      name=f"attn_{index}")(
                                          h, update_stats=update_stats)
                elif self.attn_type == "ila":
                    h = ILA(ch_out, dtype=self.dtype, name=f"attn_{index}")(h)

        # Global sum pooling of activations (reference: model.py:912).
        h = jnp.sum(act(h), axis=(1, 2))  # (B, 16ch)
        top = arch["out_channels"][-1]

        if self.conditional_strategy == "Contra":
            # Adversarial score from pre-RRM features (reference: model.py:915).
            out = which_linear(self.output_dim, name="linear0")(
                h, update_stats=update_stats)
            out = jnp.squeeze(out, axis=-1)
            # prior_embed halves the proxy embedding and fuses a learned map
            # of the physical prior feature (reference: model.py:827-834,
            # 925-928).
            proxy_dim = (self.hypersphere_dim // 2 if self.prior_embed
                         else self.hypersphere_dim)
            cls_proxy = which_embedding(self.n_classes, proxy_dim,
                                        name="embed")(y, update_stats=update_stats)
            if self.prior_embed:
                from ieagan_tpu.ops.prior import prior_features
                prs = prior_features(y, self.n_classes).astype(cls_proxy.dtype)
                feat = which_linear(self.hypersphere_dim // 2, name="linear3")(
                    prs, update_stats=update_stats)
                cls_proxy = which_linear(self.hypersphere_dim, name="linear4")(
                    jnp.concatenate([cls_proxy, feat], axis=-1),
                    update_stats=update_stats)
            if self.RRM_embed:
                seq = (h.shape[0] if self.rrm_full_batch_sequence
                       else self.event_size)
                events = h.shape[0] // seq
                h_seq = h.reshape(events, seq, top)
                # SN linears inside D's RRM (reference: model.py:788-797).
                h_seq = RelationalReasoning(
                    num_layers=1, input_dim=top, num_heads=self.n_head_D,
                    dim_feedforward=512, which_linear=which_linear,
                    dtype=self.dtype, use_pallas=self.use_pallas,
                    name="RR_D")(h_seq, update_stats=update_stats)
                h = h_seq.reshape(-1, top)
                cls_embed = which_linear(self.hypersphere_dim, name="linear1")(
                    h, update_stats=update_stats)
                cls_embed = LayerNorm(dtype=self.dtype, name="norm")(cls_embed)
            else:
                cls_embed = which_linear(self.hypersphere_dim, name="linear1")(
                    h, update_stats=update_stats)
            if self.RRM_prx_D:
                seq = (cls_proxy.shape[0] if self.rrm_full_batch_sequence
                       else self.event_size)
                events = cls_proxy.shape[0] // seq
                p_seq = cls_proxy.reshape(events, seq,
                                          self.hypersphere_dim)
                p_seq = RelationalReasoning(
                    num_layers=1, input_dim=self.hypersphere_dim,
                    num_heads=self.n_head_D,
                    dim_feedforward=self.hypersphere_dim,
                    which_linear=which_linear, dtype=self.dtype,
                    use_pallas=self.use_pallas, name="RR_Dproxy")(
                        p_seq, update_stats=update_stats)
                cls_proxy = p_seq.reshape(-1, self.hypersphere_dim)
            if self.nonlinear_embed:
                cls_embed = which_linear(self.hypersphere_dim, name="linear2")(
                    act(cls_embed), update_stats=update_stats)
            if self.normalize_embed:
                norm = lambda t: (t / jnp.maximum(
                    jnp.linalg.norm(t.astype(jnp.float32), axis=-1, keepdims=True),
                    1e-12)).astype(t.dtype)
                cls_proxy = norm(cls_proxy)
                cls_embed = norm(cls_embed)
            return cls_proxy, cls_embed, out

        elif self.conditional_strategy == "Proj":
            out = which_linear(self.output_dim, name="linear0")(
                h, update_stats=update_stats)
            emb = which_embedding(self.n_classes, top, name="embed")(
                y, update_stats=update_stats)
            out = out + jnp.sum(emb * h, axis=1, keepdims=True)
            return out
        raise NotImplementedError(self.conditional_strategy)
