"""Generator: BigGAN-deep stack with RRM over class-proxy embeddings.

Mirrors the reference Generator's behavior (reference: model.py:139-487) in a
TPU-first design: NHWC layout, bf16 compute / fp32 params+stats, explicit RNG
for the per-event random degrees of freedom, and the intra-event (40-sensor)
axis expressed as a real sequence axis for the RRM.

Forward (reference: model.py:454-487):
  y = shared_embedding[labels]                      (B, shared_dim)
  y = linear_f([y, rdof~N(0,1)])                    (B, 128)   [RRM_prx_G]
  y = RRM(y grouped per event)                      (B, 128)
  z = [y, z]; cond = z                              (B, 256)   [hier]
  h = linear(z) -> (B, 4, 4*H_base, 16ch)
  6 stages x depth-2 deep-bottleneck GBlocks (ccbn conditioned on cond)
  out = tanh(conv(relu(bn(h))))                     (B, 256, 768, 1)
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ieagan_tpu.models.arch import g_arch
from ieagan_tpu.ops.spectral import SNDense, SNConv, Dense, Embed
from ieagan_tpu.ops.norm import ClassCondBatchNorm, BatchNorm
from ieagan_tpu.ops.attention import SelfAttention2d, CBAMAttention, ILA
from ieagan_tpu.ops.rrm import RelationalReasoning

ACTIVATIONS = {
    "inplace_relu": nn.relu,
    "relu": nn.relu,
    "leaky_relu": functools.partial(nn.leaky_relu, negative_slope=0.2),
}


def upsample_2x(x):
    """Nearest-neighbor 2x upsample, NHWC (reference F.interpolate
    scale_factor=2, default nearest; model.py:338)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class GBlock(nn.Module):
    """BigGAN-deep generator bottleneck block (reference: model.py:16-71):
    four convs (1x1 -> 3x3 -> 3x3 -> 1x1) at in/4 hidden width, ccbn+relu
    pre-activations, channel-drop shortcut, optional 2x upsample."""
    in_channels: int
    out_channels: int
    which_conv: Any
    which_bn: Any
    activation: Any
    upsample: bool = False
    channel_ratio: int = 4

    @nn.compact
    def __call__(self, x, y, train: bool = True, update_stats: bool = False,
                 accumulate_standing: bool = False):
        hidden = self.in_channels // self.channel_ratio
        bn_kw = dict(train=train, update_stats=update_stats,
                     accumulate_standing=accumulate_standing)
        act = self.activation
        h = self.which_bn(self.in_channels, name="bn1")(x, y, **bn_kw)
        h = self.which_conv(hidden, kernel_size=(1, 1), name="conv1")(
            act(h), update_stats=update_stats)
        h = act(self.which_bn(hidden, name="bn2")(h, y, **bn_kw))
        if self.in_channels != self.out_channels:
            x = x[..., : self.out_channels]
        if self.upsample:
            h = upsample_2x(h)
            x = upsample_2x(x)
        h = self.which_conv(hidden, kernel_size=(3, 3), name="conv2")(
            h, update_stats=update_stats)
        h = self.which_conv(hidden, kernel_size=(3, 3), name="conv3")(
            act(self.which_bn(hidden, name="bn3")(h, y, **bn_kw)),
            update_stats=update_stats)
        h = self.which_conv(self.out_channels, kernel_size=(1, 1), name="conv4")(
            act(self.which_bn(hidden, name="bn4")(h, y, **bn_kw)),
            update_stats=update_stats)
        return h + x


class Generator(nn.Module):
    """Flax Generator; configure with ``Generator.from_config(config)``."""
    G_ch: int = 32
    G_depth: int = 2
    dim_z: int = 128
    bottom_width: int = 4
    H_base: int = 3
    resolution: int = 256
    G_attn: str = "0"
    n_classes: int = 40
    G_shared: bool = True
    shared_dim: int = 128
    rdof_dim: int = 4
    hier: bool = True
    G_activation: str = "inplace_relu"
    BN_eps: float = 1e-5
    SN_eps: float = 1e-6
    num_G_SVs: int = 1
    num_G_SV_itrs: int = 1
    attn_type: str = "sa"
    RRM_prx_G: bool = True
    normalized_proxy_G: bool = False
    prior_embed: bool = False
    n_head_G: int = 2
    G_param: str = "SN"
    norm_style: str = "bn"
    event_size: int = 40
    dtype: Any = jnp.float32
    use_pallas: bool = False
    # False: no remat; True: remat every block; "wide": remat only the two
    # highest-resolution stages (where activation memory concentrates) and
    # keep the cheap narrow stages' activations resident.
    remat: Any = False

    @classmethod
    def from_config(cls, config: dict, dtype=None) -> "Generator":
        keys = {f.name for f in cls.__dataclass_fields__.values()} if hasattr(cls, "__dataclass_fields__") else set()
        kwargs = {k: v for k, v in config.items() if k in keys}
        kwargs["event_size"] = int(config.get("n_classes", 40))
        if dtype is not None:
            kwargs["dtype"] = dtype
        kwargs["use_pallas"] = bool(config.get("use_pallas_attention", False))
        r = config.get("remat_G")
        if r is None:
            r = config.get("remat", False)
        kwargs["remat"] = r if isinstance(r, str) else bool(r)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, z, y, train: bool = True, update_stats: bool = None,
                 accumulate_standing: bool = False):
        """z: (B, dim_z) float; y: (B,) int labels. B = events * event_size."""
        if update_stats is None:
            update_stats = train
        arch = g_arch(self.G_ch, self.G_attn)[self.resolution]
        act = ACTIVATIONS[self.G_activation]
        shared_dim = self.shared_dim if self.shared_dim > 0 else self.dim_z

        sn_kw = dict(num_svs=self.num_G_SVs, num_itrs=self.num_G_SV_itrs,
                     eps=self.SN_eps, dtype=self.dtype)
        if self.G_param == "SN":
            which_linear = functools.partial(SNDense, **sn_kw)
            which_conv = functools.partial(SNConv, **sn_kw)
        else:
            which_linear = functools.partial(Dense, dtype=self.dtype)
            which_conv = functools.partial(nn.Conv, dtype=self.dtype)
        # ccbn's linears: shared-mode uses bias-free (SN)Linear
        # (reference: model.py:264-268)
        bn_linear = functools.partial(which_linear, use_bias=False)
        which_bn = functools.partial(ClassCondBatchNorm, which_linear=bn_linear,
                                     eps=self.BN_eps, norm_style=self.norm_style,
                                     dtype=self.dtype)

        if self.prior_embed:
            # Physical-prior conditioning (reference: model.py:284-292,
            # 455-460): half-width shared embedding + a learned map of the
            # per-sensor prior feature, fused by linear1.
            from ieagan_tpu.ops.prior import prior_features
            y_emb = Embed(self.n_classes, shared_dim // 2, dtype=self.dtype,
                          name="shared")(y)
            prs = prior_features(y, self.n_classes).astype(y_emb.dtype)
            feat = which_linear(shared_dim // 2, name="linear0")(
                prs, update_stats=update_stats)
            y_emb = which_linear(shared_dim, name="linear1")(
                jnp.concatenate([y_emb, feat], axis=-1),
                update_stats=update_stats)
        else:
            # Non-SN shared embedding (reference: model.py:261-263).
            y_emb = Embed(self.n_classes, shared_dim, dtype=self.dtype,
                          name="shared")(y)

        if self.RRM_prx_G:
            # Per-image random degrees of freedom; the reference hardcodes
            # shape (40, rdof) (model.py:466) — here it's (B, rdof).
            rdof = jax.random.normal(self.make_rng("rdof"),
                                     (y_emb.shape[0], self.rdof_dim), jnp.float32)
            y_emb = which_linear(128, name="linear_f")(
                jnp.concatenate([y_emb, rdof.astype(y_emb.dtype)], axis=-1),
                update_stats=update_stats)
            # RRM over the intra-event axis; plain Dense internals
            # (reference: model.py:305-313 uses nn.Linear).
            events = y_emb.shape[0] // self.event_size
            y_seq = y_emb.reshape(events, self.event_size, 128)
            y_seq = RelationalReasoning(
                num_layers=1, input_dim=128, num_heads=self.n_head_G,
                dim_feedforward=128,
                which_linear=functools.partial(Dense, dtype=self.dtype),
                dtype=self.dtype, use_pallas=self.use_pallas, name="RR_G")(y_seq)
            y_emb = y_seq.reshape(-1, 128)
            if self.normalized_proxy_G:
                y_emb = y_emb / jnp.maximum(
                    jnp.linalg.norm(y_emb, axis=-1, keepdims=True), 1e-12)

        if self.hier:
            z = jnp.concatenate([y_emb, z.astype(y_emb.dtype)], axis=-1)
            cond = z
        else:
            cond = y_emb

        h = which_linear(arch["in_channels"][0] * self.bottom_width ** 2
                         * self.H_base, name="linear")(z, update_stats=update_stats)
        # reference reshape (B, C, bw, bw*H_base) NCHW (model.py:477-479);
        # NHWC here with channels minor for the MXU.
        h = h.reshape(h.shape[0], arch["in_channels"][0], self.bottom_width,
                      self.bottom_width * self.H_base)
        h = h.transpose(0, 2, 3, 1)

        # remat: recompute block activations in the backward pass — trades
        # ~30% FLOPs for O(depth) activation memory, the jax.checkpoint
        # pattern for training more events per chip. "wide" remats only the
        # last two (highest-resolution) stages: with channels halving per
        # upsample, H*W*C doubles per stage, so those two stages hold most
        # of the resident activation bytes while costing the least recompute
        # relative to savings.
        remat_cls = nn.remat(GBlock, static_argnums=(3, 4, 5))
        n_stages = len(arch["out_channels"])
        blk_args = (train, update_stats, accumulate_standing)

        def _attention(h, index):
            ch_out = arch["out_channels"][index]
            if self.attn_type == "sa":
                return SelfAttention2d(ch_out, which_conv, dtype=self.dtype,
                                       use_pallas=self.use_pallas,
                                       name=f"attn_{index}")(
                                           h, update_stats=update_stats)
            elif self.attn_type == "cbam":
                return CBAMAttention(ch_out, which_conv, dtype=self.dtype,
                                     name=f"attn_{index}")(
                                         h, update_stats=update_stats)
            elif self.attn_type == "ila":
                return ILA(ch_out, dtype=self.dtype, name=f"attn_{index}")(h)
            return h

        def _tail(mdl, h, cond, train, update_stats, accumulate_standing):
            # Final block + output head as ONE remat segment: un-remat'd,
            # the head keeps the last block's full-resolution output
            # resident for its backward (1.5GiB at batch 120 — a top-3
            # allocation in the epb=3 OOM dump). Folded, only the block's
            # (pre-upsample, 4x smaller) input is saved and the head is
            # recomputed — a 3x3 conv + BN, negligible FLOPs.
            last = n_stages - 1
            h = GBlock(
                in_channels=arch["in_channels"][last],
                out_channels=(arch["in_channels"][last] if self.G_depth == 1
                              else arch["out_channels"][last]),
                which_conv=which_conv, which_bn=which_bn, activation=act,
                upsample=arch["upsample"][last],
                name=f"blocks_{last}_{self.G_depth - 1}")(
                    h, cond, train, update_stats, accumulate_standing)
            if arch["attention"][arch["resolution"][last]]:
                h = _attention(h, last)
            h = BatchNorm(arch["out_channels"][-1], eps=1e-5, dtype=self.dtype,
                          name="output_bn")(h, train=train,
                                            accumulate_standing=accumulate_standing)
            h = which_conv(1, kernel_size=(3, 3), name="output_conv")(
                act(h), update_stats=update_stats)
            return jnp.tanh(h.astype(jnp.float32)).astype(self.dtype)

        for index in range(n_stages):
            if self.remat == "wide":
                block_cls = remat_cls if index >= n_stages - 2 else GBlock
            else:
                block_cls = remat_cls if self.remat else GBlock
            for g_index in range(self.G_depth):
                if index == n_stages - 1 and g_index == self.G_depth - 1:
                    continue  # folded into _tail below
                h = block_cls(
                    in_channels=arch["in_channels"][index],
                    out_channels=(arch["in_channels"][index] if g_index == 0
                                  else arch["out_channels"][index]),
                    which_conv=which_conv, which_bn=which_bn, activation=act,
                    upsample=(arch["upsample"][index]
                              and g_index == self.G_depth - 1),
                    name=f"blocks_{index}_{g_index}")(h, cond, *blk_args)
            if (arch["attention"][arch["resolution"][index]]
                    and index != n_stages - 1):
                h = _attention(h, index)

        if self.remat:  # True and "wide" both remat the final stage
            return nn.remat(_tail, static_argnums=(3, 4, 5))(
                self, h, cond, *blk_args)
        return _tail(self, h, cond, *blk_args)
