"""Fused (flash) attention Pallas TPU kernel with custom VJP.

Computes softmax(scale * q kᵀ) v without materializing the (Lq, Lkv) score
matrix in HBM. Two call sites (reference analogs):
  * SA-GAN image attention (reference: layers.py:262-300): Lq = H*W up to
    3072 at D's 32x96 stage, Lkv = Lq/4, dk = ch/8 = 16, dv = ch/2, and —
    reference quirk — NO 1/sqrt(d) scaling (scale=1).
  * RRM event attention (reference: RRM.py:10-16): Lq = Lkv = event_size
    (40), scaled by 1/sqrt(head_dim).

Design: every kv sequence here fits in VMEM (Lkv <= 768), so the kernel
tiles only the q axis and keeps k/v whole — single pass, no online-softmax
rescaling. The backward pass is a second kernel that recomputes the
probabilities tile-by-tile (flash-style recompute beats writing the score
matrix to HBM on a bandwidth-bound chip) and accumulates dK/dV in VMEM
across q tiles within one grid step per batch.

Softmax statistics and accumulation are float32 regardless of input dtype.
Falls back to the XLA composition off-TPU; `interpret=True` runs the same
kernels through the Pallas interpreter (used by CPU tests).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports on TPU-capable installs; interpret mode needs pl only
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_NEG_INF = float("-inf")


def flash_attention_available() -> bool:
    try:
        return jax.default_backend() == "tpu" and pltpu is not None
    except Exception:
        return False


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ------------------------------------------------------------- forward

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, lkv):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if lkv != k.shape[0]:  # mask kv padding
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < lkv, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / l
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # (tq, 1)


def _fwd(q, k, v, scale, tq, interpret):
    b, lq, dk = q.shape
    lkv, dv = k.shape[1], v.shape[2]
    lqp = _round_up(lq, tq)
    lkp = _round_up(lkv, 8)
    qp = jnp.pad(q, ((0, 0), (0, lqp - lq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, lkp - lkv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, lkp - lkv), (0, 0)))
    grid = (b, lqp // tq)
    mem = {} if _VMEM is None else {"memory_space": _VMEM}
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, lkv=lkv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, dk), lambda bb, i: (bb, i, 0), **mem),
            pl.BlockSpec((1, lkp, dk), lambda bb, i: (bb, 0, 0), **mem),
            pl.BlockSpec((1, lkp, dv), lambda bb, i: (bb, 0, 0), **mem),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, dv), lambda bb, i: (bb, i, 0), **mem),
            pl.BlockSpec((1, tq, 1), lambda bb, i: (bb, i, 0), **mem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lqp, dv), q.dtype),
            jax.ShapeDtypeStruct((b, lqp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return o[:, :lq], lse[:, :lq, 0]


# ------------------------------------------------------------- backward

def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, *, scale, lkv, tq):
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    nq = q_ref.shape[1] // tq

    def body(i, carry):
        dk_acc, dv_acc = carry
        sl = pl.ds(i * tq, tq)
        q = q_ref[0, sl, :].astype(jnp.float32)
        do = do_ref[0, sl, :].astype(jnp.float32)
        o = o_ref[0, sl, :].astype(jnp.float32)
        lse = lse_ref[0, sl, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if lkv != k.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < lkv, s, _NEG_INF)
        p = jnp.exp(s - lse[:, None])  # (tq, lkp); zero at padded cols
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dq_ref[0, sl, :] = dq.astype(dq_ref.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk_acc = jnp.zeros(k.shape, jnp.float32)
    dv_acc = jnp.zeros(v.shape, jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, nq, body, (dk_acc, dv_acc))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _bwd(scale, tq, interpret, res, g):
    q, k, v, o, lse = res
    do = g
    b, lq, dk = q.shape
    lkv, dv = k.shape[1], v.shape[2]
    lqp = _round_up(lq, tq)
    lkp = _round_up(lkv, 8)
    pad_q = lambda t: jnp.pad(t, ((0, 0), (0, lqp - lq), (0, 0)))
    qp, op, dop = pad_q(q), pad_q(o), pad_q(do)
    kp = jnp.pad(k, ((0, 0), (0, lkp - lkv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, lkp - lkv), (0, 0)))
    # padded lse rows: value 0; their p rows are exp(-inf - 0) = 0
    lsep = jnp.pad(lse, ((0, 0), (0, lqp - lq)))[..., None]
    mem = {} if _VMEM is None else {"memory_space": _VMEM}
    full_q = lambda: pl.BlockSpec((1, lqp, dk), lambda bb: (bb, 0, 0), **mem)
    full_o = lambda: pl.BlockSpec((1, lqp, dv), lambda bb: (bb, 0, 0), **mem)
    dq, dkk, dvv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, lkv=lkv, tq=tq),
        grid=(b,),
        in_specs=[
            full_q(),
            pl.BlockSpec((1, lkp, dk), lambda bb: (bb, 0, 0), **mem),
            pl.BlockSpec((1, lkp, dv), lambda bb: (bb, 0, 0), **mem),
            full_o(),
            full_o(),
            pl.BlockSpec((1, lqp, 1), lambda bb: (bb, 0, 0), **mem),
        ],
        out_specs=[
            full_q(),
            pl.BlockSpec((1, lkp, dk), lambda bb: (bb, 0, 0), **mem),
            pl.BlockSpec((1, lkp, dv), lambda bb: (bb, 0, 0), **mem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lqp, dk), q.dtype),
            jax.ShapeDtypeStruct((b, lkp, dk), k.dtype),
            jax.ShapeDtypeStruct((b, lkp, dv), v.dtype),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, op, lsep)
    return dq[:, :lq], dkk[:, :lkv], dvv[:, :lkv]


# ------------------------------------------------------------- public API

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_3d(q, k, v, scale, tq, interpret):
    o, _ = _fwd(q, k, v, scale, tq, interpret)
    return o


def _flash_fwd_rule(q, k, v, scale, tq, interpret):
    o, lse = _fwd(q, k, v, scale, tq, interpret)
    return o, (q, k, v, o, lse)


_flash_attention_3d.defvjp(_flash_fwd_rule, _bwd)


def _pick_tq(lq: int) -> int:
    # 256 keeps the backward kernel's (tq, Lkv) temporaries (p, dp, ds) plus
    # double-buffered blocks inside the 16MB VMEM budget at Lkv=768.
    if lq >= 256 and lq % 256 == 0:
        return 256
    return _round_up(lq, 8)


# The backward kernel keeps the whole padded q-length (q, do, o, dq) plus
# k/v/dk/dv and (tq, lkp) temporaries resident per grid step — deliberate
# for this model's sites (Lq<=3072, dk=16, dv<=64: ~1MB), not shape-general.
# Shapes whose residency estimate exceeds this budget take the XLA path
# instead of failing inside Mosaic.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _bwd_vmem_estimate(lq: int, lkv: int, dk: int, dv: int, tq: int) -> int:
    lqp, lkp = _round_up(lq, tq), _round_up(lkv, 8)
    f32 = 4
    q_side = lqp * (2 * dk + 2 * dv + 1)      # q, dq, do, o, lse
    kv_side = 2 * lkp * (dk + dv)             # k, v, dk, dv accumulators
    temps = 3 * tq * lkp + tq * (dk + dv)     # s/p, dp, ds, dq tile
    return (q_side + kv_side + temps) * f32


def flash_attention(q, k, v, *, scale: float = 1.0, interpret: bool | None = None):
    """Fused attention over the last three axes; leading axes are batch.

    q: (..., Lq, dk), k: (..., Lkv, dk), v: (..., Lkv, dv) -> (..., Lq, dv).
    """
    if interpret is None:
        if os.environ.get("IEAGAN_PALLAS_INTERPRET"):
            interpret = True  # run the kernel via the interpreter (CPU CI)
        elif not flash_attention_available():
            return _xla_attention(q, k, v, scale)
        else:
            interpret = False
    lead = q.shape[:-2]
    lq, dk = q.shape[-2:]
    lkv, dv = k.shape[-2], v.shape[-1]
    if (not interpret
            and _bwd_vmem_estimate(lq, lkv, dk, dv, _pick_tq(lq))
            > _VMEM_BUDGET_BYTES):
        return _xla_attention(q, k, v, scale)
    b = 1
    for s in lead:
        b *= s
    q3 = q.reshape(b, lq, dk)
    k3 = k.reshape(b, lkv, dk)
    v3 = v.reshape(b, lkv, dv)
    o = _flash_attention_3d(q3, k3, v3, float(scale), _pick_tq(lq),
                            bool(interpret))
    return o.reshape(*lead, lq, dv)
