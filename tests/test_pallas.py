"""Pallas flash-attention kernel numerics vs the XLA reference, run through
the Pallas interpreter on CPU (compiled Mosaic path exercised on TPU by
bench/entry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ieagan_tpu.ops.pallas.flash_attention import (
    flash_attention, _xla_attention)


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


CASES = [
    # (B, Lq, Lkv, dk, dv, scale)     — call-site shapes
    (2, 40, 40, 64, 64, 0.125),       # RRM event attention (G, 2 heads)
    (3, 64, 16, 16, 32, 1.0),         # SA-GAN-like, no scaling, kv padding
    (1, 512, 128, 16, 64, 1.0),       # D image attention (scaled down)
    (2, 24, 12, 8, 8, 0.5),           # ragged/padded everything
]


@pytest.mark.parametrize("b,lq,lkv,dk,dv,scale", CASES)
def test_forward_matches_xla(b, lq, lkv, dk, dv, scale):
    q, k, v = _rand((b, lq, dk), 0), _rand((b, lkv, dk), 1), _rand((b, lkv, dv), 2)
    want = _xla_attention(q, k, v, scale)
    got = flash_attention(q, k, v, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("b,lq,lkv,dk,dv,scale", CASES[:3])
def test_gradients_match_xla(b, lq, lkv, dk, dv, scale):
    q, k, v = _rand((b, lq, dk), 3), _rand((b, lkv, dk), 4), _rand((b, lkv, dv), 5)
    w = _rand((b, lq, dv), 6)  # cotangent-shaping weights

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) * w)

    def loss_pal(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale, interpret=True) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_multihead_leading_axes():
    q, k, v = _rand((2, 4, 40, 16), 7), _rand((2, 4, 40, 16), 8), _rand((2, 4, 40, 16), 9)
    want = _xla_attention(q, k, v, 0.25)
    got = flash_attention(q, k, v, scale=0.25, interpret=True)
    assert got.shape == (2, 4, 40, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bfloat16_inputs():
    q, k, v = (_rand((2, 64, 16), 10).astype(jnp.bfloat16),
               _rand((2, 16, 16), 11).astype(jnp.bfloat16),
               _rand((2, 16, 32), 12).astype(jnp.bfloat16))
    want = _xla_attention(q, k, v, 1.0)
    got = flash_attention(q, k, v, scale=1.0, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_vmem_guard_envelope():
    """Model call-site shapes stay inside the kernel's VMEM residency
    envelope; out-of-envelope shapes route to the XLA path rather than
    failing inside Mosaic (the bwd kernel keeps the whole padded q-length
    resident by design — not shape-general)."""
    from ieagan_tpu.ops.pallas.flash_attention import (
        _bwd_vmem_estimate, _pick_tq, _VMEM_BUDGET_BYTES)
    for lq, lkv, dk, dv in [(40, 40, 64, 64),       # RRM
                            (3072, 768, 16, 64)]:   # D image attention
        est = _bwd_vmem_estimate(lq, lkv, dk, dv, _pick_tq(lq))
        assert est <= _VMEM_BUDGET_BYTES, (lq, est)
    big = _bwd_vmem_estimate(65536, 768, 64, 512, _pick_tq(65536))
    assert big > _VMEM_BUDGET_BYTES
    # out-of-envelope call still computes correctly (via the XLA fallback;
    # interpret=None exercises the dispatch logic itself)
    q, k, v = _rand((1, 64, 8), 20), _rand((1, 16384, 8), 21), _rand((1, 16384, 600), 22)
    want = _xla_attention(q, k, v, 1.0)
    got = flash_attention(q, k, v, scale=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_through_model_path(monkeypatch):
    """The attention modules route through the Pallas kernel (interpreter
    mode on CPU) and reproduce the XLA-path forward."""
    monkeypatch.setenv("IEAGAN_PALLAS_INTERPRET", "1")
    from tests.helpers import tiny_config
    from ieagan_tpu.models import Discriminator
    cfg_x = tiny_config(compute_dtype="float32")            # XLA path
    cfg_p = dict(cfg_x, use_pallas_attention=True)          # kernel path
    Dx = Discriminator.from_config(cfg_x)
    Dp = Discriminator.from_config(cfg_p)
    B = cfg_x["n_classes"] * cfg_x["events_per_batch"]
    x = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (B, cfg_x["resolution"], cfg_x["resolution"], 1)), jnp.float32)
    y = jnp.tile(jnp.arange(cfg_x["n_classes"]), cfg_x["events_per_batch"])
    v = Dx.init({"params": jax.random.PRNGKey(0)}, x, y, train=False)
    out_x = Dx.apply(v, x, y, train=False)
    out_p = Dp.apply(v, x, y, train=False)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
