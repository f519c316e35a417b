"""Cross-framework parity: our RRM transformer vs a torch oracle built
in-test from the documented architecture (pre-LN encoder, fused qkv with
per-head packing, final LayerNorm — reference: RRM.py:10-133)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def torch_rrm_forward(x, weights, num_heads):
    """Oracle: numpy/torch forward of one pre-LN encoder block + final LN,
    with the packed-qkv layout [head, (q|k|v), head_dim]."""
    t = torch.from_numpy(x)
    b, s, e = t.shape
    hd = e // num_heads

    def linear(v, w, bias):
        return v @ torch.from_numpy(w) + torch.from_numpy(bias)

    def layer_norm(v, scale, bias):
        mean = v.mean(-1, keepdim=True)
        var = v.var(-1, unbiased=False, keepdim=True)
        return (v - mean) / torch.sqrt(var + 1e-5) * torch.from_numpy(scale) \
            + torch.from_numpy(bias)

    h = layer_norm(t, *weights["norm1"])
    qkv = linear(h, *weights["qkv"])  # (b, s, 3e)
    qkv = qkv.reshape(b, s, num_heads, 3 * hd).permute(0, 2, 1, 3)
    q, k, v = qkv.chunk(3, dim=-1)
    attn = torch.softmax(q @ k.transpose(-2, -1) / (hd ** 0.5), dim=-1)
    vals = (attn @ v).permute(0, 2, 1, 3).reshape(b, s, e)
    t = t + linear(vals, *weights["o"])
    h = layer_norm(t, *weights["norm2"])
    h = linear(h, *weights["lin1"])
    h = torch.relu(h)
    t = t + linear(h, *weights["lin2"])
    return layer_norm(t, *weights["norm"]).numpy()


def test_rrm_matches_torch_oracle():
    from ieagan_tpu.ops.rrm import RelationalReasoning
    from ieagan_tpu.ops.spectral import Dense
    import functools

    e, heads, s, b = 32, 4, 40, 2
    mod = RelationalReasoning(num_layers=1, input_dim=e, num_heads=heads,
                              dim_feedforward=e,
                              which_linear=functools.partial(Dense))
    x = np.random.RandomState(0).randn(b, s, e).astype(np.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    blk = params["layers_0"]
    weights = {
        "norm1": (np.asarray(blk["norm1"]["scale"]), np.asarray(blk["norm1"]["bias"])),
        "norm2": (np.asarray(blk["norm2"]["scale"]), np.asarray(blk["norm2"]["bias"])),
        "qkv": (np.asarray(blk["self_attn"]["qkv_proj"]["kernel"]),
                np.asarray(blk["self_attn"]["qkv_proj"]["bias"])),
        "o": (np.asarray(blk["self_attn"]["o_proj"]["kernel"]),
              np.asarray(blk["self_attn"]["o_proj"]["bias"])),
        "lin1": (np.asarray(blk["linear1"]["kernel"]), np.asarray(blk["linear1"]["bias"])),
        "lin2": (np.asarray(blk["linear2"]["kernel"]), np.asarray(blk["linear2"]["bias"])),
        "norm": (np.asarray(params["norm"]["scale"]), np.asarray(params["norm"]["bias"])),
    }
    theirs = torch_rrm_forward(x, weights, heads)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def test_rrm_permutation_equivariance():
    """The RRM must be permutation-equivariant over the event axis (no
    positional encoding — sensors are a set)."""
    from ieagan_tpu.ops.rrm import RelationalReasoning
    from ieagan_tpu.ops.spectral import Dense
    import functools
    e, s = 16, 8
    mod = RelationalReasoning(num_layers=2, input_dim=e, num_heads=2,
                              dim_feedforward=32,
                              which_linear=functools.partial(Dense))
    x = jnp.asarray(np.random.RandomState(1).randn(1, s, e), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    out = mod.apply({"params": params}, x)
    perm = np.random.RandomState(2).permutation(s)
    out_perm = mod.apply({"params": params}, x[:, perm])
    np.testing.assert_allclose(np.asarray(out[:, perm]), np.asarray(out_perm),
                               rtol=1e-4, atol=1e-5)
