"""Model construction + forward contract tests (reference analog:
tests/test_models.py:24-29)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ieagan_tpu.core.config import DEFAULT_CONFIG
from ieagan_tpu.models import Generator, Discriminator, g_arch, d_arch
from tests.helpers import tiny_config


def test_arch_tables_match_reference_channels():
    g = g_arch(32, "0")[256]
    assert g["in_channels"] == [512, 512, 256, 256, 128, 64]
    assert g["out_channels"] == [512, 256, 256, 128, 64, 32]
    assert g["resolution"] == [8, 16, 32, 64, 128, 256]
    d = d_arch(32, "32")[256]
    assert d["in_channels"] == [32, 64, 128, 256, 256, 512]
    assert d["out_channels"] == [64, 128, 256, 256, 512, 512]
    assert d["attention"][32] and not d["attention"][64]


def test_flagship_models_construct():
    # Construction from the full reference config must not raise.
    G = Generator.from_config(dict(DEFAULT_CONFIG))
    D = Discriminator.from_config(dict(DEFAULT_CONFIG))
    assert G.resolution == 256 and G.H_base == 3 and G.n_classes == 40
    assert D.hypersphere_dim == 1024 and D.RRM_embed
    assert D.n_head_D == 4  # config.json lacks n_head_D; default must win


class TestTinyForward:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_config()
        G = Generator.from_config(cfg)
        D = Discriminator.from_config(cfg)
        B = cfg["n_classes"] * cfg["events_per_batch"]
        z = jax.random.normal(jax.random.PRNGKey(0), (B, cfg["dim_z"]))
        y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])
        gv = G.init({"params": jax.random.PRNGKey(1), "rdof": jax.random.PRNGKey(2)},
                    z, y, train=False)
        return cfg, G, D, gv, z, y

    def test_generator_forward(self, setup):
        cfg, G, D, gv, z, y = setup
        imgs, ups = G.apply(gv, z, y, train=True, rngs={"rdof": jax.random.PRNGKey(3)},
                            mutable=["batch_stats", "spectral"])
        B = z.shape[0]
        assert imgs.shape == (B, cfg["resolution"],
                              cfg["resolution"] * cfg["H_base"], 1)
        assert float(jnp.abs(imgs).max()) <= 1.0  # tanh range
        assert "batch_stats" in ups and "spectral" in ups

    def test_bn_running_stats_update_in_train_only(self, setup):
        cfg, G, D, gv, z, y = setup
        _, ups = G.apply(gv, z, y, train=True, rngs={"rdof": jax.random.PRNGKey(3)},
                         mutable=["batch_stats", "spectral"])
        before = jax.tree_util.tree_leaves(gv["batch_stats"])
        after = jax.tree_util.tree_leaves(ups["batch_stats"])
        assert any(bool(jnp.any(b != a)) for b, a in zip(before, after))
        _, ups_eval = G.apply(gv, z, y, train=False,
                              rngs={"rdof": jax.random.PRNGKey(3)},
                              mutable=["batch_stats", "spectral"])
        after_eval = jax.tree_util.tree_leaves(ups_eval["batch_stats"])
        assert all(bool(jnp.all(b == a)) for b, a in zip(before, after_eval))

    def test_sn_u_updates_in_train_only(self, setup):
        cfg, G, D, gv, z, y = setup
        _, ups = G.apply(gv, z, y, train=True, rngs={"rdof": jax.random.PRNGKey(3)},
                         mutable=["batch_stats", "spectral"])
        before = gv["spectral"]
        after = ups["spectral"]
        diffs = jax.tree_util.tree_map(lambda a, b: bool(jnp.any(a != b)),
                                       before, after)
        assert any(jax.tree_util.tree_leaves(diffs))
        _, ups_eval = G.apply(gv, z, y, train=False,
                              rngs={"rdof": jax.random.PRNGKey(3)},
                              mutable=["batch_stats", "spectral"])
        same = jax.tree_util.tree_map(lambda a, b: bool(jnp.all(a == b)),
                                      before, ups_eval["spectral"])
        assert all(jax.tree_util.tree_leaves(same))

    def test_discriminator_contract(self, setup):
        cfg, G, D, gv, z, y = setup
        imgs = G.apply(gv, z, y, train=False, rngs={"rdof": jax.random.PRNGKey(3)})
        dv = D.init({"params": jax.random.PRNGKey(4)}, imgs, y, train=False)
        (proxy, embed, out), ups = D.apply(dv, imgs, y, train=True,
                                           mutable=["spectral"])
        B = z.shape[0]
        assert proxy.shape == (B, cfg["hypersphere_dim"])
        assert embed.shape == (B, cfg["hypersphere_dim"])
        assert out.shape == (B,)
        # normalize_embed=True -> unit hypersphere
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(embed.astype(jnp.float32), axis=-1)),
            1.0, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(proxy.astype(jnp.float32), axis=-1)),
            1.0, rtol=1e-4)

    def test_rdof_changes_output(self, setup):
        # The per-event random degrees of freedom must affect the images
        # (reference: model.py:466 — rdof sampled inside forward).
        cfg, G, D, gv, z, y = setup
        a = G.apply(gv, z, y, train=False, rngs={"rdof": jax.random.PRNGKey(10)})
        b = G.apply(gv, z, y, train=False, rngs={"rdof": jax.random.PRNGKey(11)})
        assert bool(jnp.any(a != b))
        c = G.apply(gv, z, y, train=False, rngs={"rdof": jax.random.PRNGKey(10)})
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_rrm_full_batch_sequence_flag():
    """rrm_full_batch_sequence=True makes RR_D attend across the WHOLE
    batch (reference bit-parity, model.py:918 h.unsqueeze(0)); default
    keeps per-event sequences isolated."""
    from tests.helpers import tiny_config
    from ieagan_tpu.models import Discriminator
    cfg = tiny_config(events_per_batch=2)
    es = cfg["n_classes"]
    shape = (2 * es, cfg["resolution"], cfg["resolution"] * cfg["H_base"], 1)
    x = jax.random.uniform(jax.random.PRNGKey(0), shape, minval=-1, maxval=1)
    y = jnp.tile(jnp.arange(es), 2)
    # perturb only the SECOND event's pixels
    x2 = x.at[es:].set(-x[es:])

    for full_batch, expect_cross in [(False, False), (True, True)]:
        D = Discriminator.from_config(
            dict(cfg, rrm_full_batch_sequence=full_batch))
        dv = D.init({"params": jax.random.PRNGKey(1)}, x, y, train=False)
        _, e_a, _ = D.apply(dv, x, y, train=False)
        _, e_b, _ = D.apply(dv, x2, y, train=False)
        # embeddings of the FIRST (unperturbed) event
        changed = bool(jnp.any(jnp.abs(e_a[:es] - e_b[:es]) > 1e-6))
        assert changed == expect_cross, (full_batch, changed)


def test_prior_embed_ablation_constructs_and_runs():
    """PEGAN-style prior conditioning (reference: eval_all.py:59-62)."""
    from ieagan_tpu.ops.prior import set_prior_features
    import numpy as np
    cfg = tiny_config(prior_embed=True)
    set_prior_features(np.linspace(0.5, 1.5, cfg["n_classes"]))
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    B = cfg["n_classes"] * cfg["events_per_batch"]
    z = jax.random.normal(jax.random.PRNGKey(0), (B, cfg["dim_z"]))
    y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])
    gv = G.init({"params": jax.random.PRNGKey(1), "rdof": jax.random.PRNGKey(2)},
                z, y, train=False)
    imgs = G.apply(gv, z, y, train=False, rngs={"rdof": jax.random.PRNGKey(3)})
    dv = D.init({"params": jax.random.PRNGKey(4)}, imgs, y, train=False)
    proxy, embed, out = D.apply(dv, imgs, y, train=False)
    assert proxy.shape == (B, cfg["hypersphere_dim"])
    assert "linear0" in gv["params"] and "linear1" in gv["params"]
    assert "linear3" in dv["params"] and "linear4" in dv["params"]


def test_contragan_ablation_no_rrm():
    """ContraGAN ablation: no RRM on proxies, no rdof (eval_all.py:53-56)."""
    cfg = tiny_config(RRM_prx_G=False, rdof_dim=0)
    G = Generator.from_config(cfg)
    B = cfg["n_classes"] * cfg["events_per_batch"]
    z = jax.random.normal(jax.random.PRNGKey(0), (B, cfg["dim_z"]))
    y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])
    gv = G.init({"params": jax.random.PRNGKey(1), "rdof": jax.random.PRNGKey(2)},
                z, y, train=False)
    assert "RR_G" not in gv["params"] and "linear_f" not in gv["params"]
    imgs = G.apply(gv, z, y, train=False, rngs={"rdof": jax.random.PRNGKey(3)})
    assert imgs.shape[0] == B


def test_remat_modes_share_math_and_params():
    """remat (False / True / "wide") is a scheduling choice, not a math
    change: with shared params every mode must produce identical outputs
    and identical loss gradients, and the param tree must be mode-agnostic
    (checkpoints trained with one mode load under another)."""
    cfg0 = tiny_config()  # resolution 32: 3 G stages, so "wide" (last 2) is a strict subset
    B = cfg0["n_classes"] * cfg0["events_per_batch"]
    z = jax.random.normal(jax.random.PRNGKey(0), (B, cfg0["dim_z"]))
    y = jnp.tile(jnp.arange(cfg0["n_classes"]), cfg0["events_per_batch"])
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (B, cfg0["resolution"],
                            cfg0["resolution"] * cfg0["H_base"], 1),
                           minval=-1.0, maxval=1.0)

    outs, grads, treedefs = [], [], []
    base_vars = None
    for mode in (False, True, "wide"):
        cfg = dict(cfg0, remat=mode)
        G = Generator.from_config(cfg)
        D = Discriminator.from_config(cfg)
        if base_vars is None:
            base_vars = (
                G.init({"params": jax.random.PRNGKey(2),
                        "rdof": jax.random.PRNGKey(3)}, z, y, train=False),
                D.init({"params": jax.random.PRNGKey(4)}, x, y, train=False),
            )
        gv, dv = base_vars

        def loss_fn(gp, dp):
            # eval mode: BN running-stat writes gate on `train`, and remat
            # equivalence is about the backward schedule, not stat updates
            imgs = G.apply({**gv, "params": gp}, z, y, train=False,
                           rngs={"rdof": jax.random.PRNGKey(5)},
                           mutable=False)
            _, emb, out = D.apply({**dv, "params": dp}, imgs, y, train=False,
                                  mutable=False)
            return jnp.mean(out) + jnp.sum(emb ** 2)

        val, (g_gp, g_dp) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            gv["params"], dv["params"])
        outs.append(float(val))
        flat, tdef = jax.tree_util.tree_flatten((g_gp, g_dp))
        grads.append(flat)
        treedefs.append(tdef)

    assert treedefs[0] == treedefs[1] == treedefs[2]
    assert outs[0] == pytest.approx(outs[1], rel=1e-6)
    assert outs[0] == pytest.approx(outs[2], rel=1e-6)
    for a, b in zip(grads[0], grads[1]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    for a, b in zip(grads[0], grads[2]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_remat_per_model_overrides():
    """remat_G / remat_D override the shared key per model; None inherits
    (the D-only-"wide" lever for lane-multiple batches, core/config.py)."""
    cfg = tiny_config(remat=True, remat_D="wide")
    assert Generator.from_config(cfg).remat is True
    assert Discriminator.from_config(cfg).remat == "wide"
    cfg = tiny_config(remat_G="wide")  # remat unset -> False
    assert Generator.from_config(cfg).remat == "wide"
    assert Discriminator.from_config(cfg).remat is False
