"""End-to-end train-step test under jit on synthetic data (SURVEY.md §4c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ieagan_tpu.models import Generator, Discriminator
from ieagan_tpu.train import init_train_state, make_train_step
from tests.helpers import tiny_config


@pytest.fixture(scope="module")
def trained_once():
    cfg = tiny_config()
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(G, D, cfg))
    B = cfg["n_classes"] * cfg["events_per_batch"]
    x = jax.random.uniform(jax.random.PRNGKey(5),
                           (B, cfg["resolution"], cfg["resolution"] * cfg["H_base"], 1),
                           minval=-1, maxval=1)
    y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])
    state1, mets1 = step(state, x, y, jax.random.PRNGKey(7))
    state2, mets2 = step(state1, x, y, jax.random.PRNGKey(8))
    return cfg, state, state1, state2, mets1, mets2


@pytest.mark.quick
def test_metrics_present_and_finite(trained_once):
    _, _, _, _, mets1, _ = trained_once
    for key in ["G_loss", "D_loss_real", "D_loss_fake", "unif_loss_d", "iea_loss"]:
        assert key in mets1
        assert np.isfinite(float(mets1[key]))


def test_params_update(trained_once):
    _, s0, s1, s2, _, _ = trained_once
    g0 = jax.tree_util.tree_leaves(s0.params_G)
    g1 = jax.tree_util.tree_leaves(s1.params_G)
    assert any(bool(jnp.any(a != b)) for a, b in zip(g0, g1))
    d0 = jax.tree_util.tree_leaves(s0.params_D)
    d1 = jax.tree_util.tree_leaves(s1.params_D)
    assert any(bool(jnp.any(a != b)) for a, b in zip(d0, d1))
    assert int(s2.itr) == 2


def test_ema_tracks_params(trained_once):
    cfg, s0, s1, s2, _, _ = trained_once
    # ema_start=1 in the tiny config: itr=2 >= start -> decay=ema_decay,
    # so ema should be strictly between old ema and new params.
    e = jax.tree_util.tree_leaves(s2.params_G_ema)
    p = jax.tree_util.tree_leaves(s2.params_G)
    assert any(bool(jnp.any(a != b)) for a, b in zip(e, p))


def test_spectral_sv_logged(trained_once):
    _, _, s1, _, _, _ = trained_once
    svs = [np.asarray(v) for k, v in jax.tree_util.tree_flatten_with_path(
        s1.state_D["spectral"])[0] if "sv" in str(k)]
    assert svs and all(np.isfinite(s).all() for s in svs)
    assert any(float(np.max(s)) > 0 for s in svs)


def test_ortho_reg_changes_grads():
    from ieagan_tpu.train.ortho import apply_ortho_reg, shared_blacklist
    params = {"a": {"kernel": jnp.eye(4) * 2.0},
              "shared": {"embedding": jnp.ones((3, 4))}}
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    out = apply_ortho_reg(grads, params, 1e-2, blacklist=shared_blacklist)
    # identity-orthogonal kernel: W Wᵀ is diagonal -> masked gram = 0
    np.testing.assert_allclose(np.asarray(out["a"]["kernel"]), 0.0)
    # blacklist respected
    np.testing.assert_allclose(np.asarray(out["shared"]["embedding"]), 0.0)
    params2 = {"a": {"kernel": jnp.ones((4, 4))}}
    grads2 = jax.tree_util.tree_map(jnp.zeros_like, params2)
    out2 = apply_ortho_reg(grads2, params2, 1.0)
    assert float(jnp.abs(out2["a"]["kernel"]).max()) > 0


def test_diff_aug_real_flag_is_live():
    """diff_aug_real=True (quirk fix, default) must change the D phase —
    reals are augmented — and with diff_aug=False the flag is inert
    (reference: model.py:972-982 augments only G_z)."""
    cfg = dict(tiny_config(), diff_aug=True)
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
    B = cfg["n_classes"] * cfg["events_per_batch"]
    x = jax.random.uniform(
        jax.random.PRNGKey(5),
        (B, cfg["resolution"], cfg["resolution"] * cfg["H_base"], 1),
        minval=-1, maxval=1)
    y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])

    def d_real(flag_cfg):
        step = jax.jit(make_train_step(G, D, flag_cfg))
        _, mets = step(state, x, y, jax.random.PRNGKey(7))
        return float(mets["D_loss_real"])

    fixed = d_real(dict(cfg, diff_aug_real=True))
    faithful = d_real(dict(cfg, diff_aug_real=False))
    assert fixed != faithful  # real branch actually augmented

    off_fixed = d_real(dict(cfg, diff_aug=False, diff_aug_real=True))
    off_faithful = d_real(dict(cfg, diff_aug=False, diff_aug_real=False))
    assert off_fixed == off_faithful  # inert without diff_aug


def test_diff_aug_policy_is_live():
    """config["diff_aug_policy"] must reach the augment chain — it was
    silently dropped until round 5, which made every policy A/B arm train
    byte-identically to its control (docs/physics_ab.jsonl diffaug2x)."""
    cfg = dict(tiny_config(), diff_aug=True)
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
    B = cfg["n_classes"] * cfg["events_per_batch"]
    x = jax.random.uniform(
        jax.random.PRNGKey(5),
        (B, cfg["resolution"], cfg["resolution"] * cfg["H_base"], 1),
        minval=-1, maxval=1)
    y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])

    def d_real(policy):
        step = jax.jit(make_train_step(
            G, D, dict(cfg, diff_aug_policy=policy)))
        _, mets = step(state, x, y, jax.random.PRNGKey(7))
        return float(mets["D_loss_real"])

    default = d_real("color,translation,cutout")
    color_only = d_real("color")
    assert default != color_only  # policy reaches the chain
