"""Multi-device mesh tests on the virtual 8-device CPU backend
(SURVEY.md §4d — the analog of multi-node tests without a cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ieagan_tpu.core.mesh import make_mesh, data_sharding
from ieagan_tpu.models import Generator, Discriminator
from ieagan_tpu.train import init_train_state
from ieagan_tpu.parallel.sharding import (
    make_sharded_train_step, place_state, param_shardings)
from tests.helpers import tiny_config


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_data=4, n_model=2)


def test_mesh_axes(mesh8):
    assert dict(mesh8.shape) == {"data": 4, "model": 2}


def test_param_shardings_tp_rule(mesh8):
    P = jax.sharding.PartitionSpec
    params = {"wide": {"kernel": jnp.zeros((32, 128))},
              "narrow": {"kernel": jnp.zeros((8, 30))},
              "bias": {"b": jnp.zeros((128,))}}
    sh = param_shardings(params, mesh8, tensor_parallel=True)
    assert sh["wide"]["kernel"].spec == P(None, "model")
    assert sh["narrow"]["kernel"].spec == P()
    assert sh["bias"]["b"].spec == P()


def test_param_shardings_tp_pair_rule(mesh8):
    """Megatron pairing: the closing layer of a known linear pair is
    row-sharded (input axis) so the pair costs one all-reduce, not
    per-layer all-gathers."""
    P = jax.sharding.PartitionSpec
    params = {"mlp": {"linear1": {"kernel": jnp.zeros((128, 512)),
                                  "bias": jnp.zeros((512,))},
                      "linear2": {"kernel": jnp.zeros((512, 128)),
                                  "bias": jnp.zeros((128,))}},
              "attn": {"qkv_proj": {"kernel": jnp.zeros((128, 384))},
                       "o_proj": {"kernel": jnp.zeros((128, 128))},
                       # conv HWIO: row split lands on axis 2 (= -2)
                       "o": {"kernel": jnp.zeros((1, 1, 96, 192))}},
              # narrow contracting axis: pair rule must not fire, column may
              "tiny": {"linear2": {"kernel": jnp.zeros((30, 128))}}}
    sh = param_shardings(params, mesh8, tensor_parallel=True)
    assert sh["mlp"]["linear1"]["kernel"].spec == P(None, "model")
    assert sh["mlp"]["linear2"]["kernel"].spec == P("model", None)
    assert sh["mlp"]["linear2"]["bias"].spec == P()
    assert sh["attn"]["qkv_proj"]["kernel"].spec == P(None, "model")
    assert sh["attn"]["o_proj"]["kernel"].spec == P("model", None)
    assert sh["attn"]["o"]["kernel"].spec == P(None, None, "model", None)
    assert sh["tiny"]["linear2"]["kernel"].spec == P(None, "model")


def test_tp_step_matches_replicated(mesh8):
    """One fused train step with TP shardings must equal the replicated
    run — the sharding annotations change layout/collectives, not math."""
    cfg = tiny_config(events_per_batch=4, G_ch=16, D_ch=16)
    B = cfg["n_classes"] * cfg["events_per_batch"]
    x = jax.random.uniform(
        jax.random.PRNGKey(1),
        (B, cfg["resolution"], cfg["resolution"] * cfg["H_base"], 1),
        minval=-1, maxval=1)
    y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])

    def one_step(tp):
        G = Generator.from_config(cfg)
        D = Discriminator.from_config(cfg)
        state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
        state = place_state(state, mesh8, tensor_parallel=tp)
        step = make_sharded_train_step(G, D, cfg, mesh8, tensor_parallel=tp)
        new_state, mets = step(state, x, y, jax.random.PRNGKey(2))
        jax.block_until_ready(new_state.params_G)
        return new_state, mets

    s_rep, m_rep = one_step(False)
    s_tp, m_tp = one_step(True)
    for k in m_rep:
        np.testing.assert_allclose(float(m_rep[k]), float(m_tp[k]),
                                   rtol=2e-3, atol=2e-3, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s_rep.params_G),
                    jax.tree_util.tree_leaves(s_tp.params_G)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_optimizer_moments_follow_tp_shardings(mesh8):
    """Adam mu/nu must be sharded exactly like their params under TP —
    replicated moments would defeat TP's memory savings and force reshards
    every update (round-1 VERDICT weak #4)."""
    cfg = tiny_config(G_ch=16, D_ch=16)
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
    state = place_state(state, mesh8, tensor_parallel=True)
    p_sh = jax.tree_util.tree_map(lambda l: l.sharding, state.params_G)
    import optax
    found_sharded = 0
    for opt, params_sh in [(state.opt_G, p_sh)]:
        for s in jax.tree_util.tree_leaves(
                opt, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)):
            if not isinstance(s, optax.ScaleByAdamState):
                continue
            mu_sh = jax.tree_util.tree_map(lambda l: l.sharding, s.mu)
            flat_p = jax.tree_util.tree_leaves(params_sh)
            flat_m = jax.tree_util.tree_leaves(mu_sh)
            assert len(flat_p) == len(flat_m)
            for a, b in zip(flat_p, flat_m):
                assert a == b
                if "model" in str(getattr(b, "spec", "")):
                    found_sharded += 1
    assert found_sharded > 0, "no TP-sharded moment found (rule inert?)"


def test_tp_checkpoint_save_load_round_trip(mesh8, tmp_path):
    """A TP-placed TrainState checkpoints and restores losslessly on the
    8-virtual-device mesh: save fetches the sharded leaves, load into a
    fresh state + re-place reproduces every leaf and its sharding."""
    from ieagan_tpu.utils import save_checkpoint, load_checkpoint
    cfg = tiny_config(G_ch=16, D_ch=16)
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
    state = place_state(state, mesh8, tensor_parallel=True)
    save_checkpoint(tmp_path, state, {"itr": 5}, "copy5")

    fresh = init_train_state(G, D, cfg, jax.random.PRNGKey(7))
    restored, sd = load_checkpoint(tmp_path, fresh, "copy5")
    assert sd["itr"] == int(state.itr)  # save stamps itr from the state
    restored = place_state(restored, mesh8, tensor_parallel=True)
    for name in ("params_G", "params_D", "opt_G"):
        a_leaves = jax.tree_util.tree_leaves(getattr(state, name))
        b_leaves = jax.tree_util.tree_leaves(getattr(restored, name))
        assert len(a_leaves) == len(b_leaves)
        for a, b in zip(a_leaves, b_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            if hasattr(a, "sharding"):
                assert a.sharding == b.sharding


def test_data_parallel_train_step(mesh8):
    cfg = tiny_config(events_per_batch=4, G_ch=16, D_ch=16)
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
    state = place_state(state, mesh8, tensor_parallel=True)
    step = make_sharded_train_step(G, D, cfg, mesh8, tensor_parallel=True)
    B = cfg["n_classes"] * cfg["events_per_batch"]
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (B, cfg["resolution"], cfg["resolution"] * cfg["H_base"], 1),
                           minval=-1, maxval=1)
    y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])
    new_state, mets = step(state, x, y, jax.random.PRNGKey(2))
    jax.block_until_ready(new_state.params_G)
    assert int(new_state.itr) == 1
    for v in mets.values():
        assert np.isfinite(float(v))
    # batch inputs actually land sharded over the data axis
    xs = jax.device_put(x, data_sharding(mesh8))
    assert len(xs.sharding.device_set) >= 4


@pytest.mark.slow
@pytest.mark.parametrize("split_D", [True, False])
def test_flagship_shape_sharded_compile(mesh8, split_D):
    """Sharded compile+run at flagship-like shapes (round-1 VERDICT weak #6):
    128px rectangular (H_base=3 -> 128x384), bf16 compute, 8 events over the
    data axis, remat on, Pallas interpreter attention, both split_D modes.
    Catches sharded-compile regressions the 32px toy dryrun can't."""
    import os
    os.environ["IEAGAN_PALLAS_INTERPRET"] = "1"
    try:
        cfg = tiny_config(
            resolution=128, H_base=3, G_ch=16, D_ch=16, G_depth=2, D_depth=2,
            n_classes=8, events_per_batch=8, compute_dtype="bfloat16",
            remat=True, split_D=split_D, use_pallas_attention=True,
            G_attn="0", D_attn="16", rdof_dim=4)
        G = Generator.from_config(cfg, dtype=jnp.bfloat16)
        D = Discriminator.from_config(cfg, dtype=jnp.bfloat16)
        state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
        state = place_state(state, mesh8, tensor_parallel=True)
        step = make_sharded_train_step(G, D, cfg, mesh8, tensor_parallel=True)
        B = cfg["n_classes"] * cfg["events_per_batch"]
        # width = resolution * H_base = 384
        x = jax.random.uniform(
            jax.random.PRNGKey(1),
            (B, cfg["resolution"], cfg["resolution"] * cfg["H_base"], 1),
            minval=-1, maxval=1)
        y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])
        new_state, mets = step(state, x, y, jax.random.PRNGKey(2))
        jax.block_until_ready(new_state.params_G)
        assert int(new_state.itr) == 1
        for k, v in mets.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        del new_state, state, step
    finally:
        os.environ.pop("IEAGAN_PALLAS_INTERPRET", None)
        # each parametrization holds a multi-hundred-MB CPU executable;
        # running both plus the rest of the file in one process has crashed
        # the interpreter — drop compiled programs eagerly.
        jax.clear_caches()


def test_global_bn_equals_single_device(mesh8):
    """BN moments must be computed over the GLOBAL batch under the sharded
    jit — the TPU-native cross-replica BN story (SURVEY.md §2.2)."""
    cfg = tiny_config(events_per_batch=4)
    G = Generator.from_config(cfg)
    B = cfg["n_classes"] * cfg["events_per_batch"]
    z = jax.random.normal(jax.random.PRNGKey(0), (B, cfg["dim_z"]))
    y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])
    gv = G.init({"params": jax.random.PRNGKey(1), "rdof": jax.random.PRNGKey(2)},
                z, y, train=False)

    def fwd(gv, z, y):
        return G.apply(gv, z, y, train=True, rngs={"rdof": jax.random.PRNGKey(3)},
                       mutable=["batch_stats", "spectral"])

    out_single, ups_single = jax.jit(fwd)(gv, z, y)
    z_sh = jax.device_put(z, data_sharding(mesh8))
    y_sh = jax.device_put(y, data_sharding(mesh8))
    out_shard, ups_shard = jax.jit(fwd)(gv, z_sh, y_sh)
    np.testing.assert_allclose(np.asarray(out_single), np.asarray(out_shard),
                               rtol=2e-3, atol=2e-3)
    a = jax.tree_util.tree_leaves(ups_single["batch_stats"])
    b = jax.tree_util.tree_leaves(ups_shard["batch_stats"])
    for x1, x2 in zip(a, b):
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                   rtol=2e-3, atol=2e-3)
