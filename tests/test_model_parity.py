"""THE parity test: run the actual reference PyTorch Generator with the
same weights as our flax Generator and compare the generated images.

The reference implementation is imported from the read-only mount (it is
executed as a test oracle, never copied). Deterministic comparison uses
RRM_prx_G=False (no in-forward rdof noise) in eval mode, so both sides are
pure functions of (weights, z, y)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = os.environ.get("IEAGAN_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "model.py")),
    reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_model_module():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE)
    import model as ref_model
    yield ref_model
    sys.path.remove(REFERENCE)


CFG = dict(
    G_ch=8, G_depth=2, dim_z=16, bottom_width=4, resolution=64,
    G_attn="0", n_classes=4, H_base=1, G_shared=True, shared_dim=16,
    hier=True, G_activation="relu", BN_eps=1e-5, SN_eps=1e-6,
    RRM_prx_G=False, rdof_dim=0, G_param="SN", norm_style="bn",
)


def test_generator_matches_reference_with_converted_weights(ref_model_module):
    import torch
    torch.manual_seed(0)
    ref_g = ref_model_module.Generator(
        **dict(CFG, skip_init=False, no_optim=True, G_init="ortho",
               device="cpu"))
    ref_g.eval()

    from ieagan_tpu.models import Generator
    from ieagan_tpu.models.convert import (convert_torch_generator,
                                           load_into_variables)
    G = Generator.from_config(dict(CFG, use_pallas_attention=False))
    z_np = np.random.RandomState(1).randn(4, CFG["dim_z"]).astype(np.float32)
    y_np = np.arange(4)
    variables = G.init({"params": jax.random.PRNGKey(0),
                        "rdof": jax.random.PRNGKey(1)},
                       jnp.asarray(z_np), jnp.asarray(y_np), train=False)
    converted = convert_torch_generator(ref_g.state_dict(),
                                        g_depth=CFG["G_depth"])
    variables = load_into_variables(dict(variables), converted)

    ours = np.asarray(G.apply(variables, jnp.asarray(z_np),
                              jnp.asarray(y_np), train=False,
                              rngs={"rdof": jax.random.PRNGKey(2)}))
    with torch.no_grad():
        theirs = ref_g(torch.from_numpy(z_np),
                       torch.from_numpy(y_np)).numpy()
    theirs = theirs.transpose(0, 2, 3, 1)  # NCHW -> NHWC
    assert ours.shape == theirs.shape
    diff = np.abs(ours - theirs)
    assert diff.max() < 5e-4, f"max diff {diff.max()}"


@pytest.mark.slow
def test_generator_with_rrm_matches_reference(ref_model_module):
    """RRM-enabled parity (the IEA-GAN-specific path): rdof_dim=0 keeps the
    forward deterministic; the reference hardcodes batch 40 in its rdof
    concat so the event size must be 40."""
    import torch
    # shared_dim must be 128: the reference's RRM path hardcodes 128-dim
    # proxies while sizing the first linear as dim_z+shared_dim
    # (model.py:303,316-320) — inconsistent otherwise.
    cfg = dict(CFG, n_classes=40, RRM_prx_G=True, rdof_dim=0, n_head_G=2,
               shared_dim=128)
    torch.manual_seed(0)
    ref_g = ref_model_module.Generator(
        **dict(cfg, skip_init=False, no_optim=True, G_init="ortho",
               device="cpu"))
    ref_g.eval()
    from ieagan_tpu.models import Generator
    from ieagan_tpu.models.convert import (convert_torch_generator,
                                           load_into_variables)
    G = Generator.from_config(dict(cfg, use_pallas_attention=False))
    z_np = np.random.RandomState(2).randn(40, cfg["dim_z"]).astype(np.float32)
    y_np = np.arange(40)
    variables = G.init({"params": jax.random.PRNGKey(0),
                        "rdof": jax.random.PRNGKey(1)},
                       jnp.asarray(z_np), jnp.asarray(y_np), train=False)
    converted = convert_torch_generator(ref_g.state_dict(),
                                        g_depth=cfg["G_depth"])
    variables = load_into_variables(dict(variables), converted)
    ours = np.asarray(G.apply(variables, jnp.asarray(z_np),
                              jnp.asarray(y_np), train=False,
                              rngs={"rdof": jax.random.PRNGKey(2)}))
    with torch.no_grad():
        theirs = ref_g(torch.from_numpy(z_np),
                       torch.from_numpy(y_np)).numpy().transpose(0, 2, 3, 1)
    diff = np.abs(ours - theirs)
    assert diff.max() < 5e-4, f"max diff {diff.max()}"


def test_converted_tree_covers_all_params(ref_model_module):
    import torch
    torch.manual_seed(0)
    ref_g = ref_model_module.Generator(
        **dict(CFG, skip_init=True, no_optim=True, device="cpu"))
    from ieagan_tpu.models import Generator
    from ieagan_tpu.models.convert import convert_torch_generator
    G = Generator.from_config(dict(CFG, use_pallas_attention=False))
    variables = G.init({"params": jax.random.PRNGKey(0),
                        "rdof": jax.random.PRNGKey(1)},
                       jnp.zeros((4, CFG["dim_z"])), jnp.arange(4),
                       train=False)
    converted = convert_torch_generator(ref_g.state_dict(),
                                        g_depth=CFG["G_depth"])

    def leaves_with_paths(tree, prefix=()):
        if not isinstance(tree, dict):
            yield prefix, tree
            return
        for k, v in tree.items():
            yield from leaves_with_paths(v, prefix + (k,))

    ours_paths = {p for p, _ in leaves_with_paths(variables["params"])}
    conv_paths = {p for p, _ in leaves_with_paths(converted["params"])}
    missing = ours_paths - conv_paths
    assert not missing, f"params not covered by conversion: {sorted(missing)[:10]}"


def test_export_generator_to_torch_roundtrip(ref_model_module):
    """Inverse converter: a flax-trained (here: flax-initialized) Generator
    exported into the reference torch implementation must produce the same
    images — the migration path back to the reference, and the mechanism
    that lets FID parity be measured on checkpoints trained in this
    framework."""
    import torch
    torch.manual_seed(0)
    ref_g = ref_model_module.Generator(
        **dict(CFG, skip_init=True, no_optim=True, device="cpu"))
    ref_g.eval()

    from ieagan_tpu.models import Generator
    from ieagan_tpu.models.convert import export_generator_to_torch
    G = Generator.from_config(dict(CFG, use_pallas_attention=False))
    z_np = np.random.RandomState(5).randn(4, CFG["dim_z"]).astype(np.float32)
    y_np = np.arange(4)
    variables = G.init({"params": jax.random.PRNGKey(7),
                        "rdof": jax.random.PRNGKey(8)},
                       jnp.asarray(z_np), jnp.asarray(y_np), train=False)

    sd = export_generator_to_torch(dict(variables), ref_g.state_dict(),
                                   g_depth=CFG["G_depth"])
    ref_g.load_state_dict({k: torch.from_numpy(np.asarray(v))
                           for k, v in sd.items()})

    ours = np.asarray(G.apply(variables, jnp.asarray(z_np),
                              jnp.asarray(y_np), train=False,
                              rngs={"rdof": jax.random.PRNGKey(2)}))
    with torch.no_grad():
        theirs = ref_g(torch.from_numpy(z_np),
                       torch.from_numpy(y_np)).numpy().transpose(0, 2, 3, 1)
    diff = np.abs(ours - theirs)
    assert diff.max() < 5e-4, f"max diff {diff.max()}"


def test_export_discriminator_to_torch_roundtrip(ref_model_module):
    """Inverse D converter: flax-initialized D exported into the reference
    torch implementation must produce the same (proxy, embed, score)."""
    import torch
    dcfg = dict(
        D_ch=32, D_depth=2, resolution=64, D_attn="32", n_classes=4,
        D_activation="relu", conditional_strategy="Contra", SN_eps=1e-6,
        hypersphere_dim=32, nonlinear_embed=False, normalize_embed=True,
        RRM_prx_D=False, RRM_embed=True, n_head_D=4, D_param="SN",
        D_wide=True,
    )
    torch.manual_seed(0)
    ref_d = ref_model_module.Discriminator(
        **dict(dcfg, skip_init=True, device="cpu"))
    ref_d.eval()

    from ieagan_tpu.models import Discriminator
    from ieagan_tpu.models.convert import export_discriminator_to_torch
    D = Discriminator.from_config(dict(dcfg, use_pallas_attention=False))
    x_np = np.random.RandomState(9).uniform(
        -1, 1, (4, 64, 64, 1)).astype(np.float32)
    y_np = np.arange(4)
    variables = D.init({"params": jax.random.PRNGKey(3)},
                       jnp.asarray(x_np), jnp.asarray(y_np), train=False)
    sd = export_discriminator_to_torch(dict(variables), ref_d.state_dict(),
                                       d_depth=dcfg["D_depth"])
    ref_d.load_state_dict({k: torch.from_numpy(np.asarray(v))
                           for k, v in sd.items()})
    proxy, embed, out = D.apply(variables, jnp.asarray(x_np),
                                jnp.asarray(y_np), train=False)
    with torch.no_grad():
        t_proxy, t_embed, t_out = ref_d(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2)),
            torch.from_numpy(y_np))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(embed), t_embed.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(proxy), t_proxy.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_discriminator_matches_reference_with_converted_weights(ref_model_module):
    """D parity: conv stack + sum-pool + SN-RRM + contrastive head."""
    import torch
    # D_ch must be 32: the reference's RR_D hardcodes hidden_dim=512 for
    # its final LayerNorm while input_dim tracks out_channels[-1]
    # (model.py:788-798) — inconsistent at other widths.
    dcfg = dict(
        D_ch=32, D_depth=2, resolution=64, D_attn="32", n_classes=4,
        D_activation="relu", conditional_strategy="Contra", SN_eps=1e-6,
        hypersphere_dim=32, nonlinear_embed=False, normalize_embed=True,
        RRM_prx_D=False, RRM_embed=True, n_head_D=4, D_param="SN",
        D_wide=True,
    )
    torch.manual_seed(0)
    ref_d = ref_model_module.Discriminator(
        **dict(dcfg, skip_init=False, D_init="ortho", device="cpu"))
    ref_d.eval()

    from ieagan_tpu.models import Discriminator
    from ieagan_tpu.models.convert import (convert_torch_discriminator,
                                           load_into_variables)
    D = Discriminator.from_config(dict(dcfg, use_pallas_attention=False))
    x_np = np.random.RandomState(3).uniform(
        -1, 1, (4, 64, 64, 1)).astype(np.float32)
    y_np = np.arange(4)
    variables = D.init({"params": jax.random.PRNGKey(0)},
                       jnp.asarray(x_np), jnp.asarray(y_np), train=False)
    converted = convert_torch_discriminator(ref_d.state_dict(),
                                            d_depth=dcfg["D_depth"])
    variables = load_into_variables(dict(variables), converted)
    proxy, embed, out = D.apply(variables, jnp.asarray(x_np),
                                jnp.asarray(y_np), train=False)
    with torch.no_grad():
        t_proxy, t_embed, t_out = ref_d(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2)),
            torch.from_numpy(y_np))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(embed), t_embed.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(proxy), t_proxy.numpy(),
                               rtol=1e-3, atol=1e-3)


def _optim_roundtrip(ref_module, make_ours, template_sd, which, depth):
    """Shared harness: torch Adam step on the reference module -> convert
    moments to optax -> export back -> bitwise round-trip."""
    import torch
    import optax
    from ieagan_tpu.models.convert import (torch_param_names,
                                           convert_torch_adam,
                                           export_adam_to_torch,
                                           _find_adam_state)

    # the index-order assumption the interop rests on, checked against the
    # real reference module (reference: utils/__init__.py:689-726)
    assert torch_param_names(ref_module.state_dict()) == \
        [n for n, _ in ref_module.named_parameters()]

    opt = torch.optim.Adam(ref_module.parameters(), lr=5e-5,
                           betas=(0.0, 0.999), eps=1e-6)
    g = torch.Generator().manual_seed(7)
    for p in ref_module.parameters():
        p.grad = torch.randn(p.shape, generator=g)
    opt.step()
    optim_sd = opt.state_dict()

    params = make_ours()
    tx = optax.adam(5e-5, b1=0.0, b2=0.999, eps=1e-6)
    opt_state = tx.init(params)
    new_state = convert_torch_adam(optim_sd, template_sd, params, opt_state,
                                   which=which, depth=depth)
    adam = _find_adam_state(new_state)
    assert int(np.asarray(adam.count)) == 1
    # moment trees must be exactly params-shaped
    assert (jax.tree_util.tree_structure(adam.mu)
            == jax.tree_util.tree_structure(params))
    for m, p in zip(jax.tree_util.tree_leaves(adam.mu),
                    jax.tree_util.tree_leaves(params)):
        assert np.asarray(m).shape == np.asarray(p).shape
    # with b1=0, exp_avg == grad: nonzero moments must have survived
    total = sum(float(np.abs(np.asarray(l)).sum())
                for l in jax.tree_util.tree_leaves(adam.mu))
    assert total > 0

    back = export_adam_to_torch(new_state, template_sd, which=which,
                                depth=depth)
    names = torch_param_names(template_sd)
    for i, name in enumerate(names):
        for field in ("exp_avg", "exp_avg_sq"):
            theirs = optim_sd["state"][i][field].numpy()
            ours = np.asarray(back["state"][i][field])
            np.testing.assert_array_equal(
                ours, theirs, err_msg=f"{name}.{field}")


def test_generator_adam_moments_roundtrip(ref_model_module):
    """Mid-training migration: reference Adam moments -> optax -> back,
    bitwise (reference: utils/__init__.py:705 optim state_dict save)."""
    import torch
    torch.manual_seed(0)
    ref_g = ref_model_module.Generator(
        **dict(CFG, skip_init=False, no_optim=True, G_init="ortho",
               device="cpu"))

    from ieagan_tpu.models import Generator
    G = Generator.from_config(dict(CFG, use_pallas_attention=False))

    def make_ours():
        variables = G.init(
            {"params": jax.random.PRNGKey(0), "rdof": jax.random.PRNGKey(1)},
            jnp.zeros((4, CFG["dim_z"])), jnp.arange(4), train=False)
        return variables["params"]

    _optim_roundtrip(ref_g, make_ours, ref_g.state_dict(), "G",
                     CFG["G_depth"])


def test_discriminator_adam_moments_roundtrip(ref_model_module):
    import torch
    dcfg = dict(
        D_ch=32, D_depth=2, resolution=64, D_attn="32", n_classes=4,
        D_activation="relu", conditional_strategy="Contra", SN_eps=1e-6,
        hypersphere_dim=32, nonlinear_embed=False, normalize_embed=True,
        RRM_prx_D=False, RRM_embed=True, n_head_D=4, D_param="SN",
        D_wide=True,
    )
    torch.manual_seed(0)
    ref_d = ref_model_module.Discriminator(
        **dict(dcfg, skip_init=False, D_init="ortho", device="cpu"))

    from ieagan_tpu.models import Discriminator
    D = Discriminator.from_config(dict(dcfg, use_pallas_attention=False))

    def make_ours():
        variables = D.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((4, 64, 64, 1)), jnp.arange(4),
                           train=False)
        return variables["params"]

    _optim_roundtrip(ref_d, make_ours, ref_d.state_dict(), "D",
                     dcfg["D_depth"])


@pytest.mark.slow
def test_train_step_gradients_match_reference(ref_model_module):
    """THE dynamics-parity oracle: one full training iteration (D phase +
    G phase, Contra strategy, IEA + uniformity losses) through the actual
    reference train_fns.GAN_training_function and through our fused step,
    same weights, same latents, same batch — D and G gradients must match
    leaf-for-leaf (reference: train_fns.py:20-206). diff_aug=False (the
    two frameworks cannot share augmentation draws), ortho/clip off, lr=0
    on the reference side so .grad survives the optimizer calls."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import ref_stubs
    ref_stubs.install()
    sys.path.insert(0, REFERENCE)
    try:
        import train_fns as ref_train_fns
        import utils as ref_utils
    finally:
        sys.path.remove(REFERENCE)

    config = dict(
        # model geometry (shared by both sides)
        G_ch=8, D_ch=32, G_depth=2, D_depth=2, dim_z=16, bottom_width=4,
        resolution=64, H_base=1, n_classes=4, G_attn="0", D_attn="32",
        G_shared=True, shared_dim=16, hier=True, G_activation="relu",
        D_activation="relu", BN_eps=1e-5, SN_eps=1e-6, RRM_prx_G=False,
        RRM_prx_D=False, RRM_embed=True, rdof_dim=0, n_head_G=2, n_head_D=4,
        G_param="SN", D_param="SN", norm_style="bn", D_wide=True,
        conditional_strategy="Contra", hypersphere_dim=32,
        nonlinear_embed=False, normalize_embed=True,
        # training regime (reference config.json values, stochastic parts off)
        batch_size=4, num_D_steps=1, num_D_accumulations=1,
        num_G_accumulations=1, toggle_grads=True, split_D=True,
        diff_aug=False, Con_reg=False, cr_lambda=10, contra_lambda=1.0,
        IEA_loss=True, IEA_lambda=1.0, Uniformity_loss=True, unif_lambda=0.1,
        pos_collected_numerator=False, G_ortho=0.0, D_ortho=0.0,
        clip_norm=None, ema=False, G_lr=0.0, D_lr=0.0, G_B1=0.0, G_B2=0.999,
        D_B1=0.0, D_B2=0.999, adam_eps=1e-6, G_fp16=False, D_fp16=False,
        G_mixed_precision=False, D_mixed_precision=False, sv_log_interval=-1,
        z_var=1.0, G_init="ortho", D_init="ortho", skip_init=False,
        no_optim=False, device="cpu", prior_embed=False,
    )

    torch.manual_seed(0)
    ref_g = ref_model_module.Generator(**config)
    ref_d = ref_model_module.Discriminator(**config)
    gd = ref_model_module.G_D(ref_g, ref_d)
    ref_g.train()
    ref_d.train()

    # deterministic inputs; pre-draw the two z samples the train fn takes
    z_, y_ = ref_utils.prepare_z_y(4, config["dim_z"], config["n_classes"],
                                   device="cpu", z_var=1.0)
    torch.manual_seed(123)
    z_.sample_()
    z1 = z_.detach().numpy().copy()
    z_.sample_()
    z2 = z_.detach().numpy().copy()
    x_np = np.random.RandomState(3).uniform(
        -1, 1, (4, 64, 64, 1)).astype(np.float32)
    y_np = np.arange(4)

    train = ref_train_fns.GAN_training_function(
        ref_g, ref_d, gd, z_, y_, None, {"itr": 0}, config, "cpu")
    torch.manual_seed(123)  # replays z1, z2 inside train()
    ref_metrics = train(torch.from_numpy(x_np.transpose(0, 3, 1, 2)),
                        torch.from_numpy(y_np))
    ref_g_grads = {n: p.grad.detach().numpy().copy()
                   for n, p in ref_g.named_parameters() if p.grad is not None}
    ref_d_grads = {n: p.grad.detach().numpy().copy()
                   for n, p in ref_d.named_parameters() if p.grad is not None}

    # ---- our side: same weights, same z draws, capture gradients
    from ieagan_tpu.models import Generator, Discriminator
    from ieagan_tpu.train import init_train_state, make_train_step
    from ieagan_tpu.models.convert import (
        convert_torch_generator, convert_torch_discriminator,
        load_into_variables, export_generator_to_torch,
        export_discriminator_to_torch, torch_param_names)

    ours_cfg = dict(config, use_pallas_attention=False, events_per_batch=1,
                    ema=True, ema_decay=0.9999, ema_start=10 ** 9,
                    use_ema=False)
    G = Generator.from_config(ours_cfg)
    D = Discriminator.from_config(ours_cfg)
    state = init_train_state(G, D, ours_cfg, jax.random.PRNGKey(0))

    gv = load_into_variables({"params": state.params_G, **state.state_G},
                             convert_torch_generator(ref_g.state_dict(), 2))
    dv = load_into_variables({"params": state.params_D, **state.state_D},
                             convert_torch_discriminator(ref_d.state_dict(), 2))
    state = state.replace(
        params_G=gv["params"],
        state_G={k: v for k, v in gv.items() if k != "params"},
        params_D=dv["params"],
        state_D={k: v for k, v in dv.items() if k != "params"})

    step = make_train_step(G, D, ours_cfg, z_schedule=[z1, z2],
                           capture_grads=True)
    _, metrics = step(state, jnp.asarray(x_np), jnp.asarray(y_np),
                      jax.random.PRNGKey(9))

    # loss-value parity first (cheap to diagnose)
    for ref_key, our_key in [("D_loss_real", "D_loss_real"),
                             ("D_loss_fake", "D_loss_fake"),
                             ("G_loss", "G_loss"),
                             ("iea_loss", "iea_loss"),
                             ("unif_loss_d", "unif_loss_d")]:
        np.testing.assert_allclose(
            float(metrics[our_key]), float(ref_metrics[ref_key]),
            rtol=2e-3, atol=2e-5, err_msg=ref_key)

    # gradient parity, leaf-for-leaf through the torch-layout exporters
    ours_g = export_generator_to_torch(
        {"params": jax.tree_util.tree_map(np.asarray, metrics["_grads_G"])},
        {k: np.zeros_like(v.detach().numpy())
         for k, v in ref_g.state_dict().items()
         if k in torch_param_names(ref_g.state_dict())}, 2)
    ours_d = export_discriminator_to_torch(
        {"params": jax.tree_util.tree_map(np.asarray, metrics["_grads_D"])},
        {k: np.zeros_like(v.detach().numpy())
         for k, v in ref_d.state_dict().items()
         if k in torch_param_names(ref_d.state_dict())}, 2)
    # Per-leaf relative L2 (the standard gradient-check metric): leaves at
    # the top of the backprop chain (shared.weight, linear.weight) sum
    # thousands of f32 contributions in different-but-equivalent orders on
    # the two frameworks, so elementwise rtol on near-zero entries is the
    # wrong lens — in-norm agreement is the claim that matters.
    errs = {}
    for tag, ref_grads, ours_all in (("D", ref_d_grads, ours_d),
                                     ("G", ref_g_grads, ours_g)):
        for name, theirs in ref_grads.items():
            ours = np.asarray(ours_all[name], np.float64)
            theirs = np.asarray(theirs, np.float64)
            ref_norm = np.linalg.norm(theirs)
            if ref_norm < 1e-5:
                # mathematically-null gradients (e.g. conv biases feeding
                # straight into BN, which absorbs additive constants):
                # relative error on ~1e-8 norms is meaningless — require
                # ours to be equally null instead
                assert np.linalg.norm(ours) < 1e-5, \
                    f"{tag}.{name}: null-grad leaf is nonzero on our side"
                continue
            errs[f"{tag}.{name}"] = np.linalg.norm(ours - theirs) / ref_norm
    worst = sorted(errs.items(), key=lambda kv: -kv[1])[:8]
    # f32 backprop noise between the two frameworks grows toward the head
    # of the chain (G's z linear / class embedding accumulate every deeper
    # layer's rounding): leaves measured up to ~3e-3 in-norm there, while
    # the bulk of both stacks agrees ~1e-4. The claim: no leaf deviates
    # at the 1% level (a real semantic difference — a missing loss term,
    # a wrong detach — shows up orders of magnitude larger), and the
    # typical leaf matches to 1e-3.
    assert len(errs) > 100  # both stacks' full depth was compared
    assert max(errs.values()) < 1e-2, f"worst leaves: {worst}"
    assert float(np.median(list(errs.values()))) < 1e-3, \
        f"median {np.median(list(errs.values())):.2e}; worst: {worst}"
