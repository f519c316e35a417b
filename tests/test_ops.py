"""Per-op numerics tests against independently-computed references
(SURVEY.md §4: per-op golden tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ieagan_tpu.ops.image_norm import lognorm255, lognorm, denorm, generate_postprocess
from ieagan_tpu.ops.spectral import power_iteration
from ieagan_tpu.ops import diff_aug
from ieagan_tpu import losses


@pytest.mark.quick
class TestImageNorm:
    def test_lognorm255_range(self):
        x = jnp.linspace(0.0, 1.0, 11)
        y = lognorm255(x)
        assert float(y[0]) == pytest.approx(0.0, abs=1e-6)
        assert float(y[-1]) == pytest.approx(1.0, abs=1e-6)
        # reference formula: log(255x+1)/log(256)  (utils/norm.py:8-19)
        np.testing.assert_allclose(
            np.asarray(y), np.log(255 * np.asarray(x) + 1) / np.log(256), rtol=1e-6)

    def test_denorm_round_trip(self):
        # ADU -> lognorm -> [-1,1] -> denorm recovers ADU (rows 3:-3)
        adu = jnp.array(np.random.RandomState(0).randint(0, 256, (2, 16, 8, 1)),
                        jnp.float32)
        unit = lognorm(adu)
        model_range = unit * 2.0 - 1.0
        rec = denorm(model_range)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(adu[:, 3:-3]),
                                   rtol=1e-4, atol=1e-2)

    def test_generate_postprocess_contract(self):
        imgs = jnp.zeros((5, 256, 768, 1))
        out = generate_postprocess(imgs)
        assert out.shape == (5, 250, 768)
        # x=0 is above the -0.26 threshold -> 256^0.5 - 1 = 15
        np.testing.assert_allclose(np.asarray(out), 15.0, rtol=1e-5)
        # below-threshold values are zeroed
        out2 = generate_postprocess(jnp.full((1, 256, 768, 1), -0.5))
        np.testing.assert_allclose(np.asarray(out2), 0.0, atol=1e-6)


class TestPowerIteration:
    def test_converges_to_top_sv(self):
        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.randn(16, 32), jnp.float32)
        true_sv = np.linalg.svd(np.asarray(w), compute_uv=False)[0]
        us = jnp.asarray(rng.randn(1, 16), jnp.float32)
        for _ in range(50):
            svs, us = power_iteration(w, us, n_itrs=1, eps=1e-12)
        assert float(svs[0]) == pytest.approx(float(true_sv), rel=1e-4)

    def test_multiple_svs_gram_schmidt(self):
        rng = np.random.RandomState(2)
        w = jnp.asarray(rng.randn(24, 24), jnp.float32)
        true = np.linalg.svd(np.asarray(w), compute_uv=False)[:2]
        us = jnp.asarray(rng.randn(2, 24), jnp.float32)
        for _ in range(200):
            svs, us = power_iteration(w, us, n_itrs=1, eps=1e-12)
        assert float(svs[0]) == pytest.approx(float(true[0]), rel=1e-3)
        assert float(svs[1]) == pytest.approx(float(true[1]), rel=5e-2)

    def test_sv_gradient_flows(self):
        w = jnp.asarray(np.random.RandomState(3).randn(8, 8), jnp.float32)
        us = jnp.asarray(np.random.RandomState(4).randn(1, 8), jnp.float32)

        def f(w):
            svs, _ = power_iteration(w, us, n_itrs=1, eps=1e-12)
            return svs[0]

        g = jax.grad(f)(w)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestDiffAug:
    def test_shapes_preserved(self):
        x = jnp.asarray(np.random.RandomState(0).rand(4, 16, 24, 1), jnp.float32)
        out = diff_aug.diff_augment(jax.random.PRNGKey(0), x)
        assert out.shape == x.shape

    def test_cutout_zeroes_box(self):
        x = jnp.ones((2, 16, 16, 1))
        out = diff_aug.rand_cutout(jax.random.PRNGKey(1), x)
        frac = float(jnp.mean(out == 0.0))
        # cutout is a ratio-0.5 box (possibly clipped at edges)
        assert 0.05 < frac <= 0.25 + 1e-6

    def test_translation_zero_fill(self):
        x = jnp.ones((3, 16, 16, 1))
        out = diff_aug.rand_translation(jax.random.PRNGKey(2), x)
        assert out.shape == x.shape
        assert float(out.max()) <= 1.0
        vals = np.unique(np.asarray(out))
        assert set(vals).issubset({0.0, 1.0})

    def test_flip_only_flips_width(self):
        x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 1, 8, 1))
        x = jnp.tile(x, (8, 2, 1, 1))
        out = diff_aug.random_flip(jax.random.PRNGKey(4), x, p=1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x[:, :, ::-1]))

    def test_brightness_is_per_sample_shift(self):
        x = jnp.zeros((4, 4, 4, 1))
        out = diff_aug.rand_brightness(jax.random.PRNGKey(5), x)
        per_sample = np.asarray(out).reshape(4, -1)
        for row in per_sample:
            assert np.allclose(row, row[0])


class TestLosses:
    def test_hinge(self):
        fake = jnp.array([0.5, -2.0])
        real = jnp.array([2.0, 0.5])
        lr, lf = losses.loss_hinge_dis(fake, real)
        assert float(lr) == pytest.approx(np.mean([0.0, 0.5]))
        assert float(lf) == pytest.approx(np.mean([1.5, 0.0]))
        assert float(losses.loss_hinge_gen(fake)) == pytest.approx(-0.5 / 2 + 1.0)

    def test_unif_loss_matches_pdist_formula(self):
        rng = np.random.RandomState(0)
        x = rng.randn(6, 4).astype(np.float32)
        # torch.pdist(x).pow(2).mul(-2).exp().mean().log()  (loss.py:8-9)
        d2 = ((x[:, None] - x[None, :]) ** 2).sum(-1)
        pairs = d2[np.triu_indices(6, k=1)]
        want = np.log(np.mean(np.exp(-2 * pairs)))
        got = float(losses.unif_loss(jnp.asarray(x)))
        assert got == pytest.approx(float(want), rel=1e-5)

    def test_iea_loss_zero_when_equal(self):
        x = jnp.asarray(np.random.RandomState(1).randn(5, 8), jnp.float32)
        assert float(losses.iea_loss(x, x)) == pytest.approx(0.0, abs=1e-6)

    def test_iea_loss_batchmean_kl(self):
        rng = np.random.RandomState(2)
        kf = rng.randn(4, 8).astype(np.float32)
        kr = rng.randn(4, 8).astype(np.float32)

        def softmax(z):
            e = np.exp(z - z.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        pf = softmax(kf @ kf.T)
        pr = softmax(kr @ kr.T)
        want = np.sum(pr * (np.log(pr) - np.log(pf))) / 4
        got = float(losses.iea_loss(jnp.asarray(kf), jnp.asarray(kr)))
        assert got == pytest.approx(float(want), rel=1e-4)

    def test_contra_loss_reference_formula(self):
        rng = np.random.RandomState(3)
        b, d, ncls = 6, 8, 6
        embed = rng.randn(b, d).astype(np.float32)
        proxy = rng.randn(b, d).astype(np.float32)
        labels = np.arange(b)
        t, margin = 1.0, 0.0

        def cos(a, bb):
            a = a / np.linalg.norm(a, axis=-1, keepdims=True)
            bb = bb / np.linalg.norm(bb, axis=-1, keepdims=True)
            return a @ bb.T

        sim = cos(embed, embed)
        inst_zone = np.exp((sim - margin) / t)
        i2p = np.exp((np.sum((embed / np.linalg.norm(embed, axis=-1, keepdims=True))
                             * (proxy / np.linalg.norm(proxy, axis=-1, keepdims=True)),
                             -1) - margin) / t)
        off = ~np.eye(b, dtype=bool)
        denom = i2p + (inst_zone * off).sum(1)
        want = -np.mean(np.log(t * i2p / denom))
        mask = losses.make_mask(jnp.asarray(labels), ncls)
        got = float(losses.conditional_contrastive_loss(
            jnp.asarray(embed), jnp.asarray(proxy), mask, jnp.asarray(labels),
            t, margin))
        assert got == pytest.approx(float(want), rel=1e-5)

    def test_contra_loss_pos_collected_reference_formula(self):
        """pos_collected_numerator=True: the numerator additionally collects
        same-class off-diagonal instance similarities (reference:
        loss.py:116-123 — remove_diag(negative_mask[labels]) * instance_zone,
        summed). Labels repeat so same-class positives actually exist."""
        rng = np.random.RandomState(11)
        b, d, ncls = 8, 8, 4
        embed = rng.randn(b, d).astype(np.float32)
        proxy = rng.randn(b, d).astype(np.float32)
        labels = np.array([0, 1, 2, 3, 0, 1, 2, 3])
        t, margin = 1.0, 0.0

        def norm(a):
            return a / np.linalg.norm(a, axis=-1, keepdims=True)

        sim = norm(embed) @ norm(embed).T
        inst_zone = np.exp((sim - margin) / t)
        i2p = np.exp((np.sum(norm(embed) * norm(proxy), -1) - margin) / t)
        off = ~np.eye(b, dtype=bool)
        same_class = (labels[:, None] == labels[None, :])
        numerator = i2p + (inst_zone * off * same_class).sum(1)
        denom = i2p + (inst_zone * off).sum(1)
        want = -np.mean(np.log(t * numerator / denom))
        mask = losses.make_mask(jnp.asarray(labels), ncls)
        got = float(losses.conditional_contrastive_loss(
            jnp.asarray(embed), jnp.asarray(proxy), mask, jnp.asarray(labels),
            t, margin, pos_collected_numerator=True))
        assert got == pytest.approx(float(want), rel=1e-5)

    def test_make_mask(self):
        y = jnp.array([0, 2, 1, 0])
        m = np.asarray(losses.make_mask(y, 3))
        assert m.shape == (3, 4)
        np.testing.assert_array_equal(m[0], [1, 0, 0, 1])
        np.testing.assert_array_equal(m[2], [0, 1, 0, 0])


class TestNormStyles:
    def test_group_norm_styles(self):
        import jax
        from ieagan_tpu.ops.norm import group_norm
        x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 32), jnp.float32)
        for style in ["gn", "grp_8", "ch_4"]:
            out = group_norm(x, style)
            assert out.shape == x.shape
            # normalized within groups -> near-zero mean over (H, W, group)
            assert abs(float(jnp.mean(out))) < 1e-5

    def test_instance_norm_in_ccbn(self):
        import jax
        import flax.linen as nn_
        from ieagan_tpu.ops.norm import ClassCondBatchNorm
        from ieagan_tpu.ops.spectral import Dense
        import functools
        mod = ClassCondBatchNorm(8, functools.partial(Dense, use_bias=False),
                                 norm_style="in")
        x = jnp.asarray(np.random.RandomState(1).randn(3, 5, 5, 8), jnp.float32)
        y = jnp.asarray(np.random.RandomState(2).randn(3, 4), jnp.float32)
        v = mod.init(jax.random.PRNGKey(0), x, y, train=True)
        out = mod.apply(v, x, y, train=True)
        assert out.shape == x.shape


class TestHostTransforms:
    def test_crops(self):
        from ieagan_tpu.data import CenterCropLongEdge, RandomCropLongEdge
        img = np.arange(6 * 10).reshape(6, 10).astype(np.float32)
        c = CenterCropLongEdge()(img)
        assert c.shape == (6, 6)
        r = RandomCropLongEdge(np.random.default_rng(0))(img)
        assert r.shape == (6, 6)

    def test_noises(self):
        from ieagan_tpu.data import UniformNoise, GaussianNoise
        x = np.zeros((4, 4), np.float32)
        u = UniformNoise(0.1, np.random.default_rng(0))(x)
        assert (u >= 0).all() and (u < 0.1).all() and u.any()
        g = GaussianNoise(0.0, 1.0, np.random.default_rng(0))(x)
        assert g.std() > 0.1

    def test_balanced_sampler(self):
        from ieagan_tpu.data import BalancedSampler
        labels = np.repeat(np.arange(5), 20)
        s = BalancedSampler(labels, n_classes=3, n_samples=4,
                            rng=np.random.default_rng(0))
        batches = list(s)
        assert len(batches) == len(s)
        for b in batches:
            assert len(b) == 12
            cls, counts = np.unique(labels[b], return_counts=True)
            assert len(cls) == 3 and (counts == 4).all()


class TestMoreLosses:
    def test_contra_plus_formula(self):
        rng = np.random.RandomState(5)
        b, d, ncls = 6, 8, 6
        embed = rng.randn(b, d).astype(np.float32)
        proxy = rng.randn(b, d).astype(np.float32)
        labels = np.arange(b) % 3
        t = 1.0

        def cos(a, bb):
            a = a / np.linalg.norm(a, axis=-1, keepdims=True)
            bb = bb / np.linalg.norm(bb, axis=-1, keepdims=True)
            return a @ bb.T

        p2i = np.exp(cos(proxy, embed) / t)
        i2i = np.exp(cos(embed, embed) / t)
        mask = (labels[:, None] == labels[None, :]).astype(np.float32)
        want = (-np.mean(np.log(t * (p2i * mask).sum(1) / p2i.sum(1)))
                - np.mean(np.log(t * (i2i * mask).sum(1) / i2i.sum(1))))
        got = float(losses.conditional_contrastive_loss_plus(
            jnp.asarray(embed), jnp.asarray(proxy),
            losses.make_mask(jnp.asarray(labels), ncls),
            jnp.asarray(labels), t, 0.0))
        assert got == pytest.approx(float(want), rel=1e-5)

    def test_gradient_penalty_runs(self):
        from tests.helpers import tiny_config
        from ieagan_tpu.models import Discriminator
        cfg = tiny_config()
        D = Discriminator.from_config(cfg)
        B = cfg["n_classes"] * cfg["events_per_batch"]
        shape = (B, cfg["resolution"], cfg["resolution"] * cfg["H_base"], 1)
        real = jax.random.uniform(jax.random.PRNGKey(0), shape, minval=-1, maxval=1)
        fake = jax.random.uniform(jax.random.PRNGKey(1), shape, minval=-1, maxval=1)
        y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])
        dv = D.init({"params": jax.random.PRNGKey(2)}, real, y, train=False)
        gp = losses.gradient_penalty(
            lambda v, xx, yy: D.apply(v, xx, yy, train=False),
            dv, real, fake, y, jax.random.PRNGKey(3))
        assert np.isfinite(float(gp)) and float(gp) >= 0.0

    def test_gradient_penalty_dragan_runs(self):
        """DRAGAN variant (reference: loss.py:232-265 calc_derv4dra)."""
        from tests.helpers import tiny_config
        from ieagan_tpu.models import Discriminator
        cfg = tiny_config()
        D = Discriminator.from_config(cfg)
        B = cfg["n_classes"] * cfg["events_per_batch"]
        shape = (B, cfg["resolution"], cfg["resolution"] * cfg["H_base"], 1)
        real = jax.random.uniform(jax.random.PRNGKey(0), shape, minval=-1, maxval=1)
        y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])
        dv = D.init({"params": jax.random.PRNGKey(2)}, real, y, train=False)
        gp = losses.gradient_penalty_dragan(
            lambda v, xx, yy: D.apply(v, xx, yy, train=False),
            dv, real, y, jax.random.PRNGKey(3))
        assert np.isfinite(float(gp)) and float(gp) >= 0.0

    def test_latent_gradient_norm_closed_form(self):
        """For linear G and scoring, the z-gradient is the composed matrix
        (reference: loss.py:268-293 calc_derv)."""
        rng = np.random.RandomState(0)
        W = rng.randn(6, 4).astype(np.float32)   # z (B,6) -> img (B,4)
        v = rng.randn(4).astype(np.float32)      # score = img @ v
        z = rng.randn(3, 6).astype(np.float32)
        g_apply = lambda zz, yy: zz @ jnp.asarray(W)
        d_apply = lambda img, yy: (None, None, img @ jnp.asarray(v))
        grads, gnorm = losses.latent_gradient_norm(
            g_apply, d_apply, jnp.asarray(z), None)
        want = np.tile(W @ v, (3, 1))
        np.testing.assert_allclose(np.asarray(grads), want, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gnorm)[:, 0], np.sum(want ** 2, axis=1), rtol=1e-5)


class TestEmaGating:
    def test_decay_zero_before_start(self):
        """Before ema_start the EMA pegs to the source params
        (reference: utils/__init__.py:825-831)."""
        from tests.helpers import tiny_config
        from ieagan_tpu.models import Generator, Discriminator
        from ieagan_tpu.train import init_train_state, make_train_step
        cfg = tiny_config(ema_start=1000, compute_dtype="float32")
        G = Generator.from_config(cfg)
        D = Discriminator.from_config(cfg)
        state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(G, D, cfg))
        B = cfg["n_classes"] * cfg["events_per_batch"]
        x = jax.random.uniform(jax.random.PRNGKey(1),
                               (B, cfg["resolution"],
                                cfg["resolution"] * cfg["H_base"], 1),
                               minval=-1, maxval=1)
        y = jnp.tile(jnp.arange(cfg["n_classes"]), cfg["events_per_batch"])
        s1, _ = step(state, x, y, jax.random.PRNGKey(2))
        # itr=1 < ema_start -> ema == params exactly
        for a, b in zip(jax.tree_util.tree_leaves(s1.params_G_ema),
                        jax.tree_util.tree_leaves(s1.params_G)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
