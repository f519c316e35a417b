"""Torch-oracle parity for the two most delicate primitives: SN power
iteration (reference: layers.py:89-165) and train-mode batch norm with
running-stat updates (reference: layers.py:622-742 via F.batch_norm)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


class TestPowerIterationOracle:
    def _torch_power_iteration(self, w, u, eps=1e-12):
        """Oracle of the reference's single-sv power iteration step:
        v = normalize(u W); u' = normalize(v Wᵀ); sv = v Wᵀ u'ᵀ."""
        with torch.no_grad():
            v = torch.nn.functional.normalize(u @ w, dim=-1, eps=eps)
            u_new = torch.nn.functional.normalize(v @ w.t(), dim=-1, eps=eps)
        sv = (v @ w.t() @ u_new.t()).squeeze()
        return sv, u_new

    def test_single_step_matches(self):
        from ieagan_tpu.ops.spectral import power_iteration
        rng = np.random.RandomState(0)
        w = rng.randn(12, 20).astype(np.float32)
        u = rng.randn(1, 12).astype(np.float32)
        svs, new_us = power_iteration(jnp.asarray(w), jnp.asarray(u),
                                      n_itrs=1, eps=1e-12)
        sv_t, u_t = self._torch_power_iteration(torch.from_numpy(w),
                                                torch.from_numpy(u))
        assert float(svs[0]) == pytest.approx(float(sv_t), rel=1e-5)
        np.testing.assert_allclose(np.asarray(new_us[0]), u_t.numpy()[0],
                                   rtol=1e-5, atol=1e-6)

    def test_sn_dense_normalizes_by_estimated_sv(self):
        """SNDense output == x @ (W / sv_est) with sv_est from the stored u."""
        from ieagan_tpu.ops.spectral import SNDense, power_iteration
        rng = np.random.RandomState(1)
        x = rng.randn(3, 10).astype(np.float32)
        mod = SNDense(6, use_bias=False, eps=1e-12)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        kernel = np.asarray(v["params"]["kernel"])  # (in, out)
        u = np.asarray(v["spectral"]["u"])
        svs, _ = power_iteration(jnp.asarray(kernel.T), jnp.asarray(u),
                                 n_itrs=1, eps=1e-12)
        want = x @ (kernel / float(svs[0]))
        got = np.asarray(mod.apply(v, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestBatchNormOracle:
    def test_ccbn_core_matches_torch_batch_norm(self):
        """Train-mode normalization + running-stat update must match
        torch.nn.functional.batch_norm (momentum 0.1, unbiased running var)."""
        from ieagan_tpu.ops.norm import ClassCondBatchNorm
        from ieagan_tpu.ops.spectral import Dense
        rng = np.random.RandomState(2)
        n, h, w, c = 4, 5, 6, 8
        x = rng.randn(n, h, w, c).astype(np.float32)
        y = rng.randn(n, 3).astype(np.float32)
        mod = ClassCondBatchNorm(c, functools.partial(Dense, use_bias=False),
                                 eps=1e-5)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y),
                     train=True)
        out, ups = mod.apply(v, jnp.asarray(x), jnp.asarray(y), train=True,
                             mutable=["batch_stats"])
        # oracle: torch batch_norm with identical running buffers
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        r_mean = torch.zeros(c)
        r_var = torch.ones(c)
        norm = torch.nn.functional.batch_norm(
            t, r_mean, r_var, None, None, True, 0.1, 1e-5)
        gain = 1.0 + y @ np.asarray(v["params"]["gain"]["kernel"])
        bias = y @ np.asarray(v["params"]["bias"]["kernel"])
        want = norm.numpy().transpose(0, 2, 3, 1) * gain[:, None, None, :] \
            + bias[:, None, None, :]
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-5)
        # running stats: (1-m)*old + m*batch, unbiased var for the update
        bs = ups["batch_stats"]
        np.testing.assert_allclose(np.asarray(bs["mean"]), r_mean.numpy(),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(bs["var"]), r_var.numpy(),
                                   rtol=1e-4, atol=1e-6)

    def test_eval_uses_running_stats(self):
        from ieagan_tpu.ops.norm import BatchNorm
        rng = np.random.RandomState(3)
        x = rng.randn(2, 4, 4, 5).astype(np.float32)
        mod = BatchNorm(5)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
        # seed running stats to something non-trivial
        v = {"params": v["params"],
             "batch_stats": {"mean": jnp.asarray(rng.randn(5), jnp.float32),
                             "var": jnp.asarray(rng.rand(5) + 0.5, jnp.float32),
                             "accumulation_counter": jnp.zeros(())}}
        out = mod.apply(v, jnp.asarray(x), train=False)
        mean = np.asarray(v["batch_stats"]["mean"])
        var = np.asarray(v["batch_stats"]["var"])
        want = (x - mean) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-5)
