"""Tests for sampling/plot/log-read utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ieagan_tpu.utils import (sample_z, sample_y, interp, read_metric_log,
                              read_jsonl, cosine_similarity_matrix,
                              plot_sim_heatmap)


class TestSamplers:
    def test_sample_z_dists(self):
        k = jax.random.PRNGKey(0)
        z = sample_z(k, 64, 16, "normal")
        assert z.shape == (64, 16)
        zc = sample_z(k, 64, 16, "censored_normal")
        assert float(zc.min()) >= 0.0
        zb = sample_z(k, 64, 16, "bernoulli")
        assert set(np.unique(np.asarray(zb))).issubset({0.0, 1.0})
        zt = sample_z(k, 64, 16, "truncated_normal", threshold=0.7)
        assert float(jnp.abs(zt).max()) <= 0.7

    def test_sample_y_permuted(self):
        y = sample_y(jax.random.PRNGKey(1), 40, events=3, y_dist="permuted")
        assert y.shape == (120,)
        for e in range(3):
            ev = np.sort(np.asarray(y[e * 40:(e + 1) * 40]))
            np.testing.assert_array_equal(ev, np.arange(40))

    def test_interp_endpoints(self):
        x0 = jnp.zeros((2, 3))
        x1 = jnp.ones((2, 3))
        out = interp(x0, x1, 3)
        assert out.shape == (2, 5, 3)
        np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0)
        np.testing.assert_allclose(np.asarray(out[:, -1]), 1.0)
        np.testing.assert_allclose(np.asarray(out[:, 2]), 0.5)


class TestLogRead:
    def test_round_trip(self, tmp_path):
        from ieagan_tpu.utils import Logger, MetricsLogger
        cfg = {"outputroot": str(tmp_path), "run_name": "r",
               "metric_log_name": "m.jsonl", "logstyle": "%3.3e",
               "reinitialize_metric_logs": False,
               "reinitialize_parameter_logs": False}
        (tmp_path / "r" / "logs").mkdir(parents=True)
        log = Logger(cfg)
        log.log(10, G_loss=1.5, D_loss=2.5)
        log.log(20, G_loss=1.25)
        itrs, vals = read_metric_log(tmp_path / "r" / "logs" / "G_loss.log")
        np.testing.assert_array_equal(itrs, [10, 20])
        np.testing.assert_allclose(vals, [1.5, 1.25])
        mlog = MetricsLogger(cfg)
        mlog.log(itr=1, FID=42.0)
        recs = read_jsonl(tmp_path / "r" / "logs" / "m.jsonl")
        assert recs[0]["FID"] == 42.0 and "_stamp" in recs[0]


class TestPlots:
    def test_cosine_sim(self):
        e = np.eye(4)
        sim = cosine_similarity_matrix(e)
        np.testing.assert_allclose(sim, np.eye(4), atol=1e-12)

    def test_heatmap_writes_file(self, tmp_path):
        emb = np.random.RandomState(0).randn(8, 16)
        out = plot_sim_heatmap(emb, str(tmp_path / "h.jpg"))
        assert (tmp_path / "h.jpg").exists()
        assert out.shape == (8, 8)
        np.testing.assert_allclose(np.diag(out), 1.0, atol=1e-9)
