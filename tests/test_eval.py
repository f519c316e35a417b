"""Evaluation-engine tests: resize equivalence, Inception graph parity vs
torch, Fréchet/KID numerics, end-to-end FID on synthetic data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ieagan_tpu.eval import fid as fid_mod
from ieagan_tpu.eval.resize import (pil_resize_batch, jax_resize_single_channel,
                                    pil_resize_single_channel)


class TestResize:
    def test_jax_matches_pil_bilinear(self):
        rng = np.random.RandomState(0)
        x = rng.rand(2, 250, 768).astype(np.float32)
        ref = pil_resize_batch(x)
        got = np.asarray(jax_resize_single_channel(jnp.asarray(x)))
        assert got.shape == ref.shape == (2, 299, 299, 3)
        # antialiased triangle filter == PIL bilinear (small float diffs)
        assert np.abs(got - ref).max() < 5e-3
        assert np.abs(got - ref).mean() < 2e-4

    def test_channel_replication(self):
        x = np.random.RandomState(1).rand(1, 64, 64).astype(np.float32)
        out = np.asarray(jax_resize_single_channel(jnp.asarray(x)))
        np.testing.assert_array_equal(out[..., 0], out[..., 1])
        np.testing.assert_array_equal(out[..., 0], out[..., 2])

    def test_jax_matches_pil_bicubic(self):
        """The fid-Copy_255 variant's bicubic resize
        (reference: fid-Copy_255.py:152)."""
        rng = np.random.RandomState(2)
        x = rng.rand(2, 250, 768).astype(np.float32) * 255.0
        ref = pil_resize_batch(x, interp="bicubic")
        got = np.asarray(jax_resize_single_channel(jnp.asarray(x),
                                                   interp="bicubic"))
        assert got.shape == ref.shape == (2, 299, 299, 3)
        assert np.abs(got - ref).max() < 5e-3 * 255.0
        # bicubic must actually differ from bilinear
        bil = pil_resize_batch(x, interp="bilinear")
        assert np.abs(ref - bil).max() > 1e-3


class TestClean255Mode:
    def test_folder_fid_mode_variant(self, tmp_path):
        """mode="clean_255" flows through folder features and changes the
        features (bicubic, [0,255] inputs — fid-Copy_255.py)."""
        from PIL import Image
        rng = np.random.RandomState(3)
        for sub in ["a", "b"]:
            (tmp_path / sub).mkdir()
            for i in range(3):
                arr = (rng.rand(60, 80) * 255).astype(np.uint8)
                Image.fromarray(arr, mode="L").save(
                    tmp_path / sub / f"{i}.png")
        ex = fid_mod.FeatureExtractor(seed=0)
        f_clean = fid_mod.get_folder_features(str(tmp_path / "a"), ex,
                                              batch_size=4, mode="clean")
        f_255 = fid_mod.get_folder_features(str(tmp_path / "a"), ex,
                                            batch_size=4, mode="clean_255")
        assert f_clean.shape == f_255.shape == (3, 2048)
        assert np.abs(f_clean - f_255).max() > 1e-6
        fid = fid_mod.compute_fid(fdir1=str(tmp_path / "a"),
                                  fdir2=str(tmp_path / "b"),
                                  extractor=ex, batch_size=4,
                                  mode="clean_255")
        assert np.isfinite(fid)


class TestFrechet:
    def test_zero_for_identical(self):
        rng = np.random.RandomState(0)
        f = rng.randn(500, 16)
        mu, sig = f.mean(0), np.cov(f, rowvar=False)
        assert fid_mod.frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)

    def test_mean_shift(self):
        # diagonal-identity covs: FID == ||dmu||^2
        d = 8
        mu1, mu2 = np.zeros(d), np.ones(d) * 2.0
        sig = np.eye(d)
        assert fid_mod.frechet_distance(mu1, sig, mu2, sig) == pytest.approx(4.0 * d)

    def test_device_frechet_matches_host(self):
        """The transfer-light on-device Fréchet (eigh identity) must agree
        with the scipy-sqrtm host path on realistic covariances."""
        rng = np.random.RandomState(1)
        d, n = 96, 400
        x1 = rng.randn(n, d) * rng.rand(d) * 3
        x2 = rng.randn(n, d) * rng.rand(d) * 2 + 0.3
        mu1, s1 = x1.mean(0), np.cov(x1, rowvar=False)
        mu2, s2 = x2.mean(0), np.cov(x2, rowvar=False)
        host = fid_mod.frechet_distance(mu1, s1, mu2, s2)
        dev = float(fid_mod._frechet_device(
            mu1.astype(np.float32), s1.astype(np.float32),
            mu2.astype(np.float32), s2.astype(np.float32)))
        assert abs(dev - host) / host < 1e-4, (host, dev)

    def test_device_moments_match_host_cov_2048d(self):
        """The on-device f32 moment accumulation (pilot-centered, highest-
        precision X^T X) must reproduce host f64 np.cov at the real feature
        width (2048) with a realistic non-zero mean — the cancellation
        regime the one-pass formula is worst at. Guards the in-training FID
        hook's numerics (fid_moments_on_device default)."""
        rng = np.random.RandomState(7)
        d, n, bs = 2048, 1920, 320
        # Inception-pool-like features: non-negative-ish, per-dim offsets
        mean = rng.rand(d).astype(np.float64) * 0.8
        scale = (0.05 + rng.rand(d) * 0.5).astype(np.float64)
        feats = (rng.randn(n, d) * scale + mean).astype(np.float32)

        acc_s = jnp.zeros((d,), jnp.float32)
        acc_o = jnp.zeros((d, d), jnp.float32)
        pilot = jnp.asarray(feats[:bs].mean(0))
        for i in range(0, n, bs):
            acc_s, acc_o = fid_mod._moment_update(
                acc_s, acc_o, jnp.asarray(feats[i:i + bs]), pilot)
        mu_dev = np.asarray(pilot, np.float64) + np.asarray(acc_s, np.float64) / n
        s_over_n = np.asarray(acc_s, np.float64) / n
        sig_dev = (np.asarray(acc_o, np.float64)
                   - n * np.outer(s_over_n, s_over_n)) / (n - 1)

        mu_host = feats.astype(np.float64).mean(0)
        sig_host = np.cov(feats.astype(np.float64), rowvar=False)
        assert np.abs(mu_dev - mu_host).max() < 1e-5
        # relative Frobenius error of the covariance
        rel = (np.linalg.norm(sig_dev - sig_host)
               / np.linalg.norm(sig_host))
        assert rel < 1e-4, rel
        # and the FID the two covariance paths produce must agree closely
        mu2 = mu_host + 0.05
        sig2 = sig_host * 1.1
        f_host = fid_mod.frechet_distance(mu_host, sig_host, mu2, sig2)
        f_dev = fid_mod.frechet_distance(mu_dev, sig_dev, mu2, sig2)
        assert abs(f_dev - f_host) / max(abs(f_host), 1e-9) < 5e-3, (f_host, f_dev)

    def test_packed_device_put_roundtrip(self):
        from ieagan_tpu.utils.transfer import packed_device_put
        rng = np.random.RandomState(2)
        # f32/i32 only: f64 leaves are truncated under the default
        # jax_enable_x64=False, exactly as plain device_put would
        tree = {"a": rng.randn(3, 5).astype(np.float32),
                "b": {"c": rng.randn(7).astype(np.float32),
                      "d": np.int32(4),
                      "e": rng.randn(2, 2, 2).astype(np.float32)}}
        dev = packed_device_put(tree)
        flat_in = jax.tree_util.tree_leaves(tree)
        flat_out = jax.tree_util.tree_leaves(dev)
        for a, b in zip(flat_in, flat_out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert np.asarray(b).dtype == np.asarray(a).dtype

    def test_kid_zero_for_same_distribution(self):
        rng = np.random.RandomState(0)
        f1 = rng.randn(400, 8)
        f2 = rng.randn(400, 8)
        kid_same = fid_mod.kernel_distance(f1, f2, num_subsets=20, seed=0)
        kid_diff = fid_mod.kernel_distance(f1, f2 + 3.0, num_subsets=20, seed=0)
        assert abs(kid_same) < 0.5
        assert kid_diff > 10 * abs(kid_same)


class TestFidPostprocess:
    def test_threshold_and_range(self):
        imgs = jnp.stack([jnp.full((256, 768, 1), -0.5),
                          jnp.zeros((256, 768, 1))])
        out = np.asarray(fid_mod.fid_postprocess(imgs))
        assert out.shape == (2, 250, 768)
        np.testing.assert_allclose(out[0], 0.0, atol=1e-6)  # below cut
        np.testing.assert_allclose(out[1], 15.0 / 255.0, rtol=1e-5)

    def test_trunc_trick_bounds(self):
        z = np.asarray(fid_mod.trunc_trick(jax.random.PRNGKey(0), (64, 128),
                                           bound=0.5))
        assert np.abs(z).max() <= 0.5


class TestInceptionParity:
    """Cross-framework parity of the converted building blocks against a
    torch oracle (torchvision itself isn't installed in this image; these
    use the same Conv/BN/pool semantics its inception_v3 is made of)."""

    def _torch_basic_conv(self, torch, out_ch, in_ch, k, s, p, seed):
        g = torch.Generator().manual_seed(seed)
        conv = torch.nn.Conv2d(in_ch, out_ch, k, stride=s, padding=p, bias=False)
        bn = torch.nn.BatchNorm2d(out_ch, eps=1e-3).eval()
        with torch.no_grad():
            conv.weight.copy_(torch.randn(conv.weight.shape, generator=g))
            bn.weight.copy_(torch.rand(out_ch, generator=g) + 0.5)
            bn.bias.copy_(torch.randn(out_ch, generator=g))
            bn.running_mean.copy_(torch.randn(out_ch, generator=g))
            bn.running_var.copy_(torch.rand(out_ch, generator=g) + 0.5)
        return conv, bn

    def test_basic_conv2d_matches_torch(self):
        torch = pytest.importorskip("torch")
        from ieagan_tpu.eval.inception import BasicConv2d, convert_torch_state_dict
        for k, s, p in [((3, 3), (2, 2), (0, 0)), ((1, 7), (1, 1), (0, 3)),
                        ((5, 5), (1, 1), (2, 2))]:
            conv, bn = self._torch_basic_conv(torch, 8, 5, k, s, p, seed=0)
            sd = {"blk.conv.weight": conv.weight.detach(),
                  "blk.bn.weight": bn.weight.detach(),
                  "blk.bn.bias": bn.bias.detach(),
                  "blk.bn.running_mean": bn.running_mean,
                  "blk.bn.running_var": bn.running_var}
            params = convert_torch_state_dict(sd)["blk"]
            x = np.random.RandomState(1).rand(2, 21, 23, 5).astype(np.float32)
            ours = np.asarray(BasicConv2d(8, k, strides=s, padding=p).apply(
                {"params": params}, jnp.asarray(x)))
            with torch.no_grad():
                t = torch.from_numpy(x.transpose(0, 3, 1, 2))
                theirs = torch.relu(bn(conv(t))).numpy().transpose(0, 2, 3, 1)
            assert np.abs(ours - theirs).max() < 1e-4, (k, s, p)

    def test_pools_match_torch(self):
        torch = pytest.importorskip("torch")
        from ieagan_tpu.eval.inception import _avg_pool3, _max_pool3s2
        x = np.random.RandomState(2).rand(2, 35, 35, 3).astype(np.float32)
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        avg_ref = torch.nn.functional.avg_pool2d(t, 3, stride=1, padding=1) \
            .numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(_avg_pool3(jnp.asarray(x))),
                                   avg_ref, rtol=1e-5, atol=1e-6)
        max_ref = torch.nn.functional.max_pool2d(t, 3, stride=2) \
            .numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(_max_pool3s2(jnp.asarray(x))),
                                   max_ref, rtol=1e-5, atol=1e-6)

    def test_feature_shape(self):
        from ieagan_tpu.eval.inception import init_feature_params
        model, params = init_feature_params(seed=0)
        x = jnp.zeros((1, 299, 299, 3))
        out = model.apply({"params": params}, x)
        assert out.shape == (1, 2048)


class TestEndToEndFid:
    def test_generator_fid_runs(self, tmp_path, monkeypatch):
        """FID of a dummy 'generator' against stats minted from its own
        outputs should be ~0 (same distribution)."""
        monkeypatch.setattr(fid_mod, "STATS_DIR", str(tmp_path))
        extractor = fid_mod.FeatureExtractor(seed=0)
        h, w, es = 32, 32, 4

        def gen_fn(key):
            return jax.random.uniform(key, (es, h, w, 1), minval=-1.0,
                                      maxval=1.0)

        # mint stats from the same distribution
        feats_ref = fid_mod.get_model_features(
            gen_fn, extractor, num_gen=32, batch_size=es,
            rng=jax.random.PRNGKey(1))
        np.savez_compressed(tmp_path / "selftest_clean_custom_na.npz",
                            mu=feats_ref.mean(0),
                            sigma=np.cov(feats_ref, rowvar=False))
        fid = fid_mod.compute_fid(gen_fn, dataset_name="selftest", num_gen=32,
                                  batch_size=es, rng=jax.random.PRNGKey(2),
                                  extractor=extractor)
        assert np.isfinite(fid)
        # vs a shifted distribution the score must grow
        def gen_shifted(key):
            return jnp.clip(gen_fn(key) + 0.8, -1, 1)
        fid_shift = fid_mod.compute_fid(gen_shifted, dataset_name="selftest",
                                        num_gen=32, batch_size=es,
                                        rng=jax.random.PRNGKey(2),
                                        extractor=extractor)
        assert fid_shift > fid

    def test_missing_stats_raises(self, monkeypatch, tmp_path):
        monkeypatch.setattr(fid_mod, "STATS_DIR", str(tmp_path))
        with pytest.raises(FileNotFoundError):
            fid_mod.get_reference_statistics("nope")


class TestPhysicsStats:
    def test_stats_shapes_and_threshold(self):
        from ieagan_tpu.eval import physics
        rng = np.random.RandomState(0)

        def stream():
            while True:
                adu = rng.rand(4, 32, 32) * 60.0
                adu[adu < physics.THRESHOLD] = 0.0
                yield adu, np.arange(4)

        stats = physics.get_stats(stream(), n_events=5)
        assert stats["n_events"] == 5
        assert stats["per_sensor_mean_charge"].shape == (4,)
        assert stats["per_sensor_occupancy"].shape == (4,)
        assert stats["intensity_hist"].sum() == 5 * 4 * 32 * 32
        # mean charge is over above-threshold pixels only
        assert stats["per_sensor_mean_charge"].min() >= physics.THRESHOLD

    def test_log_transform_inv(self):
        from ieagan_tpu.eval.physics import log_transform_inv
        assert log_transform_inv(np.array(1.0)) == pytest.approx(255.0)
        assert log_transform_inv(np.array(-1.0)) == pytest.approx(0.0)

    def test_generate_event_stream_scan_blocked(self):
        """The scan-blocked stream (events_per_call>1) yields per-event
        noise-cut cropped ADU with the same contract as one-per-call, and
        is deterministic in the seed."""
        from ieagan_tpu.eval import physics
        from ieagan_tpu.models import Generator
        from tests.helpers import tiny_config
        cfg = tiny_config()
        G = Generator.from_config(cfg)
        es, h, w = cfg["n_classes"], cfg["resolution"], \
            cfg["resolution"] * cfg["H_base"]
        gv = G.init({"params": jax.random.PRNGKey(0),
                     "rdof": jax.random.PRNGKey(1)},
                    jnp.zeros((es, cfg["dim_z"])), jnp.arange(es),
                    train=False)
        params = gv["params"]
        state = {k: v for k, v in gv.items() if k != "params"}
        s1 = physics.generate_event_stream(G, params, state, cfg, seed=3,
                                           events_per_call=4)
        evs = [next(s1) for _ in range(5)]
        for adu, labels in evs:
            assert adu.shape == (es, h - 6, w)
            assert ((adu == 0) | (adu >= physics.THRESHOLD)).all()
            assert (labels == np.arange(es)).all()
        # distinct events, deterministic in seed
        assert not np.array_equal(evs[0][0], evs[1][0])
        s2 = physics.generate_event_stream(G, params, state, cfg, seed=3,
                                           events_per_call=4)
        np.testing.assert_array_equal(evs[0][0], next(s2)[0])

    def test_device_stats_match_host_path(self):
        """generate_stats (on-device reductions) must reproduce
        get_stats(generate_event_stream(...)) for the same seed — exact
        histograms (identical f32 ADU, integer-exact bin edges, counts
        divided on host in f64) and f32-rounding-tolerant mean charge.
        Uses n_events not a multiple of events_per_call to exercise the
        tail-block trim."""
        from ieagan_tpu.eval import physics
        from ieagan_tpu.models import Generator
        from tests.helpers import tiny_config
        cfg = tiny_config()
        G = Generator.from_config(cfg)
        es = cfg["n_classes"]
        gv = G.init({"params": jax.random.PRNGKey(0),
                     "rdof": jax.random.PRNGKey(1)},
                    jnp.zeros((es, cfg["dim_z"])), jnp.arange(es),
                    train=False)
        params = gv["params"]
        state = {k: v for k, v in gv.items() if k != "params"}
        host = physics.get_stats(
            physics.generate_event_stream(G, params, state, cfg, seed=3,
                                          events_per_call=4), n_events=6)
        dev = physics.generate_stats(G, params, state, cfg, n_events=6,
                                     seed=3, events_per_call=4)
        assert dev["n_events"] == host["n_events"] == 6
        np.testing.assert_array_equal(dev["intensity_hist"],
                                      host["intensity_hist"])
        np.testing.assert_array_equal(dev["occupancy_hist"],
                                      host["occupancy_hist"])
        np.testing.assert_allclose(dev["per_sensor_occupancy"],
                                   host["per_sensor_occupancy"], rtol=0,
                                   atol=0)
        np.testing.assert_allclose(dev["per_sensor_mean_charge"],
                                   host["per_sensor_mean_charge"],
                                   rtol=1e-5, equal_nan=True)

    def test_zero_count_events_excluded_from_mean_charge(self):
        """A sensor with zero above-threshold pixels in some events must not
        drag its mean charge toward 0 (reference eval_all.py:92-96 computes
        per-event sum/count; zero-count events are excluded here rather than
        propagating NaN)."""
        from ieagan_tpu.eval import physics
        acc = physics.EventStats()
        ev_hot = np.zeros((2, 8, 8))
        ev_hot[0, 0, 0] = 50.0   # sensor 0 fires with charge 50
        ev_hot[1, :, :] = 20.0   # sensor 1 uniformly 20
        ev_cold = np.zeros((2, 8, 8))
        ev_cold[1, :, :] = 10.0  # sensor 0 silent this event
        acc.update(ev_hot)
        acc.update(ev_cold)
        s = acc.summary()
        # sensor 0: only the hot event counts -> exactly 50, not 25
        assert s["per_sensor_mean_charge"][0] == pytest.approx(50.0)
        assert s["per_sensor_mean_charge"][1] == pytest.approx(15.0)
        # occupancy still averages over all events (unchanged semantics)
        assert s["per_sensor_occupancy"][0] == pytest.approx(0.5 / 64)


class TestKid:
    def test_compute_kid_folder_and_gen(self, tmp_path, monkeypatch):
        monkeypatch.setattr(fid_mod, "STATS_DIR", str(tmp_path))
        extractor = fid_mod.FeatureExtractor(seed=0)
        es, h, w = 4, 32, 32

        def gen_fn(key):
            return jax.random.uniform(key, (es, h, w, 1), minval=-1.0, maxval=1.0)

        feats_ref = fid_mod.get_model_features(
            gen_fn, extractor, num_gen=24, batch_size=es,
            rng=jax.random.PRNGKey(1))
        np.savez_compressed(tmp_path / "selftest_clean_custom_na_kid.npz",
                            feats=feats_ref)
        kid_same = fid_mod.compute_kid(gen_fn, dataset_name="selftest",
                                       num_gen=24, batch_size=es,
                                       rng=jax.random.PRNGKey(2),
                                       extractor=extractor, seed=0)

        def gen_shifted(key):
            return jnp.clip(gen_fn(key) + 0.9, -1, 1)

        kid_shift = fid_mod.compute_kid(gen_shifted, dataset_name="selftest",
                                        num_gen=24, batch_size=es,
                                        rng=jax.random.PRNGKey(2),
                                        extractor=extractor, seed=0)
        assert np.isfinite(kid_same) and np.isfinite(kid_shift)
        assert kid_shift > kid_same

    def test_compute_kid_missing_stats(self, tmp_path, monkeypatch):
        monkeypatch.setattr(fid_mod, "STATS_DIR", str(tmp_path))
        with pytest.raises(FileNotFoundError):
            fid_mod.compute_kid(lambda k: None, dataset_name="nope")
