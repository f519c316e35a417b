"""Tests for sampling/plot/log-read utilities."""

import hashlib
import json
from pathlib import Path

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


class TestSamplingSheets:
    @pytest.fixture(scope="class")
    def tiny_gen(self):
        from tests.helpers import tiny_config
        from ieagan_tpu.models import Generator
        cfg = tiny_config(compute_dtype="float32")
        G = Generator.from_config(cfg)
        es = cfg["n_classes"]
        z = jnp.zeros((es, cfg["dim_z"]))
        y = jnp.arange(es)
        v = G.init({"params": jax.random.PRNGKey(0),
                    "rdof": jax.random.PRNGKey(1)}, z, y, train=False)
        params = v["params"]
        state = {k: x for k, x in v.items() if k != "params"}
        return cfg, G, params, state

    def test_sample_sheet_shape(self, tiny_gen):
        from ieagan_tpu.utils.sampling import sample_sheet
        cfg, G, params, state = tiny_gen
        sheets = sample_sheet(G, params, state, cfg, jax.random.PRNGKey(0),
                              samples_per_class=2)
        es = cfg["n_classes"]
        h = cfg["resolution"] - 6
        w = cfg["resolution"] * cfg["H_base"]
        assert sheets.shape == (es, 2, h, w)
        assert float(sheets.min()) >= 0.0 and float(sheets.max()) <= 255.0

    def test_interp_sheet_shape(self, tiny_gen):
        from ieagan_tpu.utils.sampling import interp_sheet
        cfg, G, params, state = tiny_gen
        out = interp_sheet(G, params, state, cfg, jax.random.PRNGKey(1),
                           num_midpoints=2)
        es = cfg["n_classes"]
        assert out.shape[:2] == (es, 4)

    def test_generate_images_to_folder(self, tiny_gen, tmp_path):
        from ieagan_tpu.utils.sampling import generate_images
        cfg, G, params, state = tiny_gen
        n = generate_images(str(tmp_path), G, params, state,
                            dict(cfg, trunc_z=0.5, denoise=False),
                            jax.random.PRNGKey(2), n_images=6)
        assert n == 6
        files = sorted(tmp_path.glob("image_*.png"))
        assert len(files) == 6
        from PIL import Image
        img = Image.open(files[0])
        assert img.size == (cfg["resolution"] * cfg["H_base"],
                            cfg["resolution"] - 6)


class TestArchiveCheckpoint:
    """scripts/archive_checkpoint.py — the volatile-host artifact saver."""

    def _fake_weights(self, run_dir, tag, itr, best_fid=None):
        w = run_dir / "weights"
        w.mkdir(parents=True, exist_ok=True)
        for base in ("G", "G_optim", "D", "D_optim", "G_ema"):
            (w / f"{base}_{tag}.msgpack").write_bytes(
                f"{base}-{tag}-{itr}".encode())
        sd = {"itr": itr, "epoch": 0}
        if best_fid is not None:
            sd["best_FID"] = best_fid
        (w / f"state_dict_{tag}.json").write_text(json.dumps(sd))

    def _load(self, tmp_path):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "archive_checkpoint",
            Path(__file__).parent.parent / "scripts" / "archive_checkpoint.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.REPO = tmp_path
        return mod

    def test_newest_tag_and_manifest(self, tmp_path, monkeypatch):
        mod = self._load(tmp_path)

        run = tmp_path / "runs" / "myrun"
        self._fake_weights(run, "copy0", 1000)
        self._fake_weights(run, "copy1", 3000)
        self._fake_weights(run, "best0", 2000, best_fid=150.0)
        self._fake_weights(run, "best1", 2500, best_fid=120.0)
        assert mod.newest_tag(run / "weights") == "copy1"
        # best_tag: the lowest-FID best<N> rotation, NOT the newest tag
        assert mod.best_tag(run / "weights") == "best1"
        assert mod.best_tag(tmp_path) is None  # no state_dicts at all

        # main() archives the newest tag into <repo>/artifacts/<run>
        monkeypatch.setattr(
            "sys.argv", ["archive_checkpoint.py", str(run), "--no-optim"])
        mod.main()
        dest = tmp_path / "artifacts" / "myrun"
        manifest = json.loads((dest / "MANIFEST.json").read_text())
        assert set(manifest["tags"]) == {"copy1"}
        files = manifest["tags"]["copy1"]
        assert set(files) == {
            "G_copy1.msgpack", "D_copy1.msgpack", "G_ema_copy1.msgpack",
            "state_dict_copy1.json"}
        for name, meta in files.items():
            p = dest / name
            assert p.stat().st_size == meta["bytes"]
            assert hashlib.sha256(
                p.read_bytes()).hexdigest() == meta["sha256"]

        # A second tag merges into the same manifest (copy + best coexist,
        # the auto_archive.sh contract)...
        monkeypatch.setattr(
            "sys.argv",
            ["archive_checkpoint.py", str(run), "best1", "--no-optim"])
        mod.main()
        manifest = json.loads((dest / "MANIFEST.json").read_text())
        assert set(manifest["tags"]) == {"copy1", "best1"}

        # ...and entries whose files were pruned drop out on re-archive.
        for p in dest.glob("*_copy1.*"):
            p.unlink()
        mod.main()  # re-archives best1; prunes the dangling copy1 entry
        manifest = json.loads((dest / "MANIFEST.json").read_text())
        assert set(manifest["tags"]) == {"best1"}

    def test_best_tag_survives_resume_threshold_reset(self, tmp_path):
        """Across resume legs a NEWER best<N> can hold a WORSE checkpoint
        (the driver's best_FID threshold resets when seeded from a copy<N>
        state_dict). min-FID selection must pick the older, better one
        (round-4 advisor, medium)."""
        mod = self._load(tmp_path)
        run = tmp_path / "runs" / "r"
        self._fake_weights(run, "best0", 14000, best_fid=119.4)
        self._fake_weights(run, "best1", 16000, best_fid=980.0)  # post-reset
        assert mod.best_tag(run / "weights") == "best0"
        # ties break to the later iteration
        self._fake_weights(run, "best1", 16000, best_fid=119.4)
        assert mod.best_tag(run / "weights") == "best1"

    def test_legacy_single_tag_manifest_migrates(self, tmp_path, monkeypatch):
        """An old-format {"tag","files"} MANIFEST.json folds into
        manifest["tags"] on the next archive — the exact path the live
        flagship_r4b archive hit on its first post-upgrade run
        (round-4 advisor, low)."""
        mod = self._load(tmp_path)
        run = tmp_path / "runs" / "r"
        self._fake_weights(run, "copy2", 2000)
        dest = tmp_path / "artifacts" / "r"
        dest.mkdir(parents=True)
        # legacy layout: single tag at top level, its file present on disk
        (dest / "state_dict_copy1.json").write_text(
            json.dumps({"itr": 1000, "epoch": 0}))
        (dest / "MANIFEST.json").write_text(json.dumps({
            "run": "r", "tag": "copy1",
            "files": {"state_dict_copy1.json": {
                "sha256": "0" * 64, "bytes": 24}}}))
        mod.archive_tag(run, "copy2", mod.EMA_BASES)
        manifest = json.loads((dest / "MANIFEST.json").read_text())
        assert set(manifest["tags"]) == {"copy1", "copy2"}
        assert "tag" not in manifest  # rewritten in the new format

    def test_auto_cycle_policy(self, tmp_path):
        """--auto: best tags archive G_ema+state_dict only; copy tags
        archive in full but only every copy_every itrs; stale files are
        pruned only AFTER a successful archive (round-4 verdict item 5 +
        advisor low on ordering)."""
        mod = self._load(tmp_path)
        run = tmp_path / "runs" / "r"
        self._fake_weights(run, "copy3", 3000)
        self._fake_weights(run, "best0", 2500, best_fid=500.0)
        assert mod.auto_cycle(run, copy_every=2000, settle_s=0.0)
        dest = tmp_path / "artifacts" / "r"
        manifest = json.loads((dest / "MANIFEST.json").read_text())
        assert set(manifest["tags"]) == {"copy3", "best0"}
        assert set(manifest["tags"]["best0"]) == {
            "G_ema_best0.msgpack", "state_dict_best0.json"}  # ema-only
        assert len(manifest["tags"]["copy3"]) == 6  # full resume set

        # Nothing changed -> no-op cycle.
        assert not mod.auto_cycle(run, copy_every=2000, settle_s=0.0)

        # copy4 at +1000 itrs is below the cadence: still no copy archive,
        # but an improved best rotates in (ema-only) and evicts the old
        # best's files.
        self._fake_weights(run, "copy4", 4000)
        self._fake_weights(run, "best1", 4000, best_fid=300.0)
        assert mod.auto_cycle(run, copy_every=2000, settle_s=0.0)
        manifest = json.loads((dest / "MANIFEST.json").read_text())
        assert set(manifest["tags"]) == {"copy3", "best1"}
        assert not (dest / "G_ema_best0.msgpack").exists()
        assert (dest / "G_copy3.msgpack").exists()

        # copy5 at +2000 itrs crosses the cadence: full archive + prune of
        # the superseded copy3 files.
        self._fake_weights(run, "copy5", 5000)
        assert mod.auto_cycle(run, copy_every=2000, settle_s=0.0)
        manifest = json.loads((dest / "MANIFEST.json").read_text())
        assert set(manifest["tags"]) == {"copy5", "best1"}
        assert not (dest / "G_copy3.msgpack").exists()
        assert (dest / "G_optim_copy5.msgpack").exists()
        assert (dest / "G_ema_best1.msgpack").exists()


class TestExtendDecision:
    """scripts/extend_decision.py — budget extension while FID falls."""

    def _decide(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "extend_decision",
            Path(__file__).parent.parent / "scripts" / "extend_decision.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.decide

    def test_policy(self):
        decide = self._decide()
        falling = [(8000, 751.0), (9000, 601.0), (10000, 160.0)]
        assert decide(falling, 10000, chunk=3000, cap=40000) == 13000
        # optimum 3 evals back -> stop (post-peak constant-lr diverges)
        past_peak = [(12000, 130.0), (13000, 119.0), (14000, 140.0),
                     (15000, 180.0), (16000, 400.0)]
        assert decide(past_peak, 16000, window=2) == "stop"
        # best inside the window -> keep going
        plateau = [(12000, 130.0), (13000, 125.0), (14000, 119.0),
                   (15000, 121.0)]
        assert decide(plateau, 15000, window=2, chunk=2000) == 17000
        # hard cap wins over a falling trajectory
        assert decide(falling, 40000, cap=40000) == "stop"
        assert decide(falling, 39000, chunk=3000, cap=40000) == 40000
        # too few evals to judge: extend conservatively
        assert decide([(1000, 5000.0)], 2000, chunk=1000) == 3000
