"""End-to-end driver test: train loop + logging + checkpointing + resume
(the reference exercises this only via the --debug dummy path,
train.py:147-149; here the real step runs on synthetic data)."""

import json
import os

import jax
import numpy as np
import pytest

from ieagan_tpu.train.driver import run
from ieagan_tpu.utils import initialize_directories
from tests.helpers import tiny_config


@pytest.fixture(scope="module")
def finished_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("runs")
    cfg = tiny_config(
        outputroot=str(root), run_name="t1", debug=True, debug_batches=3,
        num_epochs=1, log_interval=1, sv_log_interval=2, save_every=3,
        test_every=1000, compute_dtype="float32")
    initialize_directories(cfg)
    state, state_dict = run(cfg)
    return root, cfg, state, state_dict


@pytest.mark.quick
def test_run_completes_and_logs(finished_run):
    root, cfg, state, state_dict = finished_run
    assert int(state.itr) == 3
    logs = root / "t1" / "logs"
    assert (logs / "G_loss.log").exists()
    first = (logs / "G_loss.log").read_text().splitlines()[0]
    itr, val = first.split(": ")
    assert int(itr) == 1 and float(val) == pytest.approx(float(val))
    # sv logs written in the reference's per-metric format
    svs = list(logs.glob("*_sv.log"))
    assert svs


@pytest.mark.quick
def test_checkpoint_artifacts(finished_run):
    root, cfg, state, state_dict = finished_run
    weights = root / "t1" / "weights"
    for comp in ["G", "D", "G_optim", "D_optim", "G_ema"]:
        assert (weights / f"{comp}_copy3.msgpack").exists()
    sd = json.loads((weights / "state_dict_copy3.json").read_text())
    assert sd["itr"] == 3
    assert (root / "t1" / "samples" / "fixed_samples3.jpg").exists()


def test_legacy_optim_checkpoint_grafts_into_scheduled_tree(finished_run):
    """Optimizer msgpacks saved before round 5 carry the constant-lr
    structure (EmptyState at the lr node); the uniform-schedule optimizer
    now always has ScaleByScheduleState(count). load_checkpoint must
    graft the legacy moments and seed count with the resumed itr — the
    flagship's post-peak CosAnnealLR leg resumes exactly such a file."""
    import optax
    from flax import serialization
    from ieagan_tpu.models import Generator, Discriminator
    from ieagan_tpu.train import init_train_state
    from ieagan_tpu.utils import load_checkpoint
    root, cfg, state, state_dict = finished_run
    weights = root / "t1" / "weights"

    # overwrite the optim files with legacy (pre-round-5) structure
    legacy_tx = optax.adam(float(cfg["G_lr"]), b1=float(cfg["G_B1"]),
                           b2=float(cfg["G_B2"]), eps=float(cfg["adam_eps"]))
    for base, params in [("G_optim", state.params_G),
                         ("D_optim", state.params_D)]:
        legacy = legacy_tx.init(jax.tree_util.tree_map(np.asarray, params))
        assert isinstance(legacy[-1], optax.EmptyState)  # really legacy
        (weights / f"{base}_copy3.msgpack").write_bytes(
            serialization.to_bytes(legacy))

    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    fresh = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
    restored, sd = load_checkpoint(weights, fresh, "copy3")
    counts = [np.asarray(s.count)
              for s in jax.tree_util.tree_leaves(
                  restored.opt_G,
                  is_leaf=lambda s: isinstance(
                      s, optax.ScaleByScheduleState))
              if isinstance(s, optax.ScaleByScheduleState)]
    assert counts and all(int(c) == sd["itr"] for c in counts)


def test_resume_restores_itr(finished_run):
    root, cfg, state, state_dict = finished_run
    from ieagan_tpu.models import Generator, Discriminator
    from ieagan_tpu.train import init_train_state
    from ieagan_tpu.utils import load_checkpoint, latest_checkpoint
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    fresh = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
    tag = latest_checkpoint(root / "t1" / "weights")
    assert tag == "copy3"
    restored, sd = load_checkpoint(root / "t1" / "weights", fresh, tag)
    assert int(restored.itr) == 3
    import numpy as np
    a = jax.tree_util.tree_leaves(restored.params_G)
    b = jax.tree_util.tree_leaves(state.params_G)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_resume_floors_stale_best_threshold(finished_run, capsys):
    """A copy<N> saved BEFORE its itr's eval carries a stale best_FID;
    resuming from it must floor the rotation threshold to the best tags'
    recorded minimum, or the driver rotates a non-improvement over the
    true best (round-4 advisor high-severity; hit live in round 5 when a
    watchdog restart resumed copy14000/134.2 with best0/82.5 on disk)."""
    root, cfg, state, state_dict = finished_run
    import shutil
    import tempfile
    iso = tempfile.mkdtemp(prefix="resume_floor_")
    shutil.copytree(root / "t1", os.path.join(iso, "t1"))
    w = root / "t1" / "weights"  # fixture dir stays untouched
    w = type(w)(iso) / "t1" / "weights"
    sd = json.loads((w / "state_dict_copy3.json").read_text())
    sd["best_FID"] = 500.0
    (w / "state_dict_copy3.json").write_text(json.dumps(sd))
    (w / "state_dict_best0.json").write_text(json.dumps(
        dict(sd, itr=2, best_FID=42.0, save_best_num=0)))
    _, sd2 = run(dict(cfg, outputroot=iso, resume=True, num_epochs=2))
    assert sd2["best_FID"] == 42.0
    assert "threshold floored 500.00 -> 42.00" in capsys.readouterr().out


def test_create_gan_digits_from_driver_run_dir(finished_run, tmp_path,
                                               monkeypatch, capsys):
    """physics_analysis/create_gan_digits.py resolves the driver's TAGGED
    checkpoints (G_ema_copy<N>.msgpack — the only kind a run dir ever
    contains) and produces npz digit shards end-to-end (reference:
    Physics_Analysis/create_g1.py:167-185)."""
    import glob
    import importlib.util
    root, cfg, *_ = finished_run
    run_dir = root / "t1"
    cfg_dump = sorted(glob.glob(str(run_dir / "*_config.json")))[0]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "create_gan_digits", os.path.join(
            repo, "physics_analysis", "create_gan_digits.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "digits"
    monkeypatch.setattr("sys.argv", [
        "create_gan_digits.py", str(out), "2",
        "--checkpoint", str(run_dir / "weights"),
        "--config", cfg_dump, "--events-per-call", "1"])
    mod.main()
    printed = capsys.readouterr().out
    assert "G_ema_copy3.msgpack sha256:" in printed
    shards = sorted(out.glob("events_*.npz"))
    assert shards, "no npz shards produced"
    total = sum(int(np.load(s)["n_events"]) for s in shards)
    assert total == 2


def test_ema_survives_donated_step():
    """Guard for a backend-verified (not documented) XLA behavior: the
    jnp.copy inside the jitted init (train/step.py _build) must give
    params_G_ema buffers DISTINCT from params_G, or donating the TrainState
    into the train step would corrupt the EMA in place. Fails loudly if a
    future backend/XLA change starts aliasing identical jit outputs."""
    from ieagan_tpu.models import Generator, Discriminator
    from ieagan_tpu.train import init_train_state
    from ieagan_tpu.train.step import make_train_step

    cfg = tiny_config(compute_dtype="float32", ema_start=0, num_G_steps=1)
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))

    # 1) direct aliasing check on the freshly built state
    for a, b in zip(jax.tree_util.tree_leaves(state.params_G),
                    jax.tree_util.tree_leaves(state.params_G_ema)):
        assert a.unsafe_buffer_pointer() != b.unsafe_buffer_pointer(), \
            "params_G_ema aliases params_G — donation is unsound"

    # 2) behavioral check: after one donated step the new EMA leaves are
    # intact (finite and not all-zero garbage from a reused buffer)
    ema_before = jax.tree_util.tree_map(
        lambda l: np.array(l), state.params_G_ema)
    step = jax.jit(make_train_step(G, D, cfg), donate_argnums=(0,))
    epb = int(cfg["events_per_batch"])
    es = int(cfg["n_classes"])
    x = np.random.RandomState(0).randn(
        epb * es, int(cfg["resolution"]),
        int(cfg["resolution"]) * int(cfg["H_base"]), 1).astype(np.float32)
    y = np.tile(np.arange(es, dtype=np.int32), epb)
    new_state, _ = step(state, x, y, jax.random.PRNGKey(1))
    for before, after in zip(
            jax.tree_util.tree_leaves(ema_before),
            jax.tree_util.tree_leaves(new_state.params_G_ema)):
        after = np.asarray(after)
        assert np.all(np.isfinite(after))
        # decay<1 keeps the EMA near its previous value, never garbage
        assert np.allclose(after, before, atol=2.0)


def test_fid_eval_once_kid_physics_subprocess(finished_run, tmp_path):
    """The subprocess eval path with the test_every companions: one feature
    pass yields FID + KID, and --physics-events pickles stats in the run dir
    (driver config keys test_kid / test_physics_events)."""
    import subprocess
    import sys

    root, cfg, state, state_dict = finished_run
    run_dir = root / "t1"
    stats = tmp_path / "stats"
    stats.mkdir()
    from ieagan_tpu.eval.fid import (make_generator_fn, get_model_features,
                                     FeatureExtractor)
    extractor = FeatureExtractor(seed=0)
    gen = make_generator_fn(
        __import__("ieagan_tpu.models", fromlist=["Generator"])
        .Generator.from_config(cfg),
        state.params_G_ema, state.state_G_ema, cfg)
    feats = get_model_features(
        gen, extractor, num_gen=8,
        batch_size=cfg["n_classes"] * cfg["events_per_batch"],
        rng=jax.random.PRNGKey(9))
    np.savez_compressed(stats / "tinyfid_clean_custom_na.npz",
                        mu=feats.mean(0), sigma=np.cov(feats, rowvar=False))
    np.savez_compressed(stats / "tinyfid_clean_custom_na_kid.npz",
                        feats=feats)
    # a config overlay the script will pick up (sorted()[-1])
    sub_cfg = dict(cfg, fid_dataset_name="tinyfid", num_incep_images=8)
    (run_dir / "zz_config.json").write_text(json.dumps(sub_cfg))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, IEAGAN_FORCE_CPU="1",
               IEAGAN_STATS_DIR=str(stats),
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "fid_eval_once.py"),
         "--run-dir", str(run_dir), "--tag", "copy3",
         "--kid", "--physics-events", "2"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-1500:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert np.isfinite(res["fid"])
    assert "kid" in res and np.isfinite(res["kid"])
    phys = res["physics"]
    assert phys["n_events"] == 2
    assert os.path.exists(phys["pickle"])
    import pickle
    with open(phys["pickle"], "rb") as fp:
        s = pickle.load(fp)
    assert s["per_sensor_occupancy"].shape == (cfg["n_classes"],)


def test_refuses_existing_run_dir(finished_run):
    root, cfg, *_ = finished_run
    cfg2 = dict(cfg, resume=False)
    with pytest.raises(RuntimeError):
        initialize_directories(cfg2)


def test_fid_hook_end_to_end(tmp_path, monkeypatch):
    """The driver's FID test hook against freshly minted tiny-model stats
    (reference: train_fns.test, 209-233)."""
    import numpy as np
    from ieagan_tpu.eval import fid as fid_mod
    from ieagan_tpu.models import Generator, Discriminator
    from ieagan_tpu.train import init_train_state
    from ieagan_tpu.train.driver import run_test
    from ieagan_tpu.utils import MetricsLogger

    monkeypatch.setattr(fid_mod, "STATS_DIR", str(tmp_path / "stats"))
    cfg = tiny_config(outputroot=str(tmp_path), run_name="fidrun",
                      num_incep_images=8, fid_dataset_name="tinyfid",
                      compute_dtype="float32")
    (tmp_path / "fidrun" / "logs").mkdir(parents=True)
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))

    # mint reference stats from this very generator -> FID should be small
    from ieagan_tpu.eval.fid import (make_generator_fn, get_model_features,
                                     FeatureExtractor)
    extractor = FeatureExtractor(seed=0)
    gen = make_generator_fn(G, state.params_G_ema, state.state_G_ema, cfg)
    feats = get_model_features(gen, extractor, num_gen=8,
                               batch_size=cfg["n_classes"] * cfg["events_per_batch"],
                               rng=jax.random.PRNGKey(9))
    (tmp_path / "stats").mkdir()
    np.savez_compressed(tmp_path / "stats" / "tinyfid_clean_custom_na.npz",
                        mu=feats.mean(0), sigma=np.cov(feats, rowvar=False))

    state_dict = {"itr": 5, "best_FID": 999999.0, "save_best_num": 0}
    mlog = MetricsLogger(cfg)
    run_test(G, state, state_dict, cfg, mlog)
    assert state_dict["best_FID"] < 999999.0
    from ieagan_tpu.utils import read_jsonl
    recs = read_jsonl(tmp_path / "fidrun" / "logs" / "metric_log.jsonl")
    assert recs and "FID" in recs[-1]
    # an improved FID writes a best-tagged checkpoint with rotation
    # (reference: train_fns.py:222-231)
    weights = tmp_path / "fidrun" / "weights"
    for comp in ["G", "D", "G_ema", "state_dict"]:
        ext = ".json" if comp == "state_dict" else ".msgpack"
        assert (weights / f"{comp}_best0{ext}").exists()
    assert state_dict["save_best_num"] == 1
    sd = json.loads((weights / "state_dict_best0.json").read_text())
    assert sd["best_FID"] == pytest.approx(state_dict["best_FID"])


def test_missing_stats_skips_gracefully(tmp_path, monkeypatch, capsys):
    from ieagan_tpu.eval import fid as fid_mod
    from ieagan_tpu.models import Generator, Discriminator
    from ieagan_tpu.train import init_train_state
    from ieagan_tpu.train.driver import run_test
    from ieagan_tpu.utils import MetricsLogger
    monkeypatch.setattr(fid_mod, "STATS_DIR", str(tmp_path / "nostats"))
    cfg = tiny_config(outputroot=str(tmp_path), run_name="fidrun2",
                      compute_dtype="float32")
    (tmp_path / "fidrun2" / "logs").mkdir(parents=True)
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
    state_dict = {"itr": 1, "best_FID": 999999.0, "save_best_num": 0}
    run_test(G, state, state_dict, cfg, MetricsLogger(cfg))
    assert state_dict["best_FID"] == 999999.0  # unchanged, no crash


def test_cli_merge_precedence(tmp_path):
    """defaults < JSON config < explicit CLI flags (reference semantics:
    argparse SUPPRESS + dict.update, train.py:779-786)."""
    import json, importlib.util, sys, os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "train_cli", os.path.join(repo, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cfg_path = tmp_path / "c.json"
    cfg_path.write_text(json.dumps({"G_ch": 24, "seed": 111}))
    args = vars(mod.build_parser().parse_args(
        ["--config", str(cfg_path), "--outputroot", "x", "--run-name", "r",
         "--seed", "222"]))
    from ieagan_tpu.core.config import DEFAULT_CONFIG
    config = dict(DEFAULT_CONFIG)
    with open(args.pop("config")) as fp:
        config.update(json.load(fp))
    config.update(args)
    assert config["G_ch"] == 24          # JSON beats default (32)
    assert config["seed"] == 222          # CLI beats JSON (111)
    assert config["D_ch"] == 32           # default survives
    assert config["run_name"] == "r"


def test_cli_underscore_and_dash_flags(tmp_path):
    """Reference flags are underscore-style (reference: train.py:279
    "--num_workers"); both spellings must parse to the same key."""
    import importlib.util, os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "train_cli2", os.path.join(repo, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for flag in ("--num_epochs", "--num-epochs"):
        args = vars(mod.build_parser().parse_args([flag, "7"]))
        assert args["num_epochs"] == 7
    args = vars(mod.build_parser().parse_args(
        ["--device_transform", "true", "--fid-dataset-name", "synv2"]))
    assert args["device_transform"] is True
    assert args["fid_dataset_name"] == "synv2"


def test_negative_fid_excluded_from_best_tracking(tmp_path, monkeypatch):
    """Fréchet distance is nonnegative; a negative value (f32 eval numerics
    gone bad) must not enter best_FID or write a best checkpoint — once
    recorded, no real score could ever beat it."""
    from ieagan_tpu.models import Generator, Discriminator
    from ieagan_tpu.train import init_train_state
    from ieagan_tpu.train import driver as driver_mod
    from ieagan_tpu.utils import MetricsLogger, read_jsonl

    cfg = tiny_config(outputroot=str(tmp_path), run_name="negfid")
    (tmp_path / "negfid" / "logs").mkdir(parents=True)
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))

    from ieagan_tpu.eval import fid as fid_mod
    monkeypatch.setattr(fid_mod, "compute_fid_from_state",
                        lambda *a, **k: -54.13)
    state_dict = {"itr": 7, "best_FID": 999999.0, "save_best_num": 0}
    mlog = MetricsLogger(cfg)
    driver_mod.run_test(G, state, state_dict, cfg, mlog)

    assert state_dict["best_FID"] == 999999.0
    assert state_dict["save_best_num"] == 0
    assert not (tmp_path / "negfid" / "weights" / "G_best0.msgpack").exists()
    # the raw value is still recorded in the metric log for diagnosis
    recs = read_jsonl(tmp_path / "negfid" / "logs" / "metric_log.jsonl")
    assert recs and recs[-1]["FID"] == pytest.approx(-54.13)
