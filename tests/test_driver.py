"""End-to-end driver test: train loop + logging + checkpointing + resume
(the reference exercises this only via the --debug dummy path,
train.py:147-149; here the real step runs on synthetic data)."""

import json
import os

import jax
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


def test_checkpoint_artifacts(finished_run):
    root, cfg, state, state_dict = finished_run
    weights = root / "t1" / "weights"
    for comp in ["G", "D", "G_optim", "D_optim", "G_ema"]:
        assert (weights / f"{comp}_copy3.msgpack").exists()
    sd = json.loads((weights / "state_dict_copy3.json").read_text())
    assert sd["itr"] == 3
    assert (root / "t1" / "samples" / "fixed_samples3.jpg").exists()


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


def test_refuses_existing_run_dir(finished_run):
    root, cfg, *_ = finished_run
    cfg2 = dict(cfg, resume=False)
    with pytest.raises(RuntimeError):
        initialize_directories(cfg2)
