"""Deployment layer tests: native sparse extraction, producer pipeline,
npz sink (basf2 itself is absent here; its Module path is import-gated)."""

import numpy as np
import pytest

from ieagan_tpu.deploy import producer as prod


class TestSparseDigits:
    def test_native_lib_builds(self):
        lib = prod._load_native()
        assert lib is not None, "C++ sparse digit library failed to build"

    def test_matches_numpy_reference(self):
        rng = np.random.RandomState(0)
        imgs = rng.rand(3, 25, 77).astype(np.float32) * 80.0
        imgs[imgs < 40] = 0.0
        coords, charges = prod.extract_sparse_digits(imgs)
        mask = imgs > 0
        want_coords = np.argwhere(mask)
        want_charges = imgs[mask].astype(np.uint8)
        np.testing.assert_array_equal(coords, want_coords)
        np.testing.assert_array_equal(charges, want_charges)

    def test_threshold_and_saturation(self):
        imgs = np.array([[[0.0, 7.5, 300.0, 254.6]]], np.float32)
        coords, charges = prod.extract_sparse_digits(imgs, threshold=7.0)
        np.testing.assert_array_equal(coords[:, 2], [1, 2, 3])
        np.testing.assert_array_equal(charges, [7, 255, 254])

    def test_empty(self):
        coords, charges = prod.extract_sparse_digits(
            np.zeros((2, 4, 4), np.float32))
        assert coords.shape == (0, 3) and charges.shape == (0,)


class TestProducer:
    def test_producer_round_trip(self):
        from ieagan_tpu.deploy import Model
        m = Model(config=dict(resolution=32, n_classes=4, H_base=1, G_ch=4,
                              G_depth=1, G_attn="0",
                              use_pallas_attention=False))
        p = prod.EventProducer(m, num_events=3, events_per_call=1,
                               seed=0).start()
        events = list(p)
        assert len(events) == 3
        for coords, charges in events:
            assert coords.ndim == 2 and coords.shape[1] == 3
            assert charges.dtype == np.uint8
            if len(coords):
                assert coords[:, 0].max() < 4  # sensor index in range
                assert coords[:, 1].max() < 26  # 32-6 rows

    def test_npz_writer(self, tmp_path):
        w = prod.NpzWriter(str(tmp_path), events_per_shard=2)
        for i in range(3):
            w.write((np.ones((5, 3), np.int32) * i, np.ones(5, np.uint8)))
        w.flush()
        shards = sorted(tmp_path.glob("events_*.npz"))
        assert len(shards) == 2
        first = np.load(shards[0])
        assert first["n_events"] == 2
        np.testing.assert_array_equal(first["coords_1"],
                                      np.ones((5, 3), np.int32))


def _install_fake_basf2(monkeypatch):
    """Minimal basf2/ROOT.Belle2 stand-ins so the DigitCreator path runs in
    CI (contract of Physics_Analysis/create_g1.py:97-122: one queued event
    per event() call, one appendNew per above-threshold pixel)."""
    import sys
    import types

    class FakeVxdID:
        def __init__(self, layer, ladder, sensor):
            self.id = (layer, ladder, sensor)

    class FakePXDDigit:
        def __init__(self, vxd_id, col, row, charge):
            self.vxd_id, self.col, self.row, self.charge = (
                vxd_id, col, row, charge)

    class FakeSlot:
        def __assign__(self, digit):
            self.digit = digit

    class FakePyStoreArray:
        instances = []

        def __init__(self, name):
            self.name = name
            self.slots = []
            FakePyStoreArray.instances.append(self)

        def registerInDataStore(self):
            self.registered = True

        def appendNew(self):
            slot = FakeSlot()
            self.slots.append(slot)
            return slot

    belle2 = types.SimpleNamespace(
        VxdID=FakeVxdID, PXDDigit=FakePXDDigit, PyStoreArray=FakePyStoreArray)
    root_mod = types.ModuleType("ROOT")
    root_mod.Belle2 = belle2

    class FakeModule:
        pass

    class FakePath:
        def __init__(self):
            self.modules = []

        def add_module(self, mod, **kwargs):
            self.modules.append((mod, kwargs))

    def fake_process(path):
        n = next(kw["evtNumList"][0] for mod, kw in path.modules
                 if mod == "EventInfoSetter")
        creator = next(mod for mod, _ in path.modules
                       if not isinstance(mod, str))
        creator.initialize()
        for _ in range(n):
            creator.event()

    basf2_mod = types.ModuleType("basf2")
    basf2_mod.Module = FakeModule
    basf2_mod.Path = FakePath
    basf2_mod.process = fake_process
    monkeypatch.setitem(sys.modules, "basf2", basf2_mod)
    monkeypatch.setitem(sys.modules, "ROOT", root_mod)
    return FakePyStoreArray


class TestBasf2Contract:
    CFG = dict(resolution=32, n_classes=4, H_base=1, G_ch=4, G_depth=1,
               G_attn="0", use_pallas_attention=False)

    def test_digit_creator_appends_queue_digits(self, monkeypatch):
        """produce_events drives the (mocked) basf2 event loop and every
        appended PXDDigit matches the producer queue's sparse digits for
        the same model+seed."""
        from ieagan_tpu.deploy import Model
        store_cls = _install_fake_basf2(monkeypatch)
        store_cls.instances.clear()
        m = Model(config=self.CFG)
        # expected digits: an identical producer (same model, same seed)
        expected = list(prod.EventProducer(
            m, num_events=2, events_per_call=1, seed=5).start())

        n = prod.produce_events(m, 2, out_dir=None, events_per_call=1,
                                seed=5)
        assert n == 2
        (store,) = store_cls.instances
        assert store.name == "PXDDigits" and store.registered
        want = [(int(s), int(r), int(c), int(ch))
                for coords, charges in expected
                for (s, r, c), ch in zip(coords, charges)]
        got = [(slot.digit.vxd_id, slot.digit.row, slot.digit.col,
                slot.digit.charge) for slot in store.slots]
        assert len(got) == len(want)
        # vxd_id is the per-sensor VxdID object; map back via the creator's
        # 40-entry table ordering (layer-major, = sensor index order)
        for (s, r, c, ch), (vxd, row, col, charge) in zip(want, got):
            assert (row, col, charge) == (r, c, ch)
            assert isinstance(vxd.id, tuple)

    def test_vxd_id_table_covers_40_sensors(self, monkeypatch):
        """The DigitCreator's VxdID table enumerates the 40 physical PXD
        sensors (layer 1: 8 ladders x 2, layer 2: 12 ladders x 2)."""
        from ieagan_tpu.deploy import Model
        _install_fake_basf2(monkeypatch)
        m = Model(config=self.CFG)
        producer = prod.EventProducer(m, num_events=1, events_per_call=1,
                                      seed=0).start()
        creator = prod.make_digit_creator(producer)
        assert creator is not None
        creator.initialize()
        ids = [v.id for v in creator.vxd_ids]
        assert len(ids) == 40 and len(set(ids)) == 40
        assert sum(1 for l, *_ in ids if l == 1) == 16
        assert sum(1 for l, *_ in ids if l == 2) == 24
        producer.stop()


def test_model_restore_from_checkpoint_dir(tmp_path):
    """Model.restore picks the EMA generator from a driver checkpoint dir."""
    import jax
    from flax import serialization
    from ieagan_tpu.deploy import Model
    cfg = dict(resolution=32, n_classes=4, H_base=1, G_ch=4, G_depth=1,
               G_attn="0", use_pallas_attention=False)
    src = Model(config=cfg, seed=1)
    # write it as the driver would (G_ema component, copy tag)
    tree = {"params": src.params, "state": src.state}
    (tmp_path / "G_ema_copy7.msgpack").write_bytes(serialization.to_bytes(
        jax.tree_util.tree_map(lambda x: np.asarray(x), tree)))
    (tmp_path / "state_dict_copy7.json").write_text('{"itr": 7}')
    restored = Model.restore(str(tmp_path), config=cfg)
    for a, b in zip(jax.tree_util.tree_leaves(src.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_all_load_model_from_driver_checkpoint(tmp_path):
    """scripts/eval_all.load_model restores a driver-tagged checkpoint."""
    import importlib.util, sys, os, jax
    import jax.numpy as jnp
    from ieagan_tpu.models import Generator, Discriminator
    from ieagan_tpu.train import init_train_state
    from ieagan_tpu.utils import save_checkpoint
    from tests.helpers import tiny_config
    cfg = tiny_config(compute_dtype="float32")
    G = Generator.from_config(cfg)
    D = Discriminator.from_config(cfg)
    state = init_train_state(G, D, cfg, jax.random.PRNGKey(0))
    save_checkpoint(tmp_path, state, {"itr": 9}, "copy9")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "eval_all_script", os.path.join(repo, "scripts", "eval_all.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    model_cfg = {k: cfg[k] for k in
                 ("resolution", "n_classes", "H_base", "G_ch", "G_depth",
                  "G_attn", "use_pallas_attention")}
    model = mod.load_model("IEAGAN", str(tmp_path), config=model_cfg)
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(state.params_G_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
