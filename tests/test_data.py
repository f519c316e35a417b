"""Data pipeline tests against a real on-disk PNG event tree
(reference layout: utils/dataloader.py:14-53, README.md:14-27)."""

import numpy as np


def test_device_transform_matches_host_chain():
    """device_event_transform (uint8 on-device path, noise off) must equal
    the host transform chain exactly."""
    import jax
    from ieagan_tpu.data.dataset import event_transform_stack
    from ieagan_tpu.ops.image_norm import device_event_transform
    raw = (np.random.RandomState(0).rand(5, 58, 64) * 255).astype(np.uint8)
    host = event_transform_stack(raw, None, 0.0)
    dev = np.asarray(device_event_transform(raw, jax.random.PRNGKey(0), 0.0))
    np.testing.assert_allclose(dev, host, atol=2e-6)


def test_raw_uint8_dataset_mode(tmp_path):
    from PIL import Image
    from ieagan_tpu.data.dataset import ImageEventsDataset
    for sub in ("1.1.1", "1.1.2"):
        (tmp_path / sub).mkdir()
        for e in range(3):
            Image.fromarray((np.random.RandomState(e).rand(58, 64) * 255)
                            .astype(np.uint8), mode="L").save(
                tmp_path / sub / f"event_{e}.png")
    ds = ImageEventsDataset(str(tmp_path), raw_uint8=True)
    imgs, labels = ds[0]
    assert imgs.dtype == np.uint8 and imgs.shape == (2, 58, 64)
    assert labels.tolist() == [0, 1]
import pytest

from ieagan_tpu.data import ImageEventsDataset, EventLoader, load_dataset


@pytest.fixture(scope="module")
def png_tree(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("pxd")
    rng = np.random.RandomState(0)
    sensors = ["1.1.1", "1.1.2", "1.2.1", "1.2.2"]
    n_events = 6
    for s in sensors:
        (root / s).mkdir()
        for e in range(n_events):
            img = (rng.rand(250, 96) * 50).astype(np.uint8)
            Image.fromarray(img, mode="L").save(root / s / f"event_{e:03d}.png")
    return root, sensors, n_events


class TestDataset:
    def test_layout_discovery(self, png_tree):
        root, sensors, n_events = png_tree
        ds = ImageEventsDataset(str(root))
        assert len(ds) == n_events
        assert ds.n_sensors == len(sensors)
        assert ds.subdirs == sorted(sensors)

    def test_item_contract(self, png_tree):
        root, sensors, n_events = png_tree
        ds = ImageEventsDataset(str(root), seed=0)
        imgs, labels = ds[0]
        # padded 250 -> 256 rows, single channel, [-1, 1]
        assert imgs.shape == (len(sensors), 256, 96, 1)
        assert imgs.dtype == np.float32
        np.testing.assert_array_equal(labels, np.arange(len(sensors)))
        assert imgs.min() >= -1.0 and imgs.max() <= 1.0 + 4e-3
        # padding rows map to the normalized zero level + noise (~ -1)
        assert float(imgs[:, :3].max()) < -0.97

    def test_transform_round_trip(self, png_tree):
        from ieagan_tpu.eval.physics import log_transform_inv
        root, *_ = png_tree
        ds = ImageEventsDataset(str(root), noise_scale=0.0)
        imgs, _ = ds[1]
        from PIL import Image
        raw = np.asarray(Image.open(
            root / ds.subdirs[0] / ds.filenames[1]).convert("L"), np.float32)
        adu = log_transform_inv(imgs[0, 3:-3, :, 0])
        np.testing.assert_allclose(adu, raw, atol=0.02)

    def test_noise_determinism_per_seed(self, png_tree):
        root, *_ = png_tree
        a = ImageEventsDataset(str(root), seed=7)[0][0]
        b = ImageEventsDataset(str(root), seed=7)[0][0]
        c = ImageEventsDataset(str(root), seed=8)[0][0]
        np.testing.assert_array_equal(a, b)
        assert (a != c).any()


class TestLoader:
    def test_loader_batches(self, png_tree):
        root, sensors, n_events = png_tree
        loader = load_dataset(str(root), num_workers=2, shuffle=True, seed=0,
                              events_per_batch=2)
        batches = list(loader)
        assert len(batches) == n_events // 2 == len(loader)
        imgs, labels = batches[0]
        assert imgs.shape == (2 * len(sensors), 256, 96, 1)
        np.testing.assert_array_equal(labels,
                                      np.tile(np.arange(len(sensors)), 2))

    def test_shuffle_changes_epoch_order(self, png_tree):
        root, *_ = png_tree
        ds = ImageEventsDataset(str(root), noise_scale=0.0)
        loader = EventLoader(ds, num_workers=1, shuffle=True, seed=3,
                             events_per_batch=1)
        e1 = [imgs.sum() for imgs, _ in loader]
        e2 = [imgs.sum() for imgs, _ in loader]
        assert sorted(np.round(e1, 3).tolist()) == sorted(np.round(e2, 3).tolist())
        assert e1 != e2  # different epoch order

    def test_set_epoch_resumes_shuffle_sequence(self, png_tree):
        """A resumed loader seeded with set_epoch(E) deals exactly the
        epoch-E order (not epoch 0's): each event of the interrupted epoch
        is still seen exactly once across the original + resumed halves."""
        root, *_ = png_tree
        ds = ImageEventsDataset(str(root), noise_scale=0.0)
        fresh = EventLoader(ds, num_workers=1, shuffle=True, seed=3,
                            events_per_batch=1)
        epoch0 = fresh._order().tolist()
        fresh._epoch = 1
        epoch1 = fresh._order().tolist()
        resumed = EventLoader(ds, num_workers=1, shuffle=True, seed=3,
                              events_per_batch=1)
        resumed.set_epoch(1)
        assert resumed._order().tolist() == epoch1
        assert epoch1 != epoch0
        assert sorted(epoch1) == sorted(epoch0)

    def test_loader_prefetch_does_not_hang_on_break(self, png_tree):
        root, *_ = png_tree
        ds = ImageEventsDataset(str(root))
        loader = EventLoader(ds, num_workers=2, events_per_batch=1, prefetch=1)
        for i, _ in enumerate(loader):
            if i == 1:
                break  # generator close must not deadlock the producer


class TestProcessSharding:
    def test_disjoint_complete_coverage(self, png_tree):
        """Two simulated processes split the global shuffle disjointly and
        completely (multi-host data sharding, SURVEY §2.2)."""
        root, *_ = png_tree
        covered = []
        for pid in (0, 1):
            ds = ImageEventsDataset(str(root), seed=3)
            loader = EventLoader(ds, num_workers=2, shuffle=True, seed=3,
                                 events_per_batch=2, process_index=pid,
                                 process_count=2)
            order = loader._order()
            assert len(loader) == len(ds) // 2 // 1  # epb_local = 1
            covered.append(set(order.tolist()))
        assert covered[0] & covered[1] == set()
        assert covered[0] | covered[1] == set(range(len(ds)))

    def test_local_batch_rows(self, png_tree):
        root, *_ = png_tree
        ds = ImageEventsDataset(str(root), seed=0)
        loader = EventLoader(ds, num_workers=2, shuffle=False,
                             events_per_batch=2, process_index=1,
                             process_count=2)
        imgs, labels = next(iter(loader))
        # each process decodes epb_local=1 event -> n_sensors rows
        assert imgs.shape[0] == ds.n_sensors
        assert labels.shape[0] == ds.n_sensors

    def test_rejects_indivisible_epb(self, png_tree):
        root, *_ = png_tree
        ds = ImageEventsDataset(str(root), seed=0)
        with pytest.raises(ValueError):
            EventLoader(ds, events_per_batch=3, process_index=0,
                        process_count=2)


def test_make_synthetic_dataset_script(tmp_path):
    """The synthetic-dataset minting script produces a loadable event tree."""
    import subprocess, sys, os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "syn"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "make_synthetic_dataset.py"),
         str(out), "--events", "3", "--sensors", "4", "--height", "26",
         "--width", "32", "--seed", "0"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ds = ImageEventsDataset(str(out))
    assert len(ds) == 3 and ds.n_sensors == 4
    imgs, labels = ds[0]
    assert imgs.shape == (4, 32, 32, 1)  # 26 + 3+3 padding
    # the 7-ADU cut leaves a genuinely sparse image
    raw_occ = float((imgs > -0.9).mean())
    assert 0.0 < raw_occ < 0.5
