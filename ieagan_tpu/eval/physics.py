"""Physics-stats evaluation harness.

Reproduces the reference's detector-physics observables (reference:
Evaluation/eval_all.py:75-120, plotted by plot_for_paper.ipynb):
  * ADU pixel-intensity spectrum over variable bins
    [-1, 1, 7, 8..256] (eval_all.py:76);
  * per-event occupancy (fraction of pixels above the 7-ADU threshold)
    distribution over 200 bins in [0, 0.02] (eval_all.py:77);
  * per-sensor mean charge over above-threshold pixels (eval_all.py:92-96).

Implemented with numpy histograms (the reference uses boost-histogram —
identical bin semantics, no native dependency).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

THRESHOLD = 7  # ADU noise cut (reference: eval_all.py:34)

INTENSITY_BINS = np.array([-1.0, 1.0, 7.0] + list(np.linspace(8, 256, 249)))
OCCUPANCY_BINS = np.linspace(0.0, 0.02, 201)


def log_transform_inv(img: np.ndarray) -> np.ndarray:
    """[-1,1] model output -> ADU (reference: eval_all.py:104-106)."""
    img = 0.5 * (img + 1.0)
    return np.exp(np.log(256.0) * img) - 1.0


@dataclass
class EventStats:
    """Accumulated physics stats over a stream of event batches."""
    intensity_hist: np.ndarray = field(
        default_factory=lambda: np.zeros(len(INTENSITY_BINS) - 1, np.int64))
    occupancy_hist: np.ndarray = field(
        default_factory=lambda: np.zeros(len(OCCUPANCY_BINS) - 1, np.int64))
    mean_charges: list = field(default_factory=list)
    occupancies: list = field(default_factory=list)
    n_events: int = 0

    def update(self, imgs: np.ndarray):
        """imgs: (n_sensors, H, W) ADU images of one event batch, noise cut
        applied (pixels below threshold set to 0)."""
        mask = imgs > 0
        self.intensity_hist += np.histogram(imgs.ravel(), INTENSITY_BINS)[0]
        occ_per_img = mask.mean(axis=(1, 2))
        self.occupancy_hist += np.histogram(occ_per_img, OCCUPANCY_BINS)[0]
        # per-event per-sensor mean charge = sum/count over above-threshold
        # pixels (reference: eval_all.py:92-96). A sensor with zero such
        # pixels yields NaN for this event and is EXCLUDED from the summary
        # average via nanmean — the reference propagates the NaN outright,
        # and clamping the denominator (old behavior) silently biased such
        # sensors toward 0.
        count = mask.sum(axis=(1, 2)).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            self.mean_charges.append(
                np.where(mask, imgs, 0).sum(axis=(1, 2))
                / np.where(count > 0, count, np.nan))
        self.occupancies.append(occ_per_img)
        self.n_events += 1

    def summary(self) -> dict:
        return {
            "intensity_hist": self.intensity_hist,
            "intensity_bins": INTENSITY_BINS,
            "occupancy_hist": self.occupancy_hist,
            "occupancy_bins": OCCUPANCY_BINS,
            # nanmean: events where a sensor had zero above-threshold pixels
            # don't contribute to that sensor's mean (see update())
            "per_sensor_mean_charge": np.nanmean(self.mean_charges, axis=0),
            "per_sensor_occupancy": np.mean(self.occupancies, axis=0),
            "n_events": self.n_events,
        }


def get_stats(event_stream, n_events: int = 100) -> dict:
    """Accumulate stats over an iterable of (imgs, labels) ADU event batches
    (reference: eval_all.py:75-101)."""
    acc = EventStats()
    for i, (imgs, _labels) in zip(range(n_events), event_stream):
        acc.update(np.asarray(imgs))
    return acc.summary()


def generate_event_stream(G, params, state, config, seed: int = 0,
                          events_per_call: int = 8):
    """Infinite generator of noise-cut ADU events from a trained G
    (reference: eval_all.py:109-120).

    events_per_call > 1 scans that many events inside ONE jitted dispatch
    (network-attached chips pay ~0.1s per dispatch; at the reference's
    10k-event scale one-event-per-call would spend more time in the tunnel
    than on the MXU). The noise cut and crop also run on device — only
    thresholded ADU crosses the wire."""
    es = int(config["n_classes"])
    dim_z = int(config["dim_z"])
    epc = max(1, int(events_per_call))

    @jax.jit
    def gen_block(key):
        def one(carry, k):
            kz, kr = jax.random.split(k)
            z = jax.random.normal(kz, (es, dim_z))
            y = jnp.arange(es, dtype=jnp.int32)
            imgs = G.apply({"params": params, **state}, z, y, train=False,
                           rngs={"rdof": kr}).astype(jnp.float32)
            adu = jnp.exp(jnp.log(256.0) * 0.5 * (imgs[..., 0] + 1.0)) - 1.0
            adu = jnp.where(adu < THRESHOLD, 0.0, adu)
            return carry, adu[:, 3:-3, :]
        _, blocks = jax.lax.scan(one, 0, jax.random.split(key, epc))
        return blocks  # (epc, es, H-6, W)

    key = jax.random.PRNGKey(seed)
    labels = np.arange(es)
    while True:
        key, sub = jax.random.split(key)
        block = np.asarray(gen_block(sub))
        for ev in block:
            yield ev, labels


def _sorted_histogram(values: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """np.histogram-exact fixed-bin histogram without scatter: sort the
    values once, then each bin count is a difference of binary-search
    insertion points. Bin i counts [e_i, e_{i+1}); the last bin includes
    its right edge (numpy semantics)."""
    s = jnp.sort(values)
    left = jnp.searchsorted(s, edges, side="left")
    hist = left[1:] - left[:-1]
    # last bin: right-edge inclusive
    last = jnp.searchsorted(s, edges[-1], side="right") - left[-2]
    return hist.at[-1].set(last).astype(jnp.int32)


def generate_stats(G, params, state, config, n_events: int, seed: int = 0,
                   events_per_call: int = 8) -> dict:
    """EventStats computed with the reductions ON DEVICE (reference
    protocol: Evaluation/eval_all.py:75-120 at 10k events).

    `get_stats(generate_event_stream(...))` materializes every ADU event on
    host — at flagship scale that is ~245 MB per 8-event dispatch, and over
    a network-attached chip the 10k-event protocol becomes tunnel-bound
    (hours of socket wait for ~3 minutes of MXU time). Here the intensity
    histogram, above-threshold pixel counts, and charge sums are computed
    inside the same jitted scan that generates the events, so only
    ~KB-sized per-event reductions cross the wire.

    Numerics match the host path exactly for the histograms (identical f32
    ADU values, integer-exact bin edges; occupancies are derived from the
    integer counts on host in f64) and to f32-accumulation rounding for the
    charge sums. Seed/key scheduling mirrors generate_event_stream, so the
    same seed evaluates the same events (tests/test_eval.py parity test).
    """
    es = int(config["n_classes"])
    dim_z = int(config["dim_z"])
    epc = max(1, int(events_per_call))
    ibins = jnp.asarray(INTENSITY_BINS, jnp.float32)

    @jax.jit
    def stats_block(key):
        def one(carry, k):
            kz, kr = jax.random.split(k)
            z = jax.random.normal(kz, (es, dim_z))
            y = jnp.arange(es, dtype=jnp.int32)
            imgs = G.apply({"params": params, **state}, z, y, train=False,
                           rngs={"rdof": kr}).astype(jnp.float32)
            adu = jnp.exp(jnp.log(256.0) * 0.5 * (imgs[..., 0] + 1.0)) - 1.0
            adu = jnp.where(adu < THRESHOLD, 0.0, adu)
            adu = adu[:, 3:-3, :]
            mask = adu > 0
            # per-event histogram (not carry-accumulated): the tail block
            # of a non-multiple n_events must be trimmable on host.
            # sort+searchsorted, NOT jnp.histogram: its bincount lowers to
            # a scatter-add, which XLA:TPU serializes (seconds per 7.7M-px
            # event); a bitonic sort + 252 binary searches stays on the VPU
            hist = _sorted_histogram(adu.ravel(), ibins)
            cnt = mask.sum(axis=(1, 2)).astype(jnp.int32)   # (es,)
            csum = adu.sum(axis=(1, 2))                      # (es,) f32
            return carry, (hist, cnt, csum)
        _, out = jax.lax.scan(one, 0, jax.random.split(key, epc))
        return out  # hist (epc, nbins), cnt (epc, es), csum (epc, es)

    import sys
    import time
    n_pix = None
    intensity_hist = np.zeros(len(INTENSITY_BINS) - 1, np.int64)
    cnts, csums = [], []
    key = jax.random.PRNGKey(seed)
    done = 0
    t0 = time.time()
    while done < n_events:
        key, sub = jax.random.split(key)
        hist, cnt, csum = jax.device_get(stats_block(sub))
        take = min(epc, n_events - done)
        if done and done % (50 * epc) < epc:
            print(f"[generate_stats] {done}/{n_events} events "
                  f"({done / (time.time() - t0):.1f} ev/s)",
                  file=sys.stderr, flush=True)
        intensity_hist += hist[:take].astype(np.int64).sum(axis=0)
        cnts.append(cnt[:take])
        csums.append(csum[:take])
        done += take
        if n_pix is None:
            h = int(config["resolution"]) - 6
            w = int(config["resolution"]) * int(config["H_base"])
            n_pix = h * w
    cnt = np.concatenate(cnts).astype(np.float64)    # (n_events, es)
    csum = np.concatenate(csums).astype(np.float64)  # (n_events, es)
    occ = cnt / n_pix  # f64 from exact integer counts == host mask.mean
    occupancy_hist = np.histogram(occ.ravel(), OCCUPANCY_BINS)[0]
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_charges = csum / np.where(cnt > 0, cnt, np.nan)
    return {
        "intensity_hist": intensity_hist,
        "intensity_bins": INTENSITY_BINS,
        "occupancy_hist": occupancy_hist,
        "occupancy_bins": OCCUPANCY_BINS,
        "per_sensor_mean_charge": np.nanmean(mean_charges, axis=0),
        "per_sensor_occupancy": np.mean(occ, axis=0),
        "n_events": int(done),
    }


def real_event_stream(dataroot: str, seed: int = 0):
    """ADU event stream from a real dataset directory (the tf.data analog of
    Evaluation/dataset.py)."""
    from ieagan_tpu.data import ImageEventsDataset
    ds = ImageEventsDataset(dataroot, noise_scale=0.0)
    labels = np.arange(ds.n_sensors)
    order = np.random.default_rng(seed).permutation(len(ds))
    for idx in order:
        imgs, _ = ds[idx]  # (es, H, W, 1) in [-1, 1] (lognormed)
        adu = log_transform_inv(imgs[..., 0])
        adu[adu < THRESHOLD] = 0.0
        adu = adu[:, 3:-3, :]
        yield adu, labels


def compare_models(models: dict, config: dict, n_events: int = 100,
                   real_dataroot: str | None = None, seed: int = 0) -> dict:
    """Ablation-style comparison harness (reference: eval_all.py:123-144):
    stats per model (and optionally for the real dataset)."""
    all_stats = {}
    if real_dataroot:
        all_stats["real"] = get_stats(real_event_stream(real_dataroot, seed),
                                      n_events)
    for name, (G, params, state) in models.items():
        stream = generate_event_stream(G, params, state, config, seed)
        all_stats[name] = get_stats(stream, n_events)
    return all_stats
