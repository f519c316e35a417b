"""Mass production into basf2: sparse digits + producer/consumer pipeline.

Reference (Physics_Analysis/create_g1.py): N torch producer processes each
run generate() and push sparse digits into an mp.Queue; a basf2 ``Module``
pops one event per event() call and appends PXDDigits (create_g1.py:62-122,
167-195).

TPU-native redesign: one device generates large batched event blocks (the
accelerator is the producer — process-parallelism buys nothing on a single
chip); host threads do the sparse extraction through the native C++ kernel
(native/sparse_digits.cpp, ctypes with the GIL released) and feed a bounded
queue. The consumer side keeps the reference's contract: ``get()`` returns
one event's (coords, charges) with coords rows (sensor, row, col).

basf2 integration: ``DigitCreator`` mirrors the reference's basf2.Module
(create_g1.py:97-112) when basf2 is importable; otherwise ``NpzWriter``
persists events for offline injection.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB = None
_LIB_TRIED = False


def _load_native():
    """Load (building if needed) the C++ sparse-digit library."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(_NATIVE_DIR, "libsparse_digits.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.extract_digits.restype = ctypes.c_int64
        lib.extract_digits.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def extract_sparse_digits(imgs: np.ndarray, threshold: float = 0.0):
    """(n, h, w) float ADU images -> (coords (m,3) int32, charges (m,) uint8).

    coords rows are (image_index, row, col); charge is the uint8-truncated
    ADU value (reference: create_g1.py:74-78).
    """
    imgs = np.ascontiguousarray(imgs, np.float32)
    n, h, w = imgs.shape
    lib = _load_native()
    if lib is not None:
        cap = int((imgs > threshold).sum())
        coords = np.empty((max(cap, 1), 3), np.int32)
        charges = np.empty(max(cap, 1), np.uint8)
        m = lib.extract_digits(
            imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, h, w,
            ctypes.c_float(threshold),
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            charges.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        return coords[:m], charges[:m]
    # numpy fallback
    mask = imgs > threshold
    coords = np.argwhere(mask).astype(np.int32)
    charges = np.clip(imgs[mask], 0, 255).astype(np.uint8)
    return coords, charges


class EventProducer:
    """Generate events on the accelerator and queue sparse digits.

    ``model``: a deploy.Model (or anything with the same generate contract).
    One background thread drives the device with batched generation; worker
    threads sparse-extract. ``get()`` pops one event's digits.
    """

    def __init__(self, model, num_events: int | None = None,
                 events_per_call: int = 4, max_queue: int = 64, seed: int = 0,
                 chunks: int = 4):
        from ieagan_tpu.deploy.inference import generate_block
        self._generate = lambda key: generate_block(model, events_per_call,
                                                    chunks, key)
        self.event_size = model.event_size
        self.events_per_call = events_per_call * chunks
        self.num_events = num_events
        self.seed = seed
        self.queue: queue.Queue = queue.Queue(maxsize=max_queue)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def _produce(self):
        import jax
        key = jax.random.PRNGKey(self.seed)
        produced = 0
        es = self.event_size
        while not self._stop.is_set():
            if self.num_events is not None and produced >= self.num_events:
                break
            key, sub = jax.random.split(key)
            block = np.asarray(self._generate(sub))  # (epc*es, 250, W)
            for e in range(self.events_per_call):
                imgs = block[e * es:(e + 1) * es]
                digits = extract_sparse_digits(imgs)
                self.queue.put(digits)
                produced += 1
                if self.num_events is not None and produced >= self.num_events:
                    break
        self.queue.put(None)  # sentinel

    def get(self, timeout: float | None = None):
        return self.queue.get(timeout=timeout)

    def stop(self):
        self._stop.set()

    def __iter__(self):
        while True:
            item = self.get()
            if item is None:
                return
            yield item


class NpzWriter:
    """Offline sink: persist produced events as compressed npz shards
    (consumed later by a basf2 injection job)."""

    def __init__(self, out_dir: str, events_per_shard: int = 100):
        self.out_dir = out_dir
        self.events_per_shard = events_per_shard
        os.makedirs(out_dir, exist_ok=True)
        self._buf: list = []
        self._shard = 0

    def write(self, digits):
        self._buf.append(digits)
        if len(self._buf) >= self.events_per_shard:
            self.flush()

    def flush(self):
        if not self._buf:
            return
        arrays = {}
        for i, (coords, charges) in enumerate(self._buf):
            arrays[f"coords_{i}"] = coords
            arrays[f"charges_{i}"] = charges
        path = os.path.join(self.out_dir, f"events_{self._shard:05d}.npz")
        np.savez_compressed(path, n_events=len(self._buf), **arrays)
        self._buf = []
        self._shard += 1


def make_digit_creator(producer: EventProducer):
    """basf2 Module that appends one queued event's PXDDigits per event()
    call (reference: create_g1.py:97-112). Returns None when basf2 is not
    importable (non-basf2 environments use NpzWriter instead)."""
    try:
        import basf2
        from ROOT import Belle2  # noqa: F401
    except ImportError:
        return None

    class DigitCreator(basf2.Module):
        def initialize(self):
            from ROOT import Belle2
            self.digits = Belle2.PyStoreArray("PXDDigits")
            self.digits.registerInDataStore()
            self.vxd_ids = [  # 40 PXD sensors, layer.ladder.sensor
                Belle2.VxdID(1, ladder, sensor)
                for ladder in range(1, 9) for sensor in (1, 2)
            ] + [
                Belle2.VxdID(2, ladder, sensor)
                for ladder in range(1, 13) for sensor in (1, 2)
            ]

        def event(self):
            from ROOT import Belle2
            item = producer.get()
            if item is None:
                return
            coords, charges = item
            for (sensor, row, col), charge in zip(coords, charges):
                digit = self.digits.appendNew()
                digit.__assign__(Belle2.PXDDigit(
                    self.vxd_ids[int(sensor)], int(col), int(row),
                    int(charge)))

    return DigitCreator()


def produce_events(model, num_events: int, out_dir: str | None = None,
                   events_per_call: int = 4, seed: int = 0):
    """Produce num_events events; feed basf2 when available, else write npz
    shards (reference: create_g1.py run(), 124-195)."""
    producer = EventProducer(model, num_events=num_events,
                             events_per_call=events_per_call, seed=seed).start()
    creator = make_digit_creator(producer)
    if creator is not None:  # pragma: no cover - needs basf2
        import basf2
        path = basf2.Path()
        path.add_module("EventInfoSetter", evtNumList=[num_events])
        path.add_module(creator)
        if out_dir:
            path.add_module("RootOutput", outputFileName=os.path.join(
                out_dir, "pxd_digits.root"))
        basf2.process(path)
        return num_events
    writer = NpzWriter(out_dir or "produced_events")
    n = 0
    for digits in producer:
        writer.write(digits)
        n += 1
    writer.flush()
    return n
