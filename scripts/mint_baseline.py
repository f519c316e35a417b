"""Mint the PyTorch-CPU reference throughput baseline.

The reference repo publishes no numbers (BASELINE.md); this script runs the
*reference implementation itself* (imported from /root/reference, never
copied) on CPU to measure events/sec for the flagship generate() path, and
records it in baseline_local.json for bench.py's vs_baseline column.
"""

from __future__ import annotations

import json
import os
import sys
import time

REFERENCE = os.environ.get("IEAGAN_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "baseline_local.json")


def main(n_events: int = 5):
    sys.path.insert(0, REFERENCE)
    import torch
    import json as _json
    with open(os.path.join(REFERENCE, "config.json")) as fp:
        config = _json.load(fp)
    config["device"] = "cpu"
    config["skip_init"] = True  # random weights; timing only
    import model as ref_model  # the reference's model.py
    torch.manual_seed(0)
    m = ref_model.Model(config)
    m.eval()
    # warmup
    ref_model.generate(m)
    t0 = time.time()
    for _ in range(n_events):
        imgs = ref_model.generate(m)
    dt = time.time() - t0
    assert tuple(imgs.shape) == (40, 250, 768), imgs.shape
    events_per_sec = n_events / dt
    record = {
        "metric": "generate_events_per_sec",
        "value": events_per_sec,
        "unit": "events/s",
        "hardware": "pytorch-cpu (reference implementation, random init)",
        "n_events": n_events,
        "seconds": dt,
    }
    with open(OUT, "w") as fp:
        json.dump(record, fp, indent=2)
    print(json.dumps(record))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
