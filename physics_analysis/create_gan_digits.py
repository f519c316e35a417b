#!/usr/bin/env python3
"""GAN -> PXDDigits production driver (reference analog:
Physics_Analysis/create_g1.py).

Generates events on the TPU with the deployed generator, sparse-extracts
digits through the native C++ kernel, and either feeds them into a basf2
RootOutput event loop (when basf2 is importable) or writes npz shards.

Checkpoints are resolved the way the training driver writes them — tagged
component files (``G_ema_copy<N>.msgpack`` / ``G_ema_best<N>.msgpack``,
utils/checkpoint.py) — via ``Model.restore``; pass ``--tag best0`` to pin
a specific tag, or point ``--checkpoint`` at a single ``G*.msgpack`` file.

Usage:
  python physics_analysis/create_gan_digits.py <output> <num_events> \
      [--checkpoint <weights_dir_or_msgpack>] [--tag best0] \
      [--config cfg.json] [--events-per-call 4] [--seed 0]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output", type=str)
    ap.add_argument("num_events", type=int)
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="weights dir (driver layout) or a G*.msgpack file")
    ap.add_argument("--tag", type=str, default=None,
                    help="checkpoint tag (e.g. copy12000, best0); default: "
                         "newest copy tag in the weights dir")
    ap.add_argument("--config", type=str, default=None,
                    help="JSON file of model-config overrides (a driver "
                         "run's dumped config works)")
    ap.add_argument("--events-per-call", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    config = None
    if args.config:
        with open(args.config) as fp:
            config = json.load(fp)

    from ieagan_tpu.deploy import (Model, produce_events,
                                   resolve_generator_checkpoint)
    if args.checkpoint:
        resolved = resolve_generator_checkpoint(args.checkpoint, tag=args.tag)
        # integrity note on the file actually loaded, mirroring the
        # reference's checkpoint sha256 print (create_g1.py:173-178)
        with open(resolved, "rb") as fp:
            digest = hashlib.sha256(fp.read()).hexdigest()
        print(f"checkpoint {os.path.basename(resolved)} sha256: {digest}")
        model = Model.restore(resolved, config=config)
    else:
        model = Model(config=config)

    n = produce_events(model, args.num_events, out_dir=args.output,
                       events_per_call=args.events_per_call, seed=args.seed)
    print(f"produced {n} events -> {args.output}")


if __name__ == "__main__":
    main()
