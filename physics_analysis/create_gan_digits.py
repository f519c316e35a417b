#!/usr/bin/env python3
"""GAN -> PXDDigits production driver (reference analog:
Physics_Analysis/create_g1.py).

Generates events on the TPU with the deployed generator, sparse-extracts
digits through the native C++ kernel, and either feeds them into a basf2
RootOutput event loop (when basf2 is importable) or writes npz shards.

Usage:
  python physics_analysis/create_gan_digits.py <output> <num_events> \
      [--checkpoint <weights_dir>] [--events-per-call 4] [--seed 0]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output", type=str)
    ap.add_argument("num_events", type=int)
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="weights dir with a G_ema/G checkpoint")
    ap.add_argument("--events-per-call", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.checkpoint:
        # integrity note, mirroring the reference's checkpoint sha256 print
        # (create_g1.py:173-178)
        for name in ("G_ema.msgpack", "G.msgpack"):
            path = os.path.join(args.checkpoint, name)
            if os.path.exists(path):
                with open(path, "rb") as fp:
                    digest = hashlib.sha256(fp.read()).hexdigest()
                print(f"checkpoint {name} sha256: {digest}")
                break

    from ieagan_tpu.deploy import Model, produce_events
    model = Model()
    if args.checkpoint:
        from flax import serialization
        path = os.path.join(args.checkpoint, "G_ema.msgpack")
        if not os.path.exists(path):
            path = os.path.join(args.checkpoint, "G.msgpack")
        with open(path, "rb") as fp:
            tree = serialization.from_bytes(
                {"params": model.params, "state": model.state}, fp.read())
        model.params, model.state = tree["params"], tree["state"]

    n = produce_events(model, args.num_events, out_dir=args.output,
                       events_per_call=args.events_per_call, seed=args.seed)
    print(f"produced {n} events -> {args.output}")


if __name__ == "__main__":
    main()
