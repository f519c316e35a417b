#!/usr/bin/env python3
"""Mint FID (mu/sigma) and KID (raw feature) reference statistics from a
folder of real images (reference: mycleanfid/fid.py:832-867 — upstream's
stats blob is a missing LFS artifact, so minting is a first-class step).

Usage:
  python scripts/mint_stats.py <name> <real_dir> [--num 16000]
      [--mode clean] [--no-kid] [--overwrite] [--host-resize]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("real_dir")
    ap.add_argument("--num", type=int, default=16000)
    ap.add_argument("--mode", default="clean")
    ap.add_argument("--no-kid", action="store_true")
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (chip-down operation)")
    ap.add_argument("--host-resize", action="store_true",
                    help="strict PIL host resize (slow on a 1-core host); "
                         "default is the validated on-device resize")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ieagan_tpu.eval.fid import (default_extractor, make_custom_stats,
                                     make_custom_kid_stats)

    extractor = default_extractor()
    print(f"extractor: {extractor.source}", file=sys.stderr)
    t0 = time.time()
    path = make_custom_stats(args.name, args.real_dir, num=args.num,
                             mode=args.mode, extractor=extractor,
                             overwrite=args.overwrite,
                             resize_on_device=not args.host_resize)
    print(f"FID stats -> {path} ({time.time() - t0:.0f}s)")
    if not args.no_kid:
        t0 = time.time()
        path = make_custom_kid_stats(args.name, args.real_dir, num=args.num,
                                     mode=args.mode, extractor=extractor,
                                     overwrite=args.overwrite,
                                     resize_on_device=not args.host_resize)
        print(f"KID stats -> {path} ({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
