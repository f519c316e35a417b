#!/usr/bin/env python3
"""One FID evaluation of a saved checkpoint, in its own process.

The driver's in-training FID hook runs this in a SUBPROCESS (driver.py
run_test): the flagship train step needs ~15G of the v5e's 15.75G HBM as
temp, and eval residue — executables, stats, lazily-freed buffers over
the tunneled chip — repeatedly starved the step right after in-process
evals (RESOURCE_EXHAUSTED at itr N*test_every+1, three independent
mitigation attempts). A fresh client that exits cleanly is the one
mechanism PROVEN to return the memory (bench.py's phase isolation).

Prints exactly one JSON line on stdout:
  {"fid": <float>, "nonzero_frac": <float>, "tag": "copy2000"}
nonzero_frac is the fraction of generated pixels above 0 ADU after uint8
quantization — the direct "has G left the black basin" diagnostic.

Usage: python scripts/fid_eval_once.py --run-dir /out/run --tag copy2000
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--num-gen", type=int, default=None)
    args = ap.parse_args()

    cfgs = sorted(glob.glob(os.path.join(args.run_dir, "*_config.json")))
    if not cfgs:
        raise SystemExit(f"no *_config.json under {args.run_dir}")
    with open(cfgs[-1]) as f:
        config = json.load(f)
    if args.num_gen:
        config["num_incep_images"] = args.num_gen

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("IEAGAN_CACHE_DIR",
                                     os.path.join(REPO, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from ieagan_tpu.models import Generator
    from ieagan_tpu.eval import fid as fid_mod

    G = Generator.from_config(config, dtype=jnp.bfloat16)
    es = int(config["n_classes"])
    dim_z = int(config["dim_z"])
    template = jax.eval_shape(
        lambda: G.init({"params": jax.random.PRNGKey(0),
                        "rdof": jax.random.PRNGKey(1)},
                       jnp.zeros((es, dim_z)), jnp.arange(es), train=False))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template)
    use_ema = bool(config.get("ema")) and bool(config.get("use_ema"))
    base = "G_ema" if use_ema else "G"
    path = os.path.join(args.run_dir, "weights",
                        f"{base}_{args.tag}.msgpack")
    with open(path, "rb") as fp:
        tree = serialization.from_bytes(
            {"params": template["params"],
             "state": {k: v for k, v in template.items() if k != "params"}},
            fp.read())
    from ieagan_tpu.utils.transfer import packed_device_put
    tree = packed_device_put(tree)

    trunc = float(config.get("fid_trunc", 1.0))
    gen = fid_mod.make_generator_fn(
        G, tree["params"], tree["state"], config,
        trunc=trunc if trunc > 0 else None,
        chunks=int(config.get("fid_gen_chunks", 8)))

    # black-basin diagnostic on one generated block
    sample = np.asarray(gen(jax.random.PRNGKey(1234)))
    from ieagan_tpu.ops.image_norm import denorm
    adu = np.asarray(denorm(jnp.asarray(sample)))
    nonzero = float((adu >= 0.5).mean())

    fid = fid_mod.compute_fid(
        gen,
        dataset_name=config.get("fid_dataset_name", "pxd_sim_test_com"),
        num_gen=int(config.get("num_incep_images", 16000)),
        batch_size=es * int(config.get("events_per_batch", 1)),
        rng=jax.random.PRNGKey(int(config.get("seed", 0))),
        extractor=fid_mod.default_extractor(config),
        moments_on_device=bool(config.get("fid_moments_on_device", True)),
        mode=config.get("fid_mode", "clean"))
    print(json.dumps({"fid": float(fid), "nonzero_frac": nonzero,
                      "tag": args.tag}))


if __name__ == "__main__":
    main()
