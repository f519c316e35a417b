#!/usr/bin/env python3
"""Best-checkpoint proof metrics: FID + KID from ONE 16k-image generation
pass (reference analog: mycleanfid/fid.py:476-487 kernel_distance, which
upstream implements but never calls; here both metrics are first-class).

Loads a driver-run checkpoint (same loading path as the in-training eval),
generates num images, extracts Inception features once, and reports FID
(host-f64 moments vs the minted dataset stats) and KID (vs the minted raw
feature stats) in one JSON line.

Usage: python scripts/kid_eval.py --run-dir _local/runs/<run> --tag best0
       [--num 16000] [--cpu]
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
    ap.add_argument("--num", type=int, default=16000)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (chip-down operation)")
    args = ap.parse_args()

    cfgs = sorted(glob.glob(os.path.join(args.run_dir, "*_config.json")))
    with open(cfgs[-1]) as f:
        config = json.load(f)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from ieagan_tpu.models import Generator
    from ieagan_tpu.eval import fid as fid_mod

    G = Generator.from_config(config, dtype=jnp.bfloat16)
    es = int(config["n_classes"])
    template = jax.eval_shape(
        lambda: G.init({"params": jax.random.PRNGKey(0),
                        "rdof": jax.random.PRNGKey(1)},
                       jnp.zeros((es, int(config["dim_z"]))),
                       jnp.arange(es), train=False))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template)
    use_ema = bool(config.get("ema")) and bool(config.get("use_ema"))
    base = "G_ema" if use_ema else "G"
    with open(os.path.join(args.run_dir, "weights",
                           f"{base}_{args.tag}.msgpack"), "rb") as fp:
        tree = serialization.from_bytes(
            {"params": template["params"],
             "state": {k: v for k, v in template.items()
                       if k != "params"}}, fp.read())
    from ieagan_tpu.utils.transfer import packed_device_put
    tree = packed_device_put(tree)

    trunc = float(config.get("fid_trunc", 1.0))
    extractor = fid_mod.default_extractor(config)
    mode = config.get("fid_mode", "clean")
    dataset = config.get("fid_dataset_name", "pxd_sim_test_com")
    ref_mu, ref_sigma = fid_mod.get_reference_statistics(dataset, mode=mode)
    kid_path = fid_mod._stats_path(dataset, mode).replace(".npz", "_kid.npz")
    ref_feats = np.load(kid_path)["feats"]

    gen_fn = fid_mod.make_generator_fn(
        G, tree["params"], tree["state"], config,
        trunc=trunc if trunc > 0 else None,
        chunks=int(config.get("fid_gen_chunks", 8)))
    rng = jax.random.PRNGKey(int(config.get("seed", 0)))

    feats = fid_mod.get_model_features(
        gen_fn, extractor, num_gen=args.num, batch_size=es, rng=rng,
        mode=mode, return_moments=False)
    feats = np.asarray(feats, np.float64)
    fid = fid_mod.frechet_distance(feats.mean(0),
                                   np.cov(feats, rowvar=False),
                                   ref_mu, ref_sigma)
    seed = int(config.get("seed", 0))
    kid = fid_mod.kernel_distance(feats.astype(np.float32), ref_feats,
                                  seed=seed)
    # real-vs-real floor of the same feature bank (round-4 verdict item 7:
    # a KID without its floor hides the fidelity gap)
    kid_floor = fid_mod.kid_self_floor(ref_feats, seed=seed)
    print(json.dumps({"tag": args.tag, "num": int(feats.shape[0]),
                      "fid": float(fid), "kid_x1e3": float(kid) * 1e3,
                      "kid_floor_x1e3": float(kid_floor) * 1e3,
                      "dataset": dataset}))


if __name__ == "__main__":
    main()
