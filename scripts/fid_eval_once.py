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
    ap.add_argument("--kid", action="store_true",
                    help="also compute KID from the SAME generated features "
                         "(needs <dataset>_<mode>_custom_na_kid.npz stats)")
    ap.add_argument("--physics-events", type=int, default=0,
                    help="also accumulate physics stats over N generated "
                         "events; summary pickled next to the weights dir")
    args = ap.parse_args()

    cfgs = sorted(glob.glob(os.path.join(args.run_dir, "*_config.json")))
    if not cfgs:
        raise SystemExit(f"no *_config.json under {args.run_dir}")
    with open(cfgs[-1]) as f:
        config = json.load(f)
    if args.num_gen:
        config["num_incep_images"] = args.num_gen

    import jax
    if os.environ.get("IEAGAN_FORCE_CPU"):
        # tests drive this subprocess while the real chip may be training;
        # the JAX_PLATFORMS env var is overridden by the axon plugin, the
        # config.update is not
        jax.config.update("jax_platforms", "cpu")
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

    dataset_name = config.get("fid_dataset_name", "pxd_sim_test_com")
    mode = config.get("fid_mode", "clean")
    common = dict(
        dataset_name=dataset_name,
        num_gen=int(config.get("num_incep_images", 16000)),
        batch_size=es * int(config.get("events_per_batch", 1)),
        rng=jax.random.PRNGKey(int(config.get("seed", 0))),
        extractor=fid_mod.default_extractor(config),
        mode=mode)
    out = {"nonzero_frac": nonzero, "tag": args.tag}
    if args.kid:
        # one feature pass serves both metrics: FID from host f64 moments
        # (pinned equivalent to the on-device accumulate), KID from the raw
        # features vs the stored real-feature bank
        fid, feats = fid_mod.compute_fid(gen, return_features=True, **common)
        kid_path = fid_mod._stats_path(dataset_name, mode).replace(
            ".npz", "_kid.npz")
        if os.path.exists(kid_path):
            ref_feats = np.load(kid_path)["feats"]
            seed = int(config.get("seed", 0))
            out["kid"] = float(fid_mod.kernel_distance(
                feats, ref_feats, seed=seed))
            # always report the real-vs-real floor next to the KID
            # (round-4 verdict item 7: the gap must be visible in the
            # artifact, not just prose)
            out["kid_floor"] = float(fid_mod.kid_self_floor(ref_feats,
                                                            seed=seed))
        else:
            print(f"# KID stats {kid_path} missing; skipping KID",
                  file=sys.stderr)
    else:
        fid = fid_mod.compute_fid(
            gen,
            moments_on_device=bool(config.get("fid_moments_on_device", True)),
            **common)
    out["fid"] = float(fid)
    if args.physics_events > 0:
        from ieagan_tpu.eval import physics
        stream = physics.generate_event_stream(
            G, tree["params"], tree["state"], config,
            seed=int(config.get("seed", 0)))
        stats = physics.get_stats(stream, n_events=args.physics_events)
        import pickle
        ppath = os.path.join(args.run_dir,
                             f"physics_{args.tag}_{args.physics_events}ev.pickle")
        with open(ppath, "wb") as fp:
            pickle.dump(stats, fp)
        occ = stats["per_sensor_occupancy"]
        chg = stats["per_sensor_mean_charge"]
        out["physics"] = {
            "n_events": int(stats["n_events"]),
            "mean_occupancy": float(np.mean(occ)),
            "mean_charge": float(np.nanmean(chg)),
            "pickle": ppath,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
