#!/usr/bin/env python3
"""AOT memory/traffic grid for the flagship train step.

Round-3 finding: the step is HBM-bound with 3.2x batch-lane tile padding
(batch 40 -> 128 lanes). events_per_batch=3 would fill the padded lanes
(120 -> 128, ratio 1.07) but missed the 16G chip by ~1GB with block remat
(16.7G). This grid AOT-compiles the REAL fused train step (flagship
config) across (events_per_batch, remat, split_D) and reports, per
variant: temp memory (the fit criterion), XLA cost-analysis bytes, and
the padded/unpadded HBM-traffic floor summed over the compiled HLO's
tiled buffers — all normalized per event so variants are comparable.

Compile-only (no device execution): safe while the chip trains.

Usage: python scripts/memfit_experiment.py [--cpu]
       [--variants epb1,epb3r,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bandwidth_join import _SHAPE, padded_bytes  # noqa: E402

VARIANTS = {
    "epb1": dict(events_per_batch=1, remat=False),
    "epb1r": dict(events_per_batch=1, remat=True),
    "epb2": dict(events_per_batch=2, remat=False),
    "epb2r": dict(events_per_batch=2, remat=True),
    "epb3r": dict(events_per_batch=3, remat=True),
    "epb2w": dict(events_per_batch=2, remat="wide"),
    "epb3w": dict(events_per_batch=3, remat="wide"),
    "epb3rc": dict(events_per_batch=3, remat=True, split_D=False),
    "epb2c": dict(events_per_batch=2, remat=False, split_D=False),
    # per-model remat split (config remat_G/remat_D, round 4): the VERDICT
    # lever "D-only remat at lane-multiple batches"
    "epb3dw": dict(events_per_batch=3, remat_D="wide"),
    "epb3dr": dict(events_per_batch=3, remat_D=True),
    "epb3dr_gw": dict(events_per_batch=3, remat_D=True, remat_G="wide"),
    "epb3gr": dict(events_per_batch=3, remat_G=True),
    "epb3gr_dw": dict(events_per_batch=3, remat_G=True, remat_D="wide"),
}


def hlo_padded_totals(hlo: str) -> tuple[float, float]:
    p_tot = u_tot = 0
    for m in _SHAPE.finditer(hlo):
        dtype, dims_s, mtm_s, tile_s = m.groups()
        dims = tuple(int(d) for d in dims_s.split(",")) if dims_s else ()
        mtm = tuple(int(d) for d in mtm_s.split(",")) if mtm_s else ()
        p, u = padded_bytes(dtype, dims, mtm, tile_s)
        p_tot += p
        u_tot += u
    return p_tot, u_tot


def analyze(name: str, overrides: dict):
    import jax
    import jax.numpy as jnp
    from ieagan_tpu.core.config import DEFAULT_CONFIG
    from ieagan_tpu.models import Generator, Discriminator
    from ieagan_tpu.train.step import (TrainState, init_train_state,
                                       make_train_step, make_optimizers)

    config = dict(DEFAULT_CONFIG)
    config.update(overrides)
    epb = int(config["events_per_batch"])
    es = int(config["n_classes"])
    h = int(config["resolution"])
    w = h * int(config["H_base"])
    batch = es * epb

    G = Generator.from_config(config, dtype=jnp.bfloat16)
    D = Discriminator.from_config(config, dtype=jnp.bfloat16)

    # Abstract state: eval_shape the init so nothing executes.
    def init_fn(rng):
        return init_train_state(G, D, config, rng)

    state = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    step = make_train_step(G, D, config, steps_per_epoch=1000)
    x = jax.ShapeDtypeStruct((batch, h, w, 1), jnp.float32)
    y = jax.ShapeDtypeStruct((batch,), jnp.int32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        state, x, y, key).compile()
    mem = compiled.memory_analysis()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    p_tot, u_tot = hlo_padded_totals(compiled.as_text())
    return {
        "variant": name,
        **{k: overrides[k] for k in overrides},
        "temp_gb": round(getattr(mem, "temp_size_in_bytes", 0) / 1e9, 2),
        "flops_t_per_event": round(cost.get("flops", 0.0) / 1e12 / epb, 3),
        "bytes_gb_per_event": round(
            cost.get("bytes accessed", 0.0) / 1e9 / epb, 1),
        "hlo_padded_gb_per_event": round(p_tot / 1e9 / epb, 1),
        "hlo_unpadded_gb_per_event": round(u_tot / 1e9 / epb, 1),
        "padding_ratio": round(p_tot / max(u_tot, 1), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variants", default="epb1,epb3r,epb3rc")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    for name in args.variants.split(","):
        name = name.strip()
        try:
            print(json.dumps(analyze(name, VARIANTS[name])), flush=True)
        except Exception as e:  # OOM-in-compile etc: report, keep going
            import re
            s = str(e)
            m = re.search(r"Used ([\d.]+[GM]) of ([\d.]+[GM]) hbm"
                          r".*?Exceeded hbm capacity by ([\d.]+[GM])", s,
                          re.S)
            rec = {"variant": name, "error": s[:200]}
            if m:
                rec["hbm_used"], rec["hbm_cap"], rec["hbm_over"] = m.groups()
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
