"""Headline benchmark: generated events/sec on one TPU chip.

Measures the deployment path (flagship 256x768 generator, 40-image events,
full generate() postprocess) and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the PyTorch-CPU reference implementation's
throughput minted by scripts/mint_baseline.py into baseline_local.json
(the reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax
    # Amortize the (tunneled-TPU) compile across bench runs.
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ieagan_tpu.core.config import DEFAULT_CONFIG
    from ieagan_tpu.models import Generator
    from ieagan_tpu.ops.image_norm import generate_postprocess

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    config = dict(DEFAULT_CONFIG)
    es = int(config["n_classes"])
    dim_z = int(config["dim_z"])
    events_per_call = int(os.environ.get("BENCH_EVENTS_PER_CALL", "8"))
    n_timed_calls = int(os.environ.get("BENCH_CALLS", "12"))

    G = Generator.from_config(config, dtype=jnp.bfloat16)
    batch = es * events_per_call
    y = jnp.tile(jnp.arange(es, dtype=jnp.int32), events_per_call)
    z0 = jnp.zeros((batch, dim_z), jnp.float32)
    t0 = time.time()
    variables = jax.jit(lambda: G.init(
        {"params": jax.random.PRNGKey(0), "rdof": jax.random.PRNGKey(1)},
        z0, y, train=False))()
    jax.block_until_ready(variables)
    log(f"init: {time.time() - t0:.1f}s")

    # One dispatch generates `chunks` event-batches via an internal scan:
    # per-dispatch overhead (large on a network-attached chip, and dispatches
    # with pending-device arguments serialize on the tunnel) amortizes over
    # chunks*events_per_call events. Keys are folded on device.
    chunks = int(os.environ.get("BENCH_CHUNKS", "8"))

    @jax.jit
    def gen_many(variables, key):
        def body(carry, i):
            k = jax.random.fold_in(key, i)
            kz, kr = jax.random.split(k)
            z = jax.random.normal(kz, (batch, dim_z), jnp.float32)
            imgs = G.apply(variables, z, y, train=False, rngs={"rdof": kr})
            return carry, generate_postprocess(imgs.astype(jnp.float32))

        _, out = jax.lax.scan(body, 0, jnp.arange(chunks))
        return out  # (chunks, batch, 250, 768)

    keys = [jax.device_put(jax.random.PRNGKey(100 + i))
            for i in range(n_timed_calls)]
    t0 = time.time()
    out = gen_many(variables, keys[0])
    jax.block_until_ready(out)
    log(f"compile+first call: {time.time() - t0:.1f}s; out {out.shape}")
    assert out.shape == (chunks, batch, 250, 768)

    t0 = time.time()
    for i in range(n_timed_calls):
        out = gen_many(variables, keys[i])
    jax.block_until_ready(out)
    dt = time.time() - t0
    events_per_sec = n_timed_calls * chunks * events_per_call / dt
    log(f"{n_timed_calls} dispatches x {chunks} chunks x {events_per_call} "
        f"events in {dt:.3f}s")

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "baseline_local.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as fp:
            base = json.load(fp)
        if base.get("value"):
            vs_baseline = events_per_sec / float(base["value"])

    print(json.dumps({
        "metric": "generate_events_per_sec",
        "value": round(events_per_sec, 4),
        "unit": "events/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
