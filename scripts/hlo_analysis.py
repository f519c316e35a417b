#!/usr/bin/env python3
"""AOT analysis of the compiled flagship train step (no device execution —
safe to run while the chip is busy): XLA cost analysis (FLOPs, bytes) and
an optimized-HLO census of copies / transposes / fusion sizes.

Usage: python scripts/hlo_analysis.py [--epb 1] [--set k=v ...] [--dump PATH]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epb", type=int, default=1)
    ap.add_argument("--set", action="append", default=[], metavar="K=V")
    ap.add_argument("--dump", default=None, help="write optimized HLO here")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--census-only", default=None,
                    help="skip compile; censor an existing HLO dump file")
    args = ap.parse_args()
    if args.census_only:
        with open(args.census_only) as fp:
            _census(fp.read())
        return

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    import jax.numpy as jnp
    from ieagan_tpu.core.config import DEFAULT_CONFIG
    from ieagan_tpu.models import Generator, Discriminator
    from ieagan_tpu.train import init_train_state
    from ieagan_tpu.train.step import make_train_step

    overrides = {"events_per_batch": args.epb}
    for kv in args.set:
        k, _, v = kv.partition("=")
        for cast in (int, float):
            try:
                v = cast(v)
                break
            except ValueError:
                pass
        if v in ("true", "false"):
            v = v == "true"
        overrides[k] = v
    config = dict(DEFAULT_CONFIG, **overrides)

    es = int(config["n_classes"])
    epb = int(config["events_per_batch"])
    h = int(config["resolution"])
    w = h * int(config["H_base"])
    G = Generator.from_config(config, dtype=jnp.bfloat16)
    D = Discriminator.from_config(config, dtype=jnp.bfloat16)
    state = jax.eval_shape(
        lambda: init_train_state(G, D, config, jax.random.PRNGKey(0)))
    # eval_shape gives abstract state; lower with ShapeDtypeStructs
    x = jax.ShapeDtypeStruct((es * epb, h, w, 1), jnp.float32)
    y = jax.ShapeDtypeStruct((es * epb,), jnp.int32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    step = jax.jit(make_train_step(G, D, config, steps_per_epoch=1000),
                   donate_argnums=(0,))
    lowered = step.lower(state, x, y, key)
    compiled = lowered.compile()

    out = {}
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    if ca:
        out["flops"] = float(ca.get("flops", 0))
        out["bytes_accessed"] = float(ca.get("bytes accessed", 0))
    try:
        mem = compiled.memory_analysis()
        out["memory"] = {
            "temp_mb": round(getattr(mem, "temp_size_in_bytes", 0) / 2**20),
            "argument_mb": round(
                getattr(mem, "argument_size_in_bytes", 0) / 2**20),
            "output_mb": round(
                getattr(mem, "output_size_in_bytes", 0) / 2**20),
            "peak_mb": round(getattr(
                mem, "serialized_executable_size_in_bytes", 0) / 2**20)}
    except Exception as e:
        out["memory_error"] = str(e)

    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as fp:
            fp.write(hlo)
        out["dump"] = args.dump
    out.update(_census(hlo, emit=False))
    print(json.dumps(out, indent=2))


def _census(hlo: str, emit: bool = True) -> dict:
    """Op-kind census + biggest copy/transpose shapes of an HLO text."""
    out = {}
    kinds = collections.Counter()
    big_copies = []
    inst = re.compile(
        r"= (bf16|f32|f16|s32|u32|pred|s8)\[([\d,]*)\][^ ]* (\w+)\(")
    for line in hlo.splitlines():
        m = inst.search(line)
        if not m:
            continue
        kind = m.group(3)
        kinds[kind] += 1
        if kind in ("copy", "transpose", "all-reduce", "reduce-scatter"):
            dims = [int(d) for d in m.group(2).split(",") if d]
            size = 1
            for d in dims:
                size *= d
            bytes_ = size * (2 if m.group(1) in ("bf16", "f16") else 4)
            big_copies.append(
                (bytes_, kind, f"{m.group(1)}[{m.group(2)}]"))
    big_copies.sort(reverse=True)
    out["op_census"] = dict(kinds.most_common(12))
    out["copy_transpose_total_mb"] = round(
        sum(b for b, _, _ in big_copies) / 2**20)
    out["biggest_copy_transpose"] = [
        {"mb": round(b / 2**20, 1), "kind": k, "shape": s}
        for b, k, s in big_copies[:10]]
    if emit:
        print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
