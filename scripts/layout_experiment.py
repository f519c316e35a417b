#!/usr/bin/env python3
"""Layout-assignment experiment: would NCHW beat NHWC for these narrow
channels? AOT-compile only (no device execution — safe while the chip
trains).

Round-3 measured finding (scripts/bandwidth_join.py): the flagship step
is HBM-bound at 76% of v5e peak, but 3.2x of that traffic is tile
padding — XLA assigns batch-minormost layouts ({0,3,2,1:T(8,128)}: batch
40 -> 128 lanes) to most wide NHWC activations with C=16/32, and flips
layouts ({2,3,1,0}<->{0,3,2,1}) around convs (163 ms/step of copies).

This compiles a representative conv->BN->relu x2 block (fwd+bwd) in both
data formats at the flagship's widest shapes and reports, per variant:
temp memory (padded vs unpadded), copy/transpose bytes, and cost-analysis
bytes. If NCHW keeps W=768 in lanes (unpadded) end-to-end, it wins.

Usage: python scripts/layout_experiment.py [--cpu] [--ch 32] [--batch 40]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def block_fn(data_format: str):
    import jax
    import jax.numpy as jnp

    if data_format == "NHWC":
        dn = ("NHWC", "HWIO", "NHWC")
        caxis = 3
        red = (0, 1, 2)
    else:
        dn = ("NCHW", "OIHW", "NCHW")
        caxis = 1
        red = (0, 2, 3)

    def bn_relu(h, gamma, beta):
        mu = h.mean(red, keepdims=True)
        var = ((h - mu) ** 2).mean(red, keepdims=True)
        shape = [1] * 4
        shape[caxis] = h.shape[caxis]
        h = (h - mu) * jax.lax.rsqrt(var + 1e-5)
        h = jax.nn.relu(h * gamma.reshape(shape) + beta.reshape(shape))
        return h.astype(jnp.bfloat16)

    def fwd(params, x):
        h = x
        for i in (0, 1):
            h = jax.lax.conv_general_dilated(
                h, params[f"w{i}"], window_strides=(1, 1), padding="SAME",
                dimension_numbers=dn)
            h = bn_relu(h, params[f"g{i}"], params[f"b{i}"])
        return (h.astype(jnp.float32) ** 2).mean()

    def step(params, x):
        loss, grads = jax.value_and_grad(fwd)(params, x)
        return loss, grads

    return step


def analyze(data_format: str, batch: int, ch: int, h: int, w: int):
    import jax
    import jax.numpy as jnp

    if data_format == "NHWC":
        x = jax.ShapeDtypeStruct((batch, h, w, ch), jnp.bfloat16)
        wshape = (3, 3, ch, ch)
    else:
        x = jax.ShapeDtypeStruct((batch, ch, h, w), jnp.bfloat16)
        wshape = (ch, ch, 3, 3)
    params = {}
    for i in (0, 1):
        params[f"w{i}"] = jax.ShapeDtypeStruct(wshape, jnp.bfloat16)
        params[f"g{i}"] = jax.ShapeDtypeStruct((ch,), jnp.float32)
        params[f"b{i}"] = jax.ShapeDtypeStruct((ch,), jnp.float32)

    step = block_fn(data_format)
    lowered = jax.jit(step).lower(params, x)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    hlo = compiled.as_text()

    copy_bytes = n_copies = 0
    shape_re = re.compile(r"= (bf16|f32)\[([\d,]+)\]")
    for line in hlo.splitlines():
        ls = line.lstrip()
        if re.match(r"%?(copy|transpose)[.\d]*\s*=", ls) or \
                (" copy(" in ls and "= " in ls and "fusion" not in ls):
            m = shape_re.search(ls)
            if m:
                dt, dims = m.groups()
                nb = 2 if dt == "bf16" else 4
                el = 1
                for d in dims.split(","):
                    el *= int(d)
                copy_bytes += el * nb
                n_copies += 1
    return {
        "format": data_format,
        "temp_mb": round(getattr(mem, "temp_size_in_bytes", 0) / 1e6, 1),
        "flops": cost.get("flops", 0.0),
        "bytes_accessed_gb": round(cost.get("bytes accessed", 0.0) / 1e9, 3),
        "copy_transpose_count": n_copies,
        "copy_transpose_mb": round(copy_bytes / 1e6, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--ch", type=int, default=32)
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--w", type=int, default=768)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    for fmt in ("NHWC", "NCHW"):
        out = analyze(fmt, args.batch, args.ch, args.h, args.w)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
