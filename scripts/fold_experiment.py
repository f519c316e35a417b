#!/usr/bin/env python3
"""AOT experiment: does folding the 40-image batch into the H axis kill
the 128-lane batch padding?

Round-3 measured finding (scripts/bandwidth_join.py over a real trace):
the flagship step is HBM-bound and 3.2x of its traffic is tile padding —
XLA assigns batch-minormost layouts ({0,3,2,1:T(8,128)}: batch 40 -> 128
lanes) to the wide NHWC activations. Folding the event's 40 images into
one tall batch-1 strip (with zero guard rows so SAME-conv semantics are
preserved per image) removes the 40-sized dim entirely; XLA then has no
batch dim to pad.

This AOT-compiles a representative conv->BN->relu x2 block (fwd+bwd) in
both arrangements at the flagship's widest shape and reports, per
variant, the padded-vs-unpadded HBM traffic floor summed over every
buffer in the compiled HLO (same tile arithmetic as bandwidth_join.py),
plus temp memory. Compile-only: safe while the chip trains.

Usage: python scripts/fold_experiment.py [--cpu] [--ch 32] [--h 256]
       [--w 768] [--batch 40]
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


GUARD = 1  # zero rows above/below each image in the folded strip


def guard_mask(batch: int, h: int):
    """(fold_h,) float mask: 0 on guard rows, 1 on image rows."""
    import numpy as np
    seg = h + 2 * GUARD
    m = np.zeros(batch * seg, np.float32)
    for i in range(batch):
        m[i * seg + GUARD:i * seg + GUARD + h] = 1.0
    return m


def block_fn(mode: str, batch: int, h: int):
    import jax
    import jax.numpy as jnp

    dn = ("NHWC", "HWIO", "NHWC")

    if mode == "folded":
        import numpy as np  # noqa: F401
        mask_np = guard_mask(batch, h)
        n_true = float(batch * h)  # true rows per W-column for BN counts

        def bn_relu(hh, gamma, beta, mask):
            # moments over the true (non-guard) rows only: guards are zero
            # so sums are exact; divide by the true count.
            w = hh.shape[2]
            n = n_true * w
            s = (hh * mask).sum((0, 1, 2), keepdims=True)
            mu = s / n
            var = ((hh - mu) ** 2 * mask).sum((0, 1, 2), keepdims=True) / n
            out = (hh - mu) * jax.lax.rsqrt(var + 1e-5)
            out = jax.nn.relu(out * gamma.reshape(1, 1, 1, -1)
                              + beta.reshape(1, 1, 1, -1))
            # re-zero guards so the next conv sees zero padding per image
            return (out * mask).astype(jnp.bfloat16)

        def fwd(params, x):
            mask = params["mask"].reshape(1, -1, 1, 1)
            hh = x
            for i in (0, 1):
                hh = jax.lax.conv_general_dilated(
                    hh, params[f"w{i}"], window_strides=(1, 1),
                    padding="SAME", dimension_numbers=dn)
                hh = bn_relu(hh, params[f"g{i}"], params[f"b{i}"], mask)
            return (hh.astype(jnp.float32) ** 2).mean()
    else:
        def bn_relu(hh, gamma, beta):
            mu = hh.mean((0, 1, 2), keepdims=True)
            var = ((hh - mu) ** 2).mean((0, 1, 2), keepdims=True)
            out = (hh - mu) * jax.lax.rsqrt(var + 1e-5)
            out = jax.nn.relu(out * gamma.reshape(1, 1, 1, -1)
                              + beta.reshape(1, 1, 1, -1))
            return out.astype(jnp.bfloat16)

        def fwd(params, x):
            hh = x
            for i in (0, 1):
                hh = jax.lax.conv_general_dilated(
                    hh, params[f"w{i}"], window_strides=(1, 1),
                    padding="SAME", dimension_numbers=dn)
                hh = bn_relu(hh, params[f"g{i}"], params[f"b{i}"])
            return (hh.astype(jnp.float32) ** 2).mean()

    def step(params, x):
        return jax.value_and_grad(fwd)(params, x)

    return step


def hlo_padded_totals(hlo: str) -> tuple[float, float]:
    """Sum (padded, unpadded) bytes over every tiled shape literal in the
    compiled HLO — a traffic floor proxy comparable across variants."""
    p_tot = u_tot = 0
    for m in _SHAPE.finditer(hlo):
        dtype, dims_s, mtm_s, tile_s = m.groups()
        dims = tuple(int(d) for d in dims_s.split(",")) if dims_s else ()
        mtm = tuple(int(d) for d in mtm_s.split(",")) if mtm_s else ()
        p, u = padded_bytes(dtype, dims, mtm, tile_s)
        p_tot += p
        u_tot += u
    return p_tot, u_tot


def analyze(mode: str, batch: int, ch: int, h: int, w: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    if mode == "folded":
        x = jax.ShapeDtypeStruct((1, batch * (h + 2 * GUARD), w, ch),
                                 jnp.bfloat16)
    else:
        x = jax.ShapeDtypeStruct((batch, h, w, ch), jnp.bfloat16)
    params = {}
    for i in (0, 1):
        params[f"w{i}"] = jax.ShapeDtypeStruct((3, 3, ch, ch), jnp.bfloat16)
        params[f"g{i}"] = jax.ShapeDtypeStruct((ch,), jnp.float32)
        params[f"b{i}"] = jax.ShapeDtypeStruct((ch,), jnp.float32)
    if mode == "folded":
        params["mask"] = jax.ShapeDtypeStruct(
            (batch * (h + 2 * GUARD),), jnp.float32)

    step = block_fn(mode, batch, h)
    compiled = jax.jit(step).lower(params, x).compile()
    mem = compiled.memory_analysis()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    hlo = compiled.as_text()
    p_tot, u_tot = hlo_padded_totals(hlo)
    return {
        "mode": mode,
        "temp_mb": round(getattr(mem, "temp_size_in_bytes", 0) / 1e6, 1),
        "flops_g": round(cost.get("flops", 0.0) / 1e9, 2),
        "bytes_accessed_gb": round(cost.get("bytes accessed", 0.0) / 1e9, 3),
        "hlo_padded_gb": round(p_tot / 1e9, 3),
        "hlo_unpadded_gb": round(u_tot / 1e9, 3),
        "padding_ratio": round(p_tot / max(u_tot, 1), 2),
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

    for mode in ("batched", "folded"):
        out = analyze(mode, args.batch, args.ch, args.h, args.w)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
