#!/usr/bin/env python3
"""Finetune InceptionV3 on the PXD sensor-classification task.

Re-mints the reference's missing FID backbone ("inception_V3_best.pt" —
absent LFS blob; recipe: notebooks/Inception_re-training.ipynb finetunes
timm inception_v3 to the 40 sensor classes at +0.99 accuracy). This script
does the same TPU-natively: our flax InceptionV3Features + a 40-class head,
trained on the event dataset's per-sensor images, saved as a msgpack params
file consumable via IEAGAN_INCEPTION_WEIGHTS.

Usage:
  python scripts/finetune_inception.py --dataroot <pxd-data> \
      --out stats/inception_pxd.msgpack [--steps 2000] [--lr 1e-4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--out", default="stats/inception_pxd.msgpack")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--init-weights", default=None,
                    help="optional torch state dict to start from")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import flax.linen as nn
    from flax import serialization
    from ieagan_tpu.eval.inception import (InceptionV3Features,
                                           convert_torch_state_dict)
    from ieagan_tpu.eval.resize import jax_resize_single_channel
    from ieagan_tpu.data import ImageEventsDataset

    ds = ImageEventsDataset(args.dataroot, noise_scale=0.0)
    n_classes = ds.n_sensors
    print(f"{len(ds)} events x {n_classes} sensors")

    class Classifier(nn.Module):
        @nn.compact
        def __call__(self, x):
            feats = InceptionV3Features(name="features")(x)
            return nn.Dense(n_classes, name="fc")(feats)

    model = Classifier()
    rng = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((1, 299, 299, 3), jnp.float32)
    params = model.init(rng, x0)["params"]
    if args.init_weights:
        import torch
        sd = torch.load(args.init_weights, map_location="cpu",
                        weights_only=False)
        sd = sd if isinstance(sd, dict) else sd.state_dict()
        params = dict(params)
        params["features"] = convert_torch_state_dict(sd)

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            acc = jnp.mean(jnp.argmax(logits, -1) == y)
            return loss, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    np_rng = np.random.default_rng(args.seed)
    per_event = max(1, args.batch // n_classes)
    for step in range(args.steps):
        ev_ids = np_rng.choice(len(ds), per_event, replace=False)
        imgs, labels = [], []
        for e in ev_ids:
            im, lb = ds[e]  # (n_sensors, H, W, 1) in [-1, 1]
            imgs.append((im[..., 0] * 0.5 + 0.5))  # -> [0, 1]
            labels.append(lb)
        x = jnp.asarray(np.concatenate(imgs))
        y = jnp.asarray(np.concatenate(labels))
        x = jax_resize_single_channel(x)
        params, opt_state, loss, acc = train_step(params, opt_state, x, y)
        if step % 50 == 0:
            print(f"step {step}: loss {float(loss):.4f} acc {float(acc):.3f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as fp:
        fp.write(serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, params["features"])))
    print(f"saved feature-extractor params to {args.out}")


if __name__ == "__main__":
    main()
