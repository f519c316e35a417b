#!/usr/bin/env python3
"""Finetune InceptionV3 on the PXD sensor-classification task.

Re-mints the reference's missing FID backbone ("inception_V3_best.pt" —
absent LFS blob; recipe: notebooks/Inception_re-training.ipynb finetunes
timm inception_v3 to the 40 sensor classes at ~0.99 accuracy). This script
does the same TPU-natively: our flax InceptionV3Features + an n_sensors
head, trained on the event dataset's per-sensor images.

TPU-first data plan (the chip is network-attached — per-step host uploads
cost ~0.1 s/MB, so we pay the transfer once): the raw uint8 image tensor is
placed on device up front and every step samples/normalizes/resizes fully
on device inside the jitted step. Training inputs are raw [0,1] pixel
images — the SAME space the extractor sees at FID time (get_folder_features
loads PNG/255; fid_postprocess decodes generator output to [0,1] ADU/255),
NOT the train-loop's lognorm encoding.

Usage:
  python scripts/finetune_inception.py --dataroot <pxd-data> \
      --out stats/inception_pxd.msgpack [--steps 2000] [--lr 1e-4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_raw_images(dataroot: str, max_events: int | None):
    """-> (images uint8 (n_sensors*n_events, H, W), labels int32), raw pixel
    values (no padding, no lognorm — see module docstring)."""
    import numpy as np
    from PIL import Image
    subdirs = sorted(os.listdir(dataroot))
    filenames = sorted(os.listdir(os.path.join(dataroot, subdirs[0])))
    if max_events:
        filenames = filenames[:max_events]
    imgs, labels = [], []
    for s, sub in enumerate(subdirs):
        for fn in filenames:
            with Image.open(os.path.join(dataroot, sub, fn)) as im:
                imgs.append(np.asarray(im.convert("L"), np.uint8))
            labels.append(s)
    return np.stack(imgs), np.asarray(labels, np.int32), len(subdirs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--out", default="stats/inception_pxd.msgpack")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-events", type=int, default=300,
                    help="events per sensor to load (bounds the one-time "
                         "host->device upload)")
    ap.add_argument("--val-frac", type=float, default=0.1)
    ap.add_argument("--init-weights", default=None,
                    help="optional torch state dict to start from")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "overrides JAX_PLATFORMS env)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np
    import optax
    import flax.linen as nn
    from flax import serialization
    from ieagan_tpu.eval.inception import (InceptionV3Features,
                                           convert_torch_state_dict)
    from ieagan_tpu.eval.resize import jax_resize_single_channel

    imgs_u8, labels, n_classes = load_raw_images(args.dataroot, args.max_events)
    n = imgs_u8.shape[0]
    print(f"{n} images, {n_classes} sensors, {imgs_u8.nbytes / 1e9:.2f} GB raw")

    # train/val split, stratified by construction (labels are block-sorted;
    # permute within the global pool instead)
    rng_np = np.random.default_rng(args.seed)
    perm = rng_np.permutation(n)
    n_val = int(n * args.val_frac)
    val_idx, train_idx = perm[:n_val], perm[n_val:]

    # one-time device placement (minutes over the tunnel; amortized over
    # all steps — per-step uploads would cost more every single step)
    t0 = time.time()
    d_imgs = jax.device_put(imgs_u8)
    d_labels = jax.device_put(labels)
    d_train_idx = jax.device_put(train_idx.astype(np.int32))
    jax.block_until_ready(d_imgs)
    print(f"dataset resident on {d_imgs.device} in {time.time() - t0:.1f}s")

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

    tx = optax.adam(optax.cosine_decay_schedule(args.lr, args.steps))
    opt_state = tx.init(params)

    # The dataset tensors are jit ARGUMENTS (device-resident, zero per-call
    # cost) — closing over them would bake 2.3GB of constants into the HLO.
    def batch_from_idx(data, lbl, idx):
        x = data[idx].astype(jnp.float32) / 255.0  # raw [0,1] pixel space
        return jax_resize_single_channel(x), lbl[idx]

    @jax.jit
    def train_step(params, opt_state, data, lbl, tr_idx, key):
        idx = tr_idx[jax.random.randint(
            key, (args.batch,), 0, tr_idx.shape[0])]
        x, y = batch_from_idx(data, lbl, idx)

        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            acc = jnp.mean(jnp.argmax(logits, -1) == y)
            return loss, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state,
                jnp.stack([loss, acc]))

    @jax.jit
    def eval_batch(params, data, lbl, idx):
        x, y = batch_from_idx(data, lbl, idx)
        logits = model.apply({"params": params}, x)
        return jnp.mean(jnp.argmax(logits, -1) == y)

    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = train_step(
            params, opt_state, d_imgs, d_labels, d_train_idx, sub)
        if step % 50 == 0:
            loss, acc = np.asarray(metrics)  # one packed fetch
            print(f"step {step}: loss {loss:.4f} acc {acc:.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # held-out accuracy (the reference's recipe reports ~0.99)
    accs = []
    eb = args.batch
    for i in range(0, len(val_idx) - eb + 1, eb):
        accs.append(float(eval_batch(
            params, d_imgs, d_labels,
            jnp.asarray(val_idx[i:i + eb].astype(np.int32)))))
    val_acc = float(np.mean(accs)) if accs else float("nan")
    print(f"validation accuracy: {val_acc:.4f} over {len(accs) * eb} images")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as fp:
        fp.write(serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, params["features"])))
    print(f"saved feature-extractor params to {args.out}")


if __name__ == "__main__":
    main()
