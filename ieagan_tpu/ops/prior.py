"""Per-sensor physical prior features (reference: layers.prior, layers.py:16-29).

The reference reads ``features.csv`` (per-sensor occupancy/QED-background
features; column 8 = mean occupancy) and L2-normalizes the gathered batch
vector over the batch axis. The csv is absent from the upstream repo; here
the feature table is injectable (``load_prior_features`` /
``set_prior_features``) with a uniform fallback so the PEGAN-style
``prior_embed`` ablation always constructs.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

_FEATURES: np.ndarray | None = None


def set_prior_features(values) -> None:
    global _FEATURES
    _FEATURES = np.asarray(values, np.float32).reshape(-1)


def load_prior_features(path: str = "features.csv", column: int = 8) -> np.ndarray:
    """Load the per-sensor feature column (reference uses iloc[:, 8])."""
    import pandas as pd
    df = pd.read_csv(path)
    values = df.iloc[:, column].to_numpy(np.float32)
    set_prior_features(values)
    return values


def prior_features(y, n_classes: int, norm: bool = True):
    """Gather per-sample prior features -> (B, 1); with norm, L2-normalized
    over the batch axis (reference layers.py:26 F.normalize(dim=0) — for the
    all-classes-once event batches this equals normalizing the class
    table)."""
    global _FEATURES
    if _FEATURES is None:
        env = os.environ.get("IEAGAN_PRIOR_FEATURES")
        if env and os.path.exists(env):
            load_prior_features(env)
        else:
            _FEATURES = np.ones(n_classes, np.float32)
    table = jnp.asarray(_FEATURES[:n_classes])
    feats = jnp.take(table, y, axis=0)[:, None]
    if norm:
        feats = feats / jnp.maximum(jnp.linalg.norm(feats), 1e-12)
    return feats
