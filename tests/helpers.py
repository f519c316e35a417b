"""Shared tiny test configs (fast CPU compile)."""

from ieagan_tpu.core.config import DEFAULT_CONFIG

TINY = dict(
    DEFAULT_CONFIG,
    resolution=32, G_ch=4, D_ch=4, G_depth=1, D_depth=1, H_base=1,
    n_classes=4, events_per_batch=2, use_pallas_attention=False,
    G_attn="0", D_attn="16", ema_start=1,
    # tests exercise the in-process FID hook (the subprocess default is a
    # tunneled-chip HBM discipline; it needs a saved checkpoint on disk)
    fid_subprocess=False,
)


def tiny_config(**overrides):
    cfg = dict(TINY)
    cfg.update(overrides)
    return cfg
