from ieagan_tpu.ops.spectral import (
    SNDense, SNConv, SNEmbed, Dense, Embed, power_iteration, SN_COL, ortho_init,
)
from ieagan_tpu.ops.norm import (
    ClassCondBatchNorm, BatchNorm, LayerNorm, BN_COL, group_norm,
)
from ieagan_tpu.ops.attention import SelfAttention2d, CBAMAttention, ILA
from ieagan_tpu.ops.rrm import RelationalReasoning
from ieagan_tpu.ops.diff_aug import diff_augment, cr_diff_augment
from ieagan_tpu.ops.image_norm import lognorm255, lognorm, denorm, generate_postprocess
from ieagan_tpu.ops.prior import prior_features, set_prior_features, load_prior_features
