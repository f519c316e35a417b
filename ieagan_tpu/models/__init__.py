from ieagan_tpu.models.arch import g_arch, d_arch
from ieagan_tpu.models.generator import Generator, GBlock, upsample_2x
from ieagan_tpu.models.discriminator import Discriminator, DBlock
