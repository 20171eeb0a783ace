"""Flagship model families built on the ku layer zoo."""

from ku.models.stylegan import (
    MappingNetwork,
    SynthesisNetwork,
    StyleGANGenerator,
    StyleGANDiscriminator,
    cal_num_chs,
)
