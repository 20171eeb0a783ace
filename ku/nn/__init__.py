"""The ku layer zoo (flax.linen modules, channels-last, TPU-native)."""

from ku.nn.core import EqualizedLRDense
from ku.nn.convolution import (
    EqualizedLRConv1D,
    EqualizedLRConv2D,
    EqualizedLRConv3D,
    FusedEqualizedLRConv1D,
    FusedEqualizedLRConv2D,
    FusedEqualizedLRConv3D,
    FusedEqualizedLRConv2DTranspose,
    BlurDepthwiseConv2D,
    DepthwiseConv3D,
    SeparableConv3D,
    conv_nd,
)
from ku.nn.normalization import AdaptiveIN, AdaptiveINWithStyle, PixelNorm
from ku.nn.style import (
    StyleMixingRegularization,
    TruncationTrick,
    MinibatchStddevConcat,
)
from ku.nn.attention import (
    MultiHeadAttention,
    apply_rope,
    SIMILARITY_TYPE_DIFF_ABS,
    SIMILARITY_TYPE_PLAIN,
    SIMILARITY_TYPE_SCALED,
    SIMILARITY_TYPE_GENERAL,
    SIMILARITY_TYPE_ADDITIVE,
)
from ku.nn.position_encoding import OrdinalPositionEncoding, PeriodicPositionEncoding
from ku.nn.transformer import Transformer, InterferedTransformer
from ku.nn.dense_composite import DenseBatchNormalization
from ku.nn.gnn import GraphConvolutionNetwork
from ku.nn.decoding import (generate, greedy, make_sampler, beam_search,
                            speculative_generate, fork_cache, mask_after_eos)
from ku.nn.serving import ContinuousBatcher
from ku.nn.quant import QuantDense, quantize_weights
