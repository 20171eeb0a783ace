"""API-parity re-exports mirroring the reference ``ku.composite_layer``
(reference ku/composite_layer/__init__.py:1-8)."""

from ku.nn.transformer import Transformer, InterferedTransformer
from ku.nn.dense_composite import DenseBatchNormalization
from ku.nn.attention import (
    SIMILARITY_TYPE_DIFF_ABS,
    SIMILARITY_TYPE_PLAIN,
    SIMILARITY_TYPE_SCALED,
    SIMILARITY_TYPE_GENERAL,
    SIMILARITY_TYPE_ADDITIVE,
)
