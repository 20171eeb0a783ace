"""API-parity re-exports mirroring the reference ``ku.composite_layer``
(reference ku/composite_layer/__init__.py:1-8)."""

from ku.nn.transformer import Transformer, InterferedTransformer
from ku.nn.dense_composite import DenseBatchNormalization
