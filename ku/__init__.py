"""ku — TPU-native unsupervised-learning framework (JAX / XLA / Pallas).

A ground-up rebuild of the capability surface of ``tonandr/keras_unsupervised``
(reference: /root/reference, see SURVEY.md) designed TPU-first:

- energy-based models (:mod:`ku.ebm`): RBM trained by contrastive divergence
  with the Gibbs loop fused into a single Pallas TPU kernel, and greedy
  layer-wise DBN pretraining (reference: ku/ebm/rbm.py, ku/ebm/dbn.py);
- backprop engines (:mod:`ku.backprop`): a GAN engine covering the five
  composing modes of the reference (regular / WGAN-GP / softplus-R1 /
  LSGAN / pix2pix, reference ku/backprop/gan.py:31-35) as single jitted
  alternating train steps, and autoencoder construction by structural
  encoder reversal (reference ku/backprop/autoencoder.py);
- the StyleGAN layer zoo and friends (:mod:`ku.layer_ext`,
  :mod:`ku.composite_layer`, :mod:`ku.gnn_layer`);
- data / tensor parallelism via ``jax.sharding`` meshes (:mod:`ku.dist`);
- device-resident image preprocessing (:mod:`ku.image_utils`);
- orbax checkpointing and JSON+npz weight export (:mod:`ku.io`,
  :func:`ku.utility.save_model_jh5`).

Public API parity: the reference exports layers / engines from the package
root (reference ku/__init__.py:1-14); we do the same.
"""

from ku.core import config as config
from ku.core import rng as rng

from ku.ebm.rbm import RBM, MODE_VISIBLE_BERNOULLI, MODE_VISIBLE_GAUSSIAN, MODE_COMPLEX
from ku.ebm.dbn import DBN

from ku.layer_ext import (
    EqualizedLRDense,
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
    AdaptiveIN,
    AdaptiveINWithStyle,
    PixelNorm,
    StyleMixingRegularization,
    TruncationTrick,
    MinibatchStddevConcat,
    MultiHeadAttention,
    OrdinalPositionEncoding,
    PeriodicPositionEncoding,
)
from ku.composite_layer import Transformer, InterferedTransformer, DenseBatchNormalization
from ku.gnn_layer import GraphConvolutionNetwork

from ku.utility import save_model_jh5, load_model_jh5

# Subpackages importable as attributes (reference ku/__init__.py:1-10
# imports the same set; dist/io/models/pallas/utils are new).
from ku import applications_ext as applications_ext
from ku import backend_ext as backend_ext
from ku import backprop as backprop
from ku import dist as dist
from ku import ebm as ebm
from ku import engine_ext as engine_ext
from ku import image_utils as image_utils
from ku import initializers_ext as initializers_ext
from ku import io as io
from ku import layer_ext as layer_ext
from ku import loss_ext as loss_ext
from ku import metrics_ext as metrics_ext
from ku import models as models
from ku import utils as utils

__version__ = "0.1.0"
