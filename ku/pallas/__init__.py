"""Pallas TPU kernels for the ku hot paths.

- :mod:`ku.pallas.cd_gibbs` — fused contrastive-divergence (CD-k) kernel:
  the RBM Gibbs chain (v↔h matmuls, sigmoid, on-chip Bernoulli/Gaussian
  sampling via the TPU PRNG) runs entirely in VMEM. Replaces the
  reference's 5 host→device dispatches per batch (reference
  ku/ebm/rbm.py:163-234).
- :mod:`ku.pallas.flash_attention` — blockwise flash attention for the
  ``scaled`` similarity path of :class:`ku.nn.MultiHeadAttention`.
- :mod:`ku.pallas.sparse_attention` — splash-style block-sparse
  attention: static patterns (sliding window + attention sinks, extra
  blocks, arbitrary block matrices) compiled to scalar-prefetched block
  maps so dead blocks cost no compute and no HBM traffic.
"""
