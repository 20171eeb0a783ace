"""Graph convolution network layer (Kipf & Welling 2017).

Reference: ku/gnn_layer/core.py:16-71. The reference renormalizes the
adjacency in-graph with ``tf.linalg.sqrtm(tf.linalg.inv(D))`` (:50-53) —
but D̃ is diagonal, so the matrix inverse square root is just
``diag(deg^-1/2)``: we compute it with elementwise ``rsqrt`` and two
broadcast multiplies (VPU work, no O(n³) solves). The reference's tensordot
axes at :55 only type-check when d_in == n_node; we implement the intended
propagation ``X' = act(Â X W)``, batched over the leading axis.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ku.nn.common import Activation, resolve_activation


class GraphConvolutionNetwork(nn.Module):
    """GCN layer on ``inputs = [X, A]`` (reference gnn_layer/core.py:16-71).

    ``X``: (..., n_node, d_in) node features, ``A``: (..., n_node, n_node)
    adjacency. Output ``act(D̃^-1/2 (A+I) D̃^-1/2 X W)``; with
    ``output_adjacency=True`` returns ``[X', A]`` for stacking.
    """

    n_node: int
    d_out: int
    output_adjacency: bool = False
    activation: Activation = None

    @nn.compact
    def __call__(self, inputs):
        x, a = inputs[0], inputs[1]
        eye = jnp.eye(self.n_node, dtype=a.dtype)
        a_td = a + eye
        deg = jnp.sum(a_td, axis=-1)
        d_inv_sqrt = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
        a_hat = a_td * d_inv_sqrt[..., :, None] * d_inv_sqrt[..., None, :]

        w = self.param(
            "gcn_weight",
            nn.initializers.truncated_normal(stddev=0.02),
            (x.shape[-1], self.d_out),
        )
        x_p = resolve_activation(self.activation)(jnp.matmul(a_hat, x) @ w)
        return [x_p, a] if self.output_adjacency else x_p
