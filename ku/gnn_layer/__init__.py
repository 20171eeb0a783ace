"""API-parity re-export mirroring the reference ``ku.gnn_layer``."""

from ku.nn.gnn import GraphConvolutionNetwork
