"""Deep belief network: greedy layer-wise stack of RBMs.

Reference: ku/ebm/dbn.py:11-96. Intended semantics implemented (the
reference has two latent bugs we fix, per SURVEY §7 "hard parts":
``fit`` trains ``self.rbm_layer`` instead of the loop variable (:54), and
``inv_transform``'s ``range(len(...), -1)`` is empty (:92) — here every
stacked RBM is trained and the inverse pass really walks the stack
backwards).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp

from ku.ebm.rbm import RBM


class DBN:
    """Greedy layer-wise deep belief network (reference ku/ebm/dbn.py:11-96)."""

    def __init__(self, hps=None, name: Optional[str] = None):
        self.hps = hps
        self.name = name
        self.rbm_layers: List[RBM] = []

    def add_stack(self, rbm: RBM):
        """Append an RBM to the stack (reference :14-32)."""
        if not isinstance(rbm, RBM):
            raise ValueError("Only an RBM can be stacked in a DBN.")
        self.rbm_layers.append(rbm)
        return self

    @property
    def num_layers(self) -> int:
        return len(self.rbm_layers)

    def fit(self, V, verbose: int = 1, mesh=None):
        """Greedy layer-wise training: train RBM i, propagate
        ``V ← rbm_i.transform(V)``, train RBM i+1 (reference :34-55)."""
        v_p = jnp.asarray(V)
        for i, rbm in enumerate(self.rbm_layers):
            if verbose:
                print(f"DBN stack {i + 1}/{self.num_layers}")
            rbm.fit(v_p, verbose=verbose, mesh=mesh)
            v_p = rbm.transform(v_p)
        return self

    def transform(self, v, key=None):
        """Forward pass through the whole stack (reference :57-75)."""
        h = jnp.asarray(v)
        for rbm in self.rbm_layers:
            h = rbm.transform(h, key=None if key is None else key)
        return h

    def inv_transform(self, h, key=None):
        """Backward (generative) pass through the stack, last→first
        (reference intended behavior of :77-96)."""
        v = jnp.asarray(h)
        for rbm in reversed(self.rbm_layers):
            v = rbm.inv_transform(v, key=None if key is None else key)
        return v
