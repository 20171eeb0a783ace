"""Energy-based models (reference ku/ebm)."""

from ku.ebm.rbm import (
    RBM,
    RBMLayer,
    MODE_VISIBLE_BERNOULLI,
    MODE_VISIBLE_GAUSSIAN,
    MODE_COMPLEX,
    init_rbm_params,
    complex_to_stacked,
    stacked_to_complex,
    hidden_prob,
    neg_hidden_prob,
    sample_hidden,
    sample_visible,
    free_energy,
    cd_update,
    cd_epoch_scan,
    cd_epoch_scan_pcd,
    gibbs_chain,
)
from ku.ebm.dbn import DBN
