"""Restricted Boltzmann machine trained by contrastive divergence — TPU-native.

Reference: ku/ebm/rbm.py:19-242. Semantics reproduced exactly:

- Params: ``rbm_weight`` (V×H), ``hidden_bias`` (H), ``visible_bias`` (V),
  all initialized Uniform(−0.05, 0.05) (reference :30-40, Keras 'uniform').
- Bernoulli mode (:43-54): h sampled via ``uniform < sigmoid(vW + b_h)``,
  v sampled via ``uniform < sigmoid(hWᵀ + b_v)``.
- Gaussian mode (:56-67): h *sampled* via ``uniform < relu(vW + b_h)``
  (the reference's quirk, kept), v ~ Normal(hWᵀ + b_v, I). The
  negative-phase hidden **probabilities** h_neg use sigmoid in BOTH modes
  (reference :124 and :145 — even Gaussian-mode CD computes
  ``h_neg = K.sigmoid(...)``); see :func:`neg_hidden_prob`.
- Free energy (:73-76): ``−v·b_v − Σ log(1+exp(vW+b_h))`` (computed with
  softplus for overflow stability — same function, stable form).
- CD-k update (:121-134, k=1 in the reference): with h_pos *sampled* and
  h_neg the *probabilities* at the chain end,
  ``ΔW = lr·(v_posᵀ h_pos − v_negᵀ h_neg)``,
  ``Δb_h = lr·Σ(h_pos − h_neg)``, ``Δb_v = lr·Σ(v_pos − v_neg)``
  (raw sums over the batch, matching the reference's scaling).
- Per-step score = mean |F(v_pos) − F(ṽ₁)| with ṽ₁ the first sampled
  visible (reference :225-234).

TPU-native design: where the reference dispatches 5 separate ``K.function``
graphs per batch (reference :163-234 — the BASELINE.json hot loop), here an
*entire epoch* is one device call. Two backends:

- ``lax.scan`` oracle (:func:`cd_epoch_scan`) — reference semantics in pure
  jittable JAX, used for correctness oracles and autodiff.
- Fused Pallas kernel (:mod:`ku.pallas.cd_gibbs`) — weights resident in
  VMEM across the whole epoch, Gibbs sampling via the on-chip TPU PRNG,
  batches streamed HBM→VMEM by the Pallas pipeline (default on TPU).

Data parallelism: ``fit(..., mesh=...)`` shards the batch axis over the
mesh and ``psum``s the CD statistics — the TPU equivalent of the
reference's vestigial ``multi_gpu`` flags (see SURVEY §2.5).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ku.core.rng import KeySeq

MODE_VISIBLE_BERNOULLI = 0
MODE_VISIBLE_GAUSSIAN = 1
# MODE_COMPLEX is a named-but-dead constant in the reference (:16 — the
# build/fit branches are `pass`, :69/:161). ku implements it as a DOCUMENTED
# EXTENSION: a complex-Gaussian-visible / Bernoulli-hidden RBM in the style
# of Nakashika et al.'s complex-valued RBM (see PAPERS.md), using the
# stacked-real representation v ∈ ℂ^V ↔ [Re v, Im v] ∈ ℝ^{2V}:
#
#   E(v, h)      = ‖v − b_v‖² − 2·Re(v^H W h) − b_h·h
#   P(h_j=1 | v) = sigmoid(2·(v_r·W_r + v_i·W_i)_j + b_h,j)
#   v | h        ~ CN(b_v + W h, I)   (Re and Im parts each N(μ, ½))
#   F(v)         = ‖v − b_v‖² − Σ_j softplus(2·Re(v^H W)_j + b_h,j)
#
# Parameters are stored stacked-real: rbm_weight (2V, H) = [[W_r],[W_i]],
# visible_bias (2V) = [b_vr, b_vi]; hidden_bias stays real (H). The CD-k
# statistics keep the reference's raw-sum form (constant factors from
# ∂E/∂θ fold into lr, as the reference's conventions do). The public
# surface accepts/returns complex64 arrays; the fused Pallas kernel
# (ku/pallas/cd_gibbs.py) covers all three modes, mode 2 via the doubled
# activation + σ=√½ Box-Muller sampling.
MODE_COMPLEX = 2


def init_rbm_params(key, input_dim: int, output_dim: int, dtype=jnp.float32):
    """Uniform(−0.05, 0.05) init, matching Keras 'uniform' (reference :30-40)."""
    k1, k2, k3 = jax.random.split(key, 3)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -0.05, 0.05)
    return {
        "rbm_weight": u(k1, (input_dim, output_dim)),
        "hidden_bias": u(k2, (output_dim,)),
        "visible_bias": u(k3, (input_dim,)),
    }


def complex_to_stacked(v):
    """ℂ^V → ℝ^{2V}: [Re v, Im v] (MODE_COMPLEX representation).

    Concrete arrays convert on the HOST (numpy): TPU backends do not
    implement complex dtypes on-device, so a complex jax.Array must never
    be materialized there. Tracers (inside jit, where the caller
    guarantees a CPU-lowerable graph) use the jnp path."""
    if isinstance(v, jax.core.Tracer):
        if jnp.iscomplexobj(v):
            return jnp.concatenate([v.real, v.imag], axis=-1)
        return v
    v = np.asarray(v)
    if np.iscomplexobj(v):
        v = np.concatenate([v.real, v.imag], axis=-1).astype(np.float32)
    return jnp.asarray(v)


def stacked_to_complex(v):
    """ℝ^{2V} → ℂ^V (inverse of :func:`complex_to_stacked`). Concrete
    arrays are assembled on the host (numpy complex64) — see
    :func:`complex_to_stacked` for why."""
    half = v.shape[-1] // 2
    if isinstance(v, jax.core.Tracer):
        return jax.lax.complex(v[..., :half], v[..., half:])
    v = np.asarray(v)
    return (v[..., :half] + 1j * v[..., half:]).astype(np.complex64)


def hidden_prob(params, v, mode: int = MODE_VISIBLE_BERNOULLI):
    """P(h|v) for *sampling* h: sigmoid (Bernoulli), relu (the
    Gaussian-mode quirk of the reference's transform, reference :58-59),
    or sigmoid of the doubled stacked-real activation (MODE_COMPLEX:
    2·Re(v^H W) + b_h — see the mode's derivation at the top)."""
    if mode == MODE_COMPLEX:
        act = 2.0 * (v @ params["rbm_weight"]) + params["hidden_bias"]
        return jax.nn.sigmoid(act)
    act = v @ params["rbm_weight"] + params["hidden_bias"]
    return jax.nn.sigmoid(act) if mode == MODE_VISIBLE_BERNOULLI else jax.nn.relu(act)


def neg_hidden_prob(params, v, mode: int = MODE_VISIBLE_BERNOULLI):
    """Negative-phase hidden probabilities h_neg: sigmoid in ALL modes.

    The reference computes ``h_neg = K.sigmoid(v_neg·W + b_h)`` in
    Bernoulli (:124) AND Gaussian (:145) mode — only the *sampling* path
    has the relu quirk. CD statistics must use this, not
    :func:`hidden_prob`. MODE_COMPLEX uses its doubled activation (there
    sampling and statistics agree — both sigmoid)."""
    if mode == MODE_COMPLEX:
        return hidden_prob(params, v, mode)
    act = v @ params["rbm_weight"] + params["hidden_bias"]
    return jax.nn.sigmoid(act)


def visible_stat(params, h):
    """Mean of P(v|h) pre-sampling: hWᵀ + b_v."""
    return h @ params["rbm_weight"].T + params["visible_bias"]


def sample_hidden(params, v, key, mode: int = MODE_VISIBLE_BERNOULLI):
    """Sample h ~ Bernoulli(P(h|v)) as float (reference :46-48, :58-59)."""
    p = hidden_prob(params, v, mode)
    u = jax.random.uniform(key, p.shape, p.dtype)
    return (u < p).astype(p.dtype)


def sample_visible(params, h, key, mode: int = MODE_VISIBLE_BERNOULLI):
    """Sample v: Bernoulli(sigmoid), Normal(mean, I) (reference :52-54,
    :64-67), or — MODE_COMPLEX — the stacked-real complex normal
    CN(b_v + Wh, I), i.e. each of Re/Im ~ N(μ, ½)."""
    stat = visible_stat(params, h)
    if mode == MODE_VISIBLE_BERNOULLI:
        p = jax.nn.sigmoid(stat)
        u = jax.random.uniform(key, p.shape, p.dtype)
        return (u < p).astype(p.dtype)
    if mode == MODE_COMPLEX:
        return stat + jnp.sqrt(0.5) * jax.random.normal(
            key, stat.shape, stat.dtype
        )
    return stat + jax.random.normal(key, stat.shape, stat.dtype)


def free_energy(params, v, mode: int = MODE_VISIBLE_BERNOULLI):
    """F(v) = −v·b_v − Σ softplus(vW + b_h) (reference :73-76; the
    reference applies this form in both of its modes). MODE_COMPLEX:
    F(v) = ‖v − b_v‖² − Σ softplus(2·Re(v^H W) + b_h) on stacked-real v."""
    if mode == MODE_COMPLEX:
        act = 2.0 * (v @ params["rbm_weight"]) + params["hidden_bias"]
        quad = jnp.sum((v - params["visible_bias"]) ** 2, axis=-1)
        return quad - jnp.sum(jax.nn.softplus(act), axis=-1)
    act = v @ params["rbm_weight"] + params["hidden_bias"]
    return -(v @ params["visible_bias"] + jnp.sum(jax.nn.softplus(act), axis=-1))


def cd_stats(params, v_pos, key, k: int = 1, mode: int = MODE_VISIBLE_BERNOULLI,
             weight=None):
    """CD-k sufficient statistics on a batch (no parameter update).

    Returns ``{'d_w', 'd_bh', 'd_bv', 'score_sum', 'count'}``; statistics
    are raw sums over rows so they add across data-parallel shards with a
    plain ``psum``. ``weight``: optional per-row 0/1 mask for padded
    batches; masked rows contribute nothing (the reference instead rebuilds
    its graphs for the ragged last batch, :163-223).
    """
    keys = jax.random.split(key, 2 * k + 1)
    h_pos = sample_hidden(params, v_pos, keys[0], mode)

    h = h_pos
    v_neg = None
    v_neg_first = None
    h_prob = None
    for i in range(k):
        v_neg = sample_visible(params, h, keys[1 + 2 * i], mode)
        if v_neg_first is None:
            v_neg_first = v_neg
        # Sigmoid in BOTH modes (reference :124/:145) — sampling keeps
        # the Gaussian relu quirk, the statistics do not.
        h_prob = neg_hidden_prob(params, v_neg, mode)
        if i < k - 1:
            h = sample_hidden(params, v_neg, keys[2 + 2 * i], mode)
    h_neg = h_prob  # probabilities at chain end (reference :124)

    if weight is None:
        w_col = jnp.ones((v_pos.shape[0], 1), v_pos.dtype)
    else:
        w_col = weight[:, None]
    v_pos_w, v_neg_w, h_pos_w, h_neg_w = (
        v_pos * w_col, v_neg * w_col, h_pos * w_col, h_neg * w_col,
    )

    fe = free_energy(params, v_pos, mode)
    fe_p = free_energy(params, v_neg_first, mode)
    w_row = w_col[:, 0]
    return {
        "d_w": v_pos_w.T @ h_pos - v_neg_w.T @ h_neg,
        "d_bh": jnp.sum(h_pos_w, axis=0) - jnp.sum(h_neg_w, axis=0),
        "d_bv": jnp.sum(v_pos_w, axis=0) - jnp.sum(v_neg_w, axis=0),
        "score_sum": jnp.sum(jnp.abs(fe - fe_p) * w_row),
        "count": jnp.sum(w_row),
    }


def apply_stats(params, stats, lr):
    lr = jnp.asarray(lr, params["rbm_weight"].dtype)
    return {
        "rbm_weight": params["rbm_weight"] + lr * stats["d_w"],
        "hidden_bias": params["hidden_bias"] + lr * stats["d_bh"],
        "visible_bias": params["visible_bias"] + lr * stats["d_bv"],
    }


def cd_update(params, v_pos, key, lr, k: int = 1, mode: int = MODE_VISIBLE_BERNOULLI,
              weight=None):
    """One CD-k parameter update on a batch. Returns (params, score)."""
    stats = cd_stats(params, v_pos, key, k, mode, weight)
    new_params = apply_stats(params, stats, lr)
    score = stats["score_sum"] / jnp.maximum(stats["count"], 1.0)
    return new_params, score


def gibbs_chain(params, v0, k: int, key, mode: int = MODE_VISIBLE_BERNOULLI):
    """Run k full Gibbs sweeps v→h→v from ``v0``; returns v_k.

    Chain state stays on device across the whole scan (the "chains
    resident in HBM" sampler; no reference analogue — the reference can
    only draw single v→h→v round trips via its K.functions)."""

    def sweep(v, sub):
        kh, kv = jax.random.split(sub)
        h = sample_hidden(params, v, kh, mode)
        return sample_visible(params, h, kv, mode), None

    v_k, _ = jax.lax.scan(sweep, v0, jax.random.split(key, k))
    return v_k


@functools.partial(jax.jit, static_argnames=("lr", "k", "mode", "batch_size"))
def cd_epoch_scan_pcd(params, v_all, mask, chain, key, lr: float, k: int,
                      mode: int, batch_size: int):
    """Persistent CD (PCD) epoch: the negative phase continues a
    persistent fantasy chain instead of restarting from the data
    (Tieleman 2008; an extension beyond the reference's CD-1 — see
    PAPERS.md). Returns (params, scores, updated_chain)."""
    num_steps = v_all.shape[0] // batch_size
    v_batches = v_all.reshape(num_steps, batch_size, -1)
    m_batches = mask.reshape(num_steps, batch_size)

    def step(carry, xs):
        p, key, chain = carry
        v_b, m_b = xs
        key, k_pos, k_chain = jax.random.split(key, 3)

        h_pos = sample_hidden(p, v_b, k_pos, mode)
        # Negative phase from the persistent chain.
        chain_new = gibbs_chain(p, chain, k, k_chain, mode)
        h_neg = neg_hidden_prob(p, chain_new, mode)  # sigmoid, all modes

        w = m_b[:, None]
        stats = {
            "d_w": (v_b * w).T @ h_pos - (chain_new * w).T @ (h_neg * w),
            "d_bh": jnp.sum(h_pos * w, axis=0) - jnp.sum(h_neg * w, axis=0),
            "d_bv": jnp.sum(v_b * w, axis=0) - jnp.sum(chain_new * w, axis=0),
        }
        p = apply_stats(p, stats, lr)
        fe = free_energy(p, v_b, mode)
        fe_p = free_energy(p, chain_new, mode)
        score = jnp.sum(jnp.abs(fe - fe_p) * m_b) / jnp.maximum(
            jnp.sum(m_b), 1.0
        )
        return (p, key, chain_new), score

    (params, _, chain), scores = jax.lax.scan(
        step, (params, key, chain), (v_batches, m_batches)
    )
    return params, scores, chain


@functools.partial(jax.jit, static_argnames=("lr", "k", "mode", "batch_size"))
def cd_epoch_scan(params, v_all, mask, key, lr: float, k: int, mode: int,
                  batch_size: int):
    """One full CD epoch as a single jitted lax.scan over batches.

    ``v_all``: (num_steps·batch_size, V) padded data; ``mask``: matching
    0/1 row mask. Returns (params, per-step scores).
    """
    num_steps = v_all.shape[0] // batch_size
    v_batches = v_all.reshape(num_steps, batch_size, -1)
    m_batches = mask.reshape(num_steps, batch_size)

    def step(carry, xs):
        p, key = carry
        v_b, m_b = xs
        key, sub = jax.random.split(key)
        p, score = cd_update(p, v_b, sub, lr, k, mode, weight=m_b)
        return (p, key), score

    (params, _), scores = jax.lax.scan(step, (params, key), (v_batches, m_batches))
    return params, scores


class RBMLayer:
    """Flax-style module wrapper so an RBM can sit inside a larger model
    (the reference embeds RBM as a Keras layer: Input → /255 → RBM →
    Dense(10), examples/rbm/rbm_softmax_mnist.py:53-64; RBM.call at
    rbm.py:80-86 forwards a *sampled*, gradient-less Bernoulli draw, so
    RBM weights receive no supervised gradient — reproduced here with
    ``stop_gradient`` + optional deterministic probabilities).

    Usage::

        import flax.linen as nn

        class Classifier(nn.Module):
            @nn.compact
            def __call__(self, x, deterministic=True):
                h = RBMLayer.as_flax(output_dim=128)(x)
                return nn.Dense(10)(h)
    """

    @staticmethod
    def as_flax(output_dim: int, mode: int = MODE_VISIBLE_BERNOULLI,
                sample: bool = False, trainable: bool = False):
        import flax.linen as nn

        def _uniform_pm(key, shape, dtype=jnp.float32):
            # Keras 'uniform' = U(−0.05, 0.05) (NOT jax's U[0, scale)).
            return jax.random.uniform(key, shape, dtype, -0.05, 0.05)

        class _RBMLayer(nn.Module):
            features: int = output_dim

            @nn.compact
            def __call__(self, v, deterministic: bool = True):
                w = self.param(
                    "rbm_weight", _uniform_pm, (v.shape[-1], self.features)
                )
                bh = self.param(
                    "hidden_bias", _uniform_pm, (self.features,)
                )
                if not trainable:
                    w = jax.lax.stop_gradient(w)
                    bh = jax.lax.stop_gradient(bh)
                act = v @ w + bh
                p = (jax.nn.sigmoid(act) if mode == MODE_VISIBLE_BERNOULLI
                     else jax.nn.relu(act))
                if sample and not deterministic:
                    u = jax.random.uniform(self.make_rng("sample"), p.shape,
                                           p.dtype)
                    return jax.lax.stop_gradient((u < p).astype(p.dtype))
                return p

        return _RBMLayer()


class RBM:
    """RBM with the reference's surface: ``fit`` / ``transform`` /
    ``inv_transform`` / ``cal_free_energy`` (reference ku/ebm/rbm.py:19-242).

    ``hps``: dict with ``lr``, ``batch_size``, ``epochs`` (reference conf
    contract, examples/rbm/rbm_softmax_mnist_conf.json). Extra keys
    ``k`` (Gibbs steps, default 1) and ``backend`` ('pallas' on TPU,
    'scan' elsewhere) extend the surface.
    """

    def __init__(self, hps, output_dim: int, input_dim: Optional[int] = None,
                 name: Optional[str] = None, mode: int = MODE_VISIBLE_BERNOULLI,
                 seed: int = 0):
        self.hps = dict(hps)
        self.output_dim = int(output_dim)
        self.name = name
        self.mode = mode
        self._keys = KeySeq(seed)
        self.params = None
        if input_dim is not None:
            self.build(input_dim)

    # -- construction ------------------------------------------------------

    def build(self, input_dim: int):
        """``input_dim`` counts COMPLEX units in MODE_COMPLEX (the stored
        stacked-real parameters then have 2·input_dim visible rows)."""
        self.input_dim = int(input_dim)
        stored_dim = (2 * self.input_dim if self.mode == MODE_COMPLEX
                      else self.input_dim)
        self.params = init_rbm_params(self._keys(), stored_dim, self.output_dim)
        return self

    def _ensure_built(self, v):
        if self.params is None:
            self.build(np.shape(v)[-1])

    def _to_internal(self, v):
        """Public (possibly complex) visible array → internal stacked-real.
        Complex input converts on the host (TPU has no complex dtype)."""
        if self.mode != MODE_COMPLEX:
            return jnp.asarray(v)
        if isinstance(v, jax.core.Tracer):
            return complex_to_stacked(v) if jnp.iscomplexobj(v) else v
        if np.iscomplexobj(v) or jnp.iscomplexobj(v):
            return complex_to_stacked(v)
        v = jnp.asarray(v)
        if v.shape[-1] == self.params["visible_bias"].shape[0]:
            return v  # caller already stacked
        raise ValueError(
            f"MODE_COMPLEX expects complex input of dim {self.input_dim} "
            f"or stacked-real of dim {2 * self.input_dim}, got {v.shape}"
        )

    # -- inference surface (reference :80-98) ------------------------------

    def __call__(self, v, key=None):
        return self.transform(v, key)

    def transform(self, v, key=None):
        """Sample hidden units given visible (reference :88-89).
        MODE_COMPLEX accepts complex64 input."""
        self._ensure_built(v)
        key = self._keys() if key is None else key
        return sample_hidden(self.params, self._to_internal(v), key, self.mode)

    def inv_transform(self, h, key=None):
        """Sample visible units given hidden (reference :91-92).
        MODE_COMPLEX returns complex64."""
        key = self._keys() if key is None else key
        v = sample_visible(self.params, jnp.asarray(h), key, self.mode)
        return stacked_to_complex(v) if self.mode == MODE_COMPLEX else v

    def cal_free_energy(self, v):
        """Free energy of visible configurations (reference :97-98)."""
        self._ensure_built(v)
        return free_energy(self.params, self._to_internal(v), self.mode)

    def sample(self, num_samples: int, num_steps: int = 100, v0=None,
               key=None):
        """Draw samples by running a Gibbs chain for ``num_steps`` sweeps
        (no reference analogue; chain state device-resident throughout)."""
        key = self._keys() if key is None else key
        k0, k1 = jax.random.split(key)
        if v0 is None:
            if self.mode == MODE_COMPLEX:
                v0 = jax.random.normal(k0, (num_samples, 2 * self.input_dim))
            else:
                v0 = (jax.random.uniform(k0, (num_samples, self.input_dim))
                      < 0.5).astype(jnp.float32)
        else:
            v0 = self._to_internal(v0)
        out = gibbs_chain(self.params, jnp.asarray(v0), num_steps, k1,
                          self.mode)
        return stacked_to_complex(out) if self.mode == MODE_COMPLEX else out

    # -- training (reference :100-234) -------------------------------------

    def fit(self, V, verbose: int = 1, mesh=None):
        """Train with CD-k. One device call per epoch (vs the reference's
        5 host dispatches per *batch*, :163-234).

        ``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis for
        data-parallel training (batch sharded, statistics psum'd).
        """
        if self.mode == MODE_COMPLEX:
            self._ensure_built(np.asarray(V))
            V = np.asarray(self._to_internal(V), np.float32)
        else:
            V = np.asarray(V, np.float32)
            self._ensure_built(V)
        batch_size = int(self.hps["batch_size"])
        epochs = int(self.hps["epochs"])
        lr = float(self.hps["lr"])
        k = int(self.hps.get("k", 1))
        backend = self.hps.get("backend")
        if backend is None:
            backend = "pallas" if jax.default_backend() == "tpu" else "scan"
        if backend == "pallas" and jax.default_backend() != "tpu":
            # Interpret-mode TPU PRNG is a zero stub — sampling would be
            # degenerate. Never train with it off-TPU.
            import warnings

            warnings.warn("backend='pallas' requires a TPU; falling back to "
                          "'scan' (the interpreter's PRNG is a zero stub)")
            backend = "scan"
        if backend == "pallas":
            # VMEM guard: the fused kernel keeps W (Vp×Hp), the batch
            # block, and chain activations resident in VMEM (~16 MB/core).
            vp = -(-V.shape[1] // 128) * 128
            hp = -(-self.output_dim // 128) * 128
            vmem_bytes = 4 * (
                vp * hp            # weights
                + 2 * batch_size * vp  # v blocks (pipeline double-buffer)
                + 2 * batch_size * hp  # h activations
            )
            if vmem_bytes > 12 * 1024 * 1024:
                backend = "scan"  # XLA will tile HBM-resident matmuls

        n = V.shape[0]
        num_steps = -(-n // batch_size)
        padded = num_steps * batch_size
        v_all = np.zeros((padded, V.shape[1]), np.float32)
        v_all[:n] = V
        mask = np.zeros((padded,), np.float32)
        mask[:n] = 1.0

        if mesh is not None:
            v_all_d = jnp.asarray(v_all)
            mask_d = jnp.asarray(mask)
            n_dev = mesh.shape.get("data", 1)
            if backend == "pallas" and batch_size % max(n_dev, 1) == 0:
                # Fused multi-chip path: the whole run is one dispatch per
                # device, params VMEM-resident, CD statistics ring-psum'd
                # inside the kernel each step (ku/pallas/cd_gibbs.py::
                # cd_train_pallas_dp). Chunk epochs like the single-device
                # path so the VMEM-resident (epochs·steps, 128) score
                # buffer stays bounded.
                from ku.pallas.cd_gibbs import cd_train_pallas_dp

                num_steps_dp = v_all.shape[0] // batch_size
                max_epochs_per_call = max(
                    1, (2 * 1024 * 1024) // max(num_steps_dp * 128 * 4, 1)
                )
                done = 0
                all_scores = []
                while done < epochs:
                    chunk = min(max_epochs_per_call, epochs - done)
                    self.params, scores = cd_train_pallas_dp(
                        mesh, self.params, v_all_d, mask_d, self._keys(),
                        lr, k, self.mode, batch_size, chunk,
                    )
                    all_scores.append(np.asarray(scores))
                    if verbose:
                        per_epoch = all_scores[-1].reshape(chunk, -1).mean(1)
                        for i, s in enumerate(per_epoch):
                            print(f"{done + i + 1}/{epochs} epochs, "
                                  f"score: {s:f}")
                    done += chunk
                self.last_scores = (np.concatenate(all_scores)
                                    if all_scores else None)
                return self
            from ku.dist.mesh import cd_epoch_dp

            scores = None
            for e in range(epochs):
                self.params, scores = cd_epoch_dp(
                    mesh, self.params, v_all_d, mask_d, self._keys(), lr, k,
                    self.mode, batch_size,
                )
                if verbose:
                    print(f"{e + 1}/{epochs} epochs, "
                          f"score: {float(jnp.mean(scores)):f}")
            self.last_scores = None if scores is None else np.asarray(scores)
            return self

        v_all_d = jnp.asarray(v_all)
        mask_d = jnp.asarray(mask)
        scores = None

        if self.hps.get("persistent"):
            # PCD: persistent fantasy chain across batches AND epochs.
            chain = jnp.asarray(v_all[:batch_size])
            for e in range(epochs):
                self.params, scores, chain = cd_epoch_scan_pcd(
                    self.params, v_all_d, mask_d, chain, self._keys(), lr, k,
                    self.mode, batch_size,
                )
                if verbose:
                    print(f"{e + 1}/{epochs} epochs, "
                          f"score: {float(jnp.mean(scores)):f}")
            self.last_scores = np.asarray(scores)
            return self

        if backend == "pallas":
            # The whole multi-epoch run is ONE kernel dispatch — chunked so
            # the VMEM-resident (epochs·steps, 128) score buffer stays
            # small (see cd_gibbs.py out_specs).
            from ku.pallas.cd_gibbs import cd_train_pallas

            num_steps = padded // batch_size
            max_epochs_per_call = max(
                1, (2 * 1024 * 1024) // max(num_steps * 128 * 4, 1)
            )
            done = 0
            all_scores = []
            while done < epochs:
                chunk = min(max_epochs_per_call, epochs - done)
                self.params, scores = cd_train_pallas(
                    self.params, v_all_d, mask_d, self._keys(), lr, k,
                    self.mode, batch_size, chunk,
                )
                all_scores.append(np.asarray(scores))
                if verbose:
                    per_epoch = all_scores[-1].reshape(chunk, -1).mean(axis=1)
                    for i, s in enumerate(per_epoch):
                        print(f"{done + i + 1}/{epochs} epochs, score: {s:f}")
                done += chunk
            scores = np.concatenate(all_scores)
        else:
            for e in range(epochs):
                self.params, scores = cd_epoch_scan(
                    self.params, v_all_d, mask_d, self._keys(), lr, k,
                    self.mode, batch_size,
                )
                if verbose:
                    print(f"{e + 1}/{epochs} epochs, "
                          f"score: {float(jnp.mean(scores)):f}")
        self.last_scores = None if scores is None else np.asarray(scores)
        return self

    # -- persistence -------------------------------------------------------

    def get_config(self):
        """Reference :236-242."""
        return {
            "hps": self.hps,
            "output_dim": self.output_dim,
            "name": self.name,
            "mode": self.mode,
        }

    def save(self, name: str):
        from ku.utility import save_model_jh5

        save_model_jh5(self.get_config(), self.params, name)

    @classmethod
    def load(cls, name: str):
        from ku.utility import load_model_jh5

        spec, params = load_model_jh5(name)
        rbm = cls(spec["hps"], spec["output_dim"], name=spec.get("name"),
                  mode=spec.get("mode", MODE_VISIBLE_BERNOULLI))
        rbm.params = params
        stored = params["rbm_weight"].shape[0]
        rbm.input_dim = stored // 2 if rbm.mode == MODE_COMPLEX else stored
        return rbm
