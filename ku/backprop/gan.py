"""GAN training engine — five composing modes, one jitted alternating step.

Reference: ku/backprop/gan.py (1177 LoC). What the reference does:

- ``compose_gan_with_mode`` (:1002-1178) builds two composite Keras models
  per mode: **disc_ext** (trains D on [D(x) (+D(x) again for R1), D(G(z))]
  with G frozen) and **gen_disc** (trains G on D(G(z)) with D frozen),
  flipping ``trainable`` flags and compiling with ``run_eagerly=True``
  because the gradient-penalty losses need a persistent eager tape
  (:180,192).
- ``get_loss_conf`` (:44-92) returns per-mode loss lists + weights.
- ``fit_generator`` (:225-506) hand-rolls the dual-model loop: per batch
  step, k discriminator ``train_on_batch`` calls then one generator call —
  every call an eager host→device round trip.

TPU-native redesign (same capability, no composites, no eager):

- "Which model trains" is just *which param subtree gets the gradient*:
  ``disc_step`` differentiates the mode's disc loss wrt disc params only
  (G's forward is inside but its params are constants), ``gen_step`` the
  mode's gen loss wrt gen params only.
- Gradient penalties (R1 / WGAN-GP) are inner ``jax.grad``s wrt *inputs*
  inside the same jitted step — XLA fuses the grad-of-grad; nothing is
  eager.
- One ``train_step`` = k disc updates + 1 gen update (k static), jitted
  once; the whole alternating loop runs on device.
- Data parallelism: pass ``mesh=`` to shard the batch and psum gradients
  (the reference's ``multi_gpu`` flag is dead code, :1002).

The five modes keep the reference's constants and loss math:
regular/LSGAN (:1016-1051), WGAN-GP with interpolated-input head
(:1052-1090, interpolation ε~U[0,1] per sample), softplus-R1 (:1091-1126,
R1 on the real-input head :1110), pix2pix (:1127-1174, conditional input +
L1 reconstruction term on G(z) :1173).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ku.loss_ext.loss import (
    lsgan_loss,
    r_penalty_loss,
    softplus_inverse_loss,
    softplus_loss,
    wgan_gp_loss,
    wgan_loss,
)

# GAN mode (reference gan.py:31-35).
STYLE_GAN_REGULAR = 0
STYLE_GAN_WGAN_GP = 1
STYLE_GAN_SOFTPLUS_INVERSE_R1_GP = 2
LSGAN = 3
PIX2PIX_GAN = 4

# Loss configuration type (reference gan.py:38-41).
LOSS_CONF_TYPE_NON_SATURATION_REGULAR = 0
LOSS_CONF_TYPE_WGAN_GP = 1
LOSS_CONF_TYPE_NON_SATURATION_SOFTPLUS_R1_GP = 2
LOSS_CONF_TYPE_LS = 3


def _bce_logits(y_true, y_pred):
    """BinaryCrossentropy(from_logits=True) per-sample."""
    return jnp.mean(
        jnp.maximum(y_pred, 0.0) - y_pred * y_true
        + jnp.log1p(jnp.exp(-jnp.abs(y_pred))),
        axis=-1,
    )


def get_loss_conf(hps: Dict, lc_type: int, **kwargs) -> Dict:
    """Per-mode loss lists + weights (reference gan.py:44-92).

    Same dict contract: ``disc_ext_losses`` apply to
    [D(x), (R1/GP head), D(G(z))] in order, ``gen_disc_losses`` to
    [D(G(z))]. Penalty entries are marked with the string tags
    ``'r1'``/``'gp'`` — the engine wires them to input gradients.
    """
    if lc_type == LOSS_CONF_TYPE_NON_SATURATION_REGULAR:
        return {
            "disc_ext_losses": [_bce_logits, _bce_logits],
            "disc_ext_loss_weights": [1.0, 1.0],
            "gen_disc_losses": [_bce_logits],
            "gen_disc_loss_weights": [1.0],
        }
    if lc_type == LOSS_CONF_TYPE_WGAN_GP:
        return {
            "disc_ext_losses": [
                wgan_loss,
                wgan_loss,
                ("gp", hps.get("wgan_lambda", 10.0), hps.get("wgan_target", 1.0)),
            ],
            "disc_ext_loss_weights": [-1.0, 1.0, 1.0],
            "gen_disc_losses": [wgan_loss],
            "gen_disc_loss_weights": [-1.0],
        }
    if lc_type == LOSS_CONF_TYPE_NON_SATURATION_SOFTPLUS_R1_GP:
        return {
            "disc_ext_losses": [
                softplus_inverse_loss,
                ("r1", hps.get("r_gamma", 10.0)),
                softplus_loss,
            ],
            "disc_ext_loss_weights": [1.0, 1.0, 1.0],
            "gen_disc_losses": [softplus_inverse_loss],
            "gen_disc_loss_weights": [1.0],
        }
    if lc_type == LOSS_CONF_TYPE_LS:
        return {
            "disc_ext_losses": [lsgan_loss, lsgan_loss],
            "disc_ext_loss_weights": [1.0, 1.0],
            "gen_disc_losses": [lsgan_loss],
            "gen_disc_loss_weights": [1.0],
        }
    raise ValueError("type is not valid.")


_MODE_TO_LC = {
    STYLE_GAN_REGULAR: LOSS_CONF_TYPE_NON_SATURATION_REGULAR,
    STYLE_GAN_WGAN_GP: LOSS_CONF_TYPE_WGAN_GP,
    STYLE_GAN_SOFTPLUS_INVERSE_R1_GP: LOSS_CONF_TYPE_NON_SATURATION_SOFTPLUS_R1_GP,
    LSGAN: LOSS_CONF_TYPE_LS,
    PIX2PIX_GAN: LOSS_CONF_TYPE_NON_SATURATION_REGULAR,
}


class AbstractGAN:
    """GAN engine with the reference's surface (reference gan.py:95-999):
    ``compose_gan_with_mode`` → :meth:`compile`; ``fit_generator``;
    ``fit_generator_progressively``; ``generate``; ``save_gan_model``.

    Subclasses (or callers) provide:

    - ``gen``: flax module; ``gen.apply(vars, z, ...)`` → fake sample. May
      need rng streams (pass ``gen_rng_streams``) and mutable
      ``batch_stats`` (TruncationTrick's moving mean).
    - ``disc``: flax module; ``disc.apply(vars, x, ...)`` → logits. For
      pix2pix the call is ``disc.apply(vars, (cond, x))``.
    - Data: any iterator yielding dict batches with keys ``'x'`` (real),
      ``'z'`` (latent input pytree), optionally ``'cond'`` and ``'x_target'``
      (pix2pix L1 target = the real paired image).

    The conf dict follows the reference contract
    (``{mode, hps{...}, ...}``, reference :102-124).
    """

    GEN_DISC_PATH = "gen_disc"
    DISC_EXT_PATH = "disc_ext"

    def __init__(self, conf, gen=None, disc=None):
        self.conf = conf
        self.hps = dict(conf.get("hps", {}))
        self.nn_arch = dict(conf.get("nn_arch", {}))
        self.composing_mode = int(
            self.hps.get("composing_mode", STYLE_GAN_SOFTPLUS_INVERSE_R1_GP)
        )
        self.gen = gen if gen is not None else self._create_generator()
        self.disc = disc if disc is not None else self._create_discriminator()
        self.gen_rng_streams = tuple(self.nn_arch.get("gen_rng_streams", ()))
        self.state = None
        self._compiled = False
        if conf.get("model_loading"):
            self.load_gan_model()

    # Subclass hooks (reference abstract methods :130-138).
    def _create_generator(self):
        raise NotImplementedError

    def _create_discriminator(self):
        raise NotImplementedError

    # -- composition / compilation -----------------------------------------

    def compose_gan_with_mode(self, mode: Optional[int] = None):
        """Record the composing mode (reference :144-154). The composite
        models themselves don't exist here — the mode selects the jitted
        loss graph."""
        if mode is not None:
            self.composing_mode = mode
        self.loss_conf = get_loss_conf(self.hps, _MODE_TO_LC[self.composing_mode])
        return self

    def compile(self, disc_ext_opt=None, gen_disc_opt=None, loss_conf=None):
        """Build optimizers + the jitted alternating step (reference
        :156-193 — without the trainable-flag flipping or run_eagerly)."""
        if not hasattr(self, "loss_conf") or loss_conf is not None:
            self.loss_conf = loss_conf or get_loss_conf(
                self.hps, _MODE_TO_LC[self.composing_mode]
            )
        # The reference conf puts disc_ext_hps/gen_disc_hps at the top level
        # (style_based_gan_conf.json:50-63); accept them under hps too.
        d_hps = self.hps.get(
            "disc_ext_hps", self.conf.get("disc_ext_hps", self.hps)
        )
        g_hps = self.hps.get(
            "gen_disc_hps", self.conf.get("gen_disc_hps", self.hps)
        )
        # (measured: optax.flatten'ing these gains nothing on TPU — the
        # ravel/unravel concat offsets the per-tensor op savings — so the
        # plain per-tensor Adam stays for checkpoint/TP-sharding clarity)
        self.disc_opt = disc_ext_opt if disc_ext_opt is not None else optax.adam(
            d_hps.get("lr", 1e-4), b1=d_hps.get("beta_1", 0.0),
            b2=d_hps.get("beta_2", 0.99),
        )
        self.gen_opt = gen_disc_opt if gen_disc_opt is not None else optax.adam(
            g_hps.get("lr", 1e-3), b1=g_hps.get("beta_1", 0.0),
            b2=g_hps.get("beta_2", 0.99),
        )
        # load_gan_model() before compile() leaves opt states as None (no
        # optimizer existed to init them) — back-fill from the loaded params
        # so load → compile → fit works (reference reloads with
        # compile=False then re-compiles the same way, gan.py:111-124).
        if self.state is not None:
            if self.state.get("gen_opt") is None:
                self.state["gen_opt"] = self.gen_opt.init(
                    self.state["gen_params"]
                )
            if self.state.get("disc_opt") is None:
                self.state["disc_opt"] = self.disc_opt.init(
                    self.state["disc_params"]
                )
        self._rebind_jit()
        self._compiled = True
        return self

    def _rebind_jit(self):
        """(Re)bind the jitted steps so that new optimizers or swapped
        gen/disc modules never reuse a stale compiled graph (jit over the
        id-hashed ``self`` would). State is donated — optimizer/param
        buffers update in place."""
        self._train_step = jax.jit(
            self._train_step_inner, static_argnums=(2,), donate_argnums=(0,)
        )
        self._train_multi_step = jax.jit(
            self._train_multi_step_inner, static_argnums=(2,),
            donate_argnums=(0,),
        )
        if hasattr(self, "_gen_jit_fn"):
            del self._gen_jit_fn
        if hasattr(self, "_eval_jit_fn"):
            del self._eval_jit_fn

    def init_state(self, sample_batch, seed: int = 0):
        """Initialize params/opt states from one sample batch."""
        key = jax.random.key(seed)
        kg, kd = jax.random.split(key)
        gen_rngs = {"params": kg}
        for i, s in enumerate(self.gen_rng_streams):
            gen_rngs[s] = jax.random.fold_in(kg, i + 1)
        gen_vars = self.gen.init(gen_rngs, sample_batch["z"])
        fake, _ = self.gen.apply(
            gen_vars, sample_batch["z"],
            rngs={s: jax.random.fold_in(kg, 99 + i)
                  for i, s in enumerate(self.gen_rng_streams)},
            mutable=True,
        )
        disc_in = self._disc_input(sample_batch, self._gen_output_image(fake))
        disc_vars = self.disc.init({"params": kd}, disc_in)
        self.state = {
            "gen_params": gen_vars["params"],
            "gen_stats": gen_vars.get("batch_stats", {}),
            "disc_params": disc_vars["params"],
            "disc_stats": disc_vars.get("batch_stats", {}),
            "gen_opt": self.gen_opt.init(gen_vars["params"]),
            "disc_opt": self.disc_opt.init(disc_vars["params"]),
            "step": jnp.zeros((), jnp.int32),
        }
        return self

    # -- apply helpers ------------------------------------------------------

    def _gen_output_image(self, fake):
        """Generators may return (image, aux...); the image feeds D."""
        return fake[0] if isinstance(fake, (tuple, list)) else fake

    def _gen_apply(self, params, stats, z, key, train: bool):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        rngs = {s: jax.random.fold_in(key, i)
                for i, s in enumerate(self.gen_rng_streams)}
        if train and stats:
            out, mut = self.gen.apply(
                variables, z, rngs=rngs, mutable=["batch_stats"],
                deterministic=False,
            )
            return out, mut["batch_stats"]
        out = self.gen.apply(variables, z, rngs=rngs,
                             deterministic=not train)
        return out, stats

    def _disc_input(self, batch, x):
        if self.composing_mode == PIX2PIX_GAN:
            return (batch["cond"], x)
        if "label" in batch:
            return (x, batch["label"])
        return x

    def _disc_apply(self, params, stats, disc_in):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        return self.disc.apply(variables, disc_in)

    _REMAT_POLICIES = {
        # Save matmul/conv outputs; recompute elementwise chains in the
        # backward (XLA fuses the recompute into the bwd fusions, cutting
        # HBM round trips on a traffic-bound step).
        "dots": "dots_saveable",
        # Same but batched matmuls are NOT saved either (max recompute).
        "dots_no_batch": "dots_with_no_batch_dims_saveable",
        # Save only the function inputs (full recompute).
        "nothing": "nothing_saveable",
    }

    def _remat(self, fn, which: str):
        """Optionally wrap ``fn`` in ``jax.checkpoint`` per
        ``hps['remat']`` / ``hps['remat_gen']`` / ``hps['remat_disc']``
        (policy names: dots | dots_no_batch | nothing). Default: off —
        on the reference StyleGAN conf every policy measured SLOWER
        (dots 19.1 / disc-only 18.6 / nothing 24.6 vs 16.8 ms/step,
        benchmarks/stylegan_backward_ab.py): the step's backward is
        traffic-bound with no fat saved-intermediate redundancy, so
        recompute adds passes instead of removing them. A remat policy
        changes only WHAT the backward recomputes, never the math —
        useful for memory-constrained (bigger-model) configs."""
        name = self.hps.get(f"remat_{which}", self.hps.get("remat"))
        if not name:
            return fn
        policy = getattr(jax.checkpoint_policies,
                         self._REMAT_POLICIES[str(name)])
        return jax.checkpoint(fn, policy=policy)

    # -- the jitted alternating step ---------------------------------------

    def _gen_fake(self, state, batch, key):
        """Generate the (stop-gradient) fake batch for a D step."""
        fake_raw, _ = self._gen_apply(
            state["gen_params"], state["gen_stats"], batch["z"], key,
            train=True,
        )
        return jax.lax.stop_gradient(self._gen_output_image(fake_raw))

    def _disc_loss(self, disc_params, state, batch, key, fake=None,
                   lazy_r1: bool = True):
        """Mode-dependent discriminator loss (one D step). ``fake``: the
        pre-generated fake batch (the train step generates all D-steps'
        fakes in ONE vmapped pass — gen params don't change during D
        updates); generated here when absent (evaluate path).
        ``lazy_r1=False`` forces the always-on R1 penalty regardless of
        ``hps['r1_interval']`` — evaluation losses must not depend on
        which training step the model happens to be at."""
        lc = self.loss_conf
        losses = lc["disc_ext_losses"]
        weights = lc["disc_ext_loss_weights"]
        mode = self.composing_mode

        if fake is None:
            fake = self._gen_fake(state, batch, key)
        x_real = batch["x"]

        def d_of(x):
            return self._disc_apply(disc_params, state["disc_stats"],
                                    self._disc_input(batch, x))

        d_of = self._remat(d_of, "disc")

        # One BATCHED discriminator pass over [real; fake] instead of two
        # half-size passes: vmap over a stacked leading axis doubles the
        # effective batch of every disc op (better MXU/VPU row utilization
        # at small batch) while keeping EXACT per-12-batch semantics —
        # minibatch-stddev groups never straddle the real/fake halves
        # (plain concatenation would mix them; vmap cannot).
        #
        # In the always-on-R1 softplus mode, take the stacked pass through
        # jax.vjp so the R1 input gradient REUSES this forward's
        # activations instead of re-running D(x_real) (exact same values —
        # the separate jax.grad recomputed an identical forward).
        # Default OFF — measured SLOWER on the reference StyleGAN conf
        # (17.85 vs 16.76 ms/step, benchmarks/stylegan_backward_ab.py):
        # the stacked vjp backward runs with a zero cotangent on the fake
        # half that XLA does not eliminate, costing more than the saved
        # disc forward. Kept as a knob with exactness tests.
        interval = (int(self.hps.get("r1_interval", 1)) if lazy_r1 else 1)
        fused_r1 = (
            mode == STYLE_GAN_SOFTPLUS_INVERSE_R1_GP and interval == 1
            and bool(self.hps.get("r1_fused_vjp", False))
        )
        x_stack = jnp.stack([x_real, fake])
        if fused_r1:
            d_stack, d_vjp = jax.vjp(jax.vmap(d_of), x_stack)
            d_real, d_fake = d_stack[0], d_stack[1]
        else:
            d_real, d_fake = jax.vmap(d_of)(x_stack)
        ones = jnp.ones_like(d_real)
        zeros = jnp.zeros_like(d_fake)

        if mode in (STYLE_GAN_REGULAR, LSGAN, PIX2PIX_GAN):
            total = weights[0] * jnp.mean(losses[0](ones, d_real)) + weights[
                1
            ] * jnp.mean(losses[1](zeros, d_fake))
        elif mode == STYLE_GAN_WGAN_GP:
            # Interpolated-input head (reference :1070-1075).
            eps = jax.random.uniform(
                jax.random.fold_in(key, 7),
                (x_real.shape[0],) + (1,) * (x_real.ndim - 1),
            )
            x_interp = eps * x_real + (1.0 - eps) * fake
            grads = jax.grad(lambda xx: jnp.sum(d_of(xx)))(x_interp)
            _, lam, target = losses[2]
            total = (
                weights[0] * jnp.mean(losses[0](ones, d_real))
                + weights[1] * jnp.mean(losses[1](zeros, d_fake))
                + weights[2] * jnp.mean(wgan_gp_loss(grads, lam, target))
            )
        elif mode == STYLE_GAN_SOFTPLUS_INVERSE_R1_GP:
            # R1 on the real-input head (reference :1110 + loss conf :75-83).
            _, r_gamma = losses[1]

            def r1_term():
                grads = jax.grad(lambda xx: jnp.sum(d_of(xx)))(x_real)
                return jnp.mean(r_penalty_loss(grads, r_gamma))

            if fused_r1:
                # Input grad from the shared stacked forward: cotangent of
                # ones on the real half, zeros on the fake half.
                (gx,) = d_vjp(jnp.stack([ones, zeros]))
                r1 = jnp.mean(r_penalty_loss(gx[0], r_gamma))
            elif interval > 1:
                # Lazy regularization (StyleGAN2, Karras et al. 2020 §B):
                # apply the R1 penalty every `r1_interval` train steps,
                # scaled by the interval so the time-averaged strength is
                # unchanged. Cuts the grad-of-grad (the most expensive part
                # of the D step) from every step to 1/interval of steps.
                # Extension knob — the reference (interval=1) penalizes
                # every step, which stays the default.
                r1 = jax.lax.cond(
                    state["step"] % interval == 0,
                    lambda: r1_term() * float(interval),
                    lambda: jnp.zeros((), d_real.dtype),
                )
            else:
                r1 = r1_term()
            total = (
                weights[0] * jnp.mean(losses[0](ones, d_real))
                + weights[1] * r1
                + weights[2] * jnp.mean(losses[2](zeros, d_fake))
            )
        else:
            raise ValueError("mode is not valid.")
        return total

    def _gen_loss(self, gen_params, state, batch, key):
        lc = self.loss_conf
        losses = lc["gen_disc_losses"]
        weights = lc["gen_disc_loss_weights"]

        gen_fn = self._remat(
            lambda p: self._gen_apply(p, state["gen_stats"], batch["z"], key,
                                      train=True),
            "gen",
        )
        fake_raw, new_stats = gen_fn(gen_params)
        fake = self._gen_output_image(fake_raw)
        d_fn = self._remat(
            lambda xx: self._disc_apply(
                state["disc_params"], state["disc_stats"],
                self._disc_input(batch, xx),
            ),
            "disc",
        )
        d_fake = d_fn(fake)
        ones = jnp.ones_like(d_fake)
        total = weights[0] * jnp.mean(losses[0](ones, d_fake))
        if self.composing_mode == PIX2PIX_GAN:
            # L1 reconstruction on G(z) (reference gen_disc z_outputs :1173).
            # Target: 'x_target' when the batch provides one (documented
            # contract), else the real image 'x'.
            l1_w = self.hps.get("pix2pix_l1_weight", 100.0)
            l1_target = batch["x_target"] if "x_target" in batch else batch["x"]
            total = total + l1_w * jnp.mean(jnp.abs(fake - l1_target))
        return total, new_stats

    def _train_multi_step_inner(self, state, batches_stacked,
                                disc_k_step: int, key):
        """S fused train steps per dispatch: lax.scan over a leading
        steps axis of (S, k, batch, ...) stacked batches. Amortizes
        dispatch latency for small models (hps key ``steps_per_call``)."""

        def one(carry, xs):
            st, key = carry
            batches, i = xs
            key = jax.random.fold_in(key, i)
            st, d_loss, g_loss = self._train_step_inner(
                st, batches, disc_k_step, key
            )
            return (st, key), (d_loss, g_loss)

        s = jax.tree.leaves(batches_stacked)[0].shape[0]
        (state, _), (d_losses, g_losses) = jax.lax.scan(
            one, (state, key), (batches_stacked, jnp.arange(s))
        )
        return state, d_losses, g_losses

    def _train_step_inner(self, state, batches, disc_k_step: int, key):
        """k disc updates + 1 gen update, all on device (replaces the
        reference's per-batch eager train_on_batch loop :739-786).

        ``batches`` is a stack of ``disc_k_step + 1`` batches: the first k
        feed the discriminator updates and the LAST one is a FRESH batch
        for the generator update — matching the reference, which draws a
        new batch (new z, new reals) via ``gen_gen_disc_data_fun`` for the
        G step (reference gan.py:774) instead of reusing the last D batch.

        All D-steps' fake images are generated in ONE vmapped generator
        pass up front (exact semantics — generator params don't change
        during the D updates, and per-slice RNG keys reproduce the
        per-step draws), batching every generator op at k·B rows.
        """
        d_stack = jax.tree.map(lambda x: x[:disc_k_step], batches)
        d_keys = jnp.stack(
            [jax.random.fold_in(key, i) for i in range(disc_k_step)]
        )
        fakes = jax.vmap(
            lambda b, kk: self._gen_fake(state, b, kk)
        )(d_stack, d_keys)

        d_losses = []
        for i in range(disc_k_step):
            batch = jax.tree.map(lambda x: x[i], batches)
            k_i = jax.random.fold_in(key, i)
            d_loss, d_grads = jax.value_and_grad(self._disc_loss)(
                state["disc_params"], state, batch, k_i, fakes[i]
            )
            updates, d_opt = self.disc_opt.update(
                d_grads, state["disc_opt"], state["disc_params"]
            )
            state = dict(state)
            state["disc_params"] = optax.apply_updates(
                state["disc_params"], updates
            )
            state["disc_opt"] = d_opt
            d_losses.append(d_loss)

        g_batch = jax.tree.map(lambda x: x[disc_k_step], batches)
        g_key = jax.random.fold_in(key, 1000)
        (g_loss, new_stats), g_grads = jax.value_and_grad(
            self._gen_loss, has_aux=True
        )(state["gen_params"], state, g_batch, g_key)
        updates, g_opt = self.gen_opt.update(
            g_grads, state["gen_opt"], state["gen_params"]
        )
        state = dict(state)
        state["gen_params"] = optax.apply_updates(state["gen_params"], updates)
        state["gen_opt"] = g_opt
        state["gen_stats"] = new_stats
        state["step"] = state["step"] + 1
        return state, jnp.stack(d_losses), g_loss

    # -- training loops -----------------------------------------------------

    def fit_generator(self, generator, verbose: int = 1, seed: int = 0,
                      mesh=None, callbacks=(), initial_epoch=0):
        """Alternating training from a batch iterator (reference :225-506).

        ``generator`` yields dict batches; ``hps``: ``epochs``,
        ``batch_step`` (steps per epoch), ``disc_k_step`` (D steps per G
        step, reference conf key). Each logical step consumes
        ``disc_k_step + 1`` batches — k for the D updates plus a FRESH one
        for the G update (reference gan.py:774).

        ``mesh``: optional ``jax.sharding.Mesh``. With a ``'data'`` axis
        the batch is sharded over it (gradients all-reduce over ICI via
        GSPMD); with a ``'model'`` axis, mapping/style matmuls are
        tensor-parallel (see ku/dist/mesh.py:shard_gan_state). This is the
        working replacement for the reference's dead ``multi_gpu`` flag
        (:1002).

        ``initial_epoch``: epoch to resume from (reference :392 —
        ``_maybe_load_initial_epoch_from_ckpt``). Pass an int, or
        ``"auto"`` to restore the latest checkpoint from any
        :class:`~ku.utils.callbacks.CheckpointCallback` in ``callbacks``
        and continue from the epoch after it.

        Per-batch observability: callbacks receive
        ``on_train_batch_end(engine, step, logs)`` after every logical
        batch step (reference :426-434 routes train_on_batch logs the same
        way). With ``steps_per_call`` fusion the per-step losses come from
        the scanned loss arrays, so granularity is preserved.
        """
        epochs = int(self.hps.get("epochs", 1))
        batch_step = int(self.hps.get("batch_step", 1))
        disc_k_step = int(self.hps.get("disc_k_step", 1))
        steps_per_call = max(1, int(self.hps.get("steps_per_call", 1)))
        if not self._compiled:
            self.compile()
        key = jax.random.key(seed)
        it = iter(generator)
        if mesh is not None:
            from ku.dist import shard_gan_state, shard_stacked_batches

        def _stack(dicts):
            return jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *dicts
            )

        for cb in callbacks:
            cb.on_train_begin(self)
        if initial_epoch == "auto":
            initial_epoch = 0
            if any(hasattr(cb, "maybe_restore") for cb in callbacks):
                if self.state is None:
                    # Restore needs a state template: init from a peeked
                    # batch, then put it back on the iterator.
                    import itertools

                    first = next(it)
                    it = itertools.chain([first], it)
                    self.init_state(jax.tree.map(jnp.asarray, first),
                                    seed=seed)
                    if mesh is not None:
                        self.state = shard_gan_state(self.state, mesh)
                for cb in callbacks:
                    if hasattr(cb, "maybe_restore"):
                        restored = cb.maybe_restore(self)
                        if restored is not None:
                            initial_epoch = max(initial_epoch, restored + 1)
        initial_epoch = int(initial_epoch)
        history = {"disc_ext_loss": [], "gen_disc_loss": []}
        self.stop_training = False
        for e in range(initial_epoch, epochs):
            d_losses, g_losses = [], []
            s = 0
            while s < batch_step:
                n_fused = min(steps_per_call, batch_step - s)
                groups = [
                    _stack([next(it) for _ in range(disc_k_step + 1)])
                    for _ in range(n_fused)
                ]
                if self.state is None:
                    self.init_state(
                        jax.tree.map(lambda x: x[0], groups[0]), seed=seed
                    )
                    if mesh is not None:
                        self.state = shard_gan_state(self.state, mesh)
                key = jax.random.fold_in(key, e * batch_step + s)
                if n_fused == 1:
                    batches = groups[0]
                    if mesh is not None:
                        batches = shard_stacked_batches(batches, mesh)
                    self.state, d_loss, g_loss = self._train_step(
                        self.state, batches, disc_k_step, key
                    )
                    step_logs = [
                        {"disc_ext_loss": float(jnp.mean(d_loss)),
                         "gen_disc_loss": float(g_loss)}
                    ]
                else:
                    stacked = _stack(groups)
                    if mesh is not None:
                        stacked = shard_stacked_batches(stacked, mesh,
                                                        batch_axis=2)
                    self.state, d_loss, g_loss = self._train_multi_step(
                        self.state, stacked, disc_k_step, key
                    )
                    d_np = np.asarray(d_loss)  # (n_fused, k)
                    g_np = np.asarray(g_loss)  # (n_fused,)
                    step_logs = [
                        {"disc_ext_loss": float(d_np[i].mean()),
                         "gen_disc_loss": float(g_np[i])}
                        for i in range(n_fused)
                    ]
                for i, logs_i in enumerate(step_logs):
                    d_losses.append(logs_i["disc_ext_loss"])
                    g_losses.append(logs_i["gen_disc_loss"])
                    for cb in callbacks:
                        if hasattr(cb, "on_train_batch_end"):
                            cb.on_train_batch_end(self, s + i, logs_i)
                s += n_fused
            history["disc_ext_loss"].append(float(np.mean(d_losses)))
            history["gen_disc_loss"].append(float(np.mean(g_losses)))
            if verbose:
                print(
                    f"Epoch {e + 1}/{epochs}, disc_ext loss: "
                    f"{history['disc_ext_loss'][-1]:f}, gen_disc loss: "
                    f"{history['gen_disc_loss'][-1]:f}"
                )
            logs = {"disc_ext_loss": history["disc_ext_loss"][-1],
                    "gen_disc_loss": history["gen_disc_loss"][-1]}
            for cb in callbacks:
                cb.on_epoch_end(self, e, logs)
            if self.stop_training:  # reference stop flag (gan.py:396-397)
                break
        for cb in callbacks:
            cb.on_train_end(self, history)
        return history

    def _prog_stage_setup(self, e: int, generator_factory, gen_prog_depths,
                          disc_prog_depths, seed: int, mesh,
                          prev_state=None):
        """Build stage ``e``'s modules + iterator, init state at the new
        depth, and seed shared-name params from ``prev_state``."""
        import itertools

        g_d = gen_prog_depths[e] if e < len(gen_prog_depths) else None
        d_d = disc_prog_depths[e] if e < len(disc_prog_depths) else None
        self.gen, self.disc, it = generator_factory(e, g_d, d_d)
        if not self._compiled:
            self.compile()
        self._rebind_jit()  # new modules → never reuse the old graph

        # Re-init at the new depth and SEED shared-name params from the
        # previous stage BEFORE training (seeding after training would
        # discard the stage's learning of shared layers).
        it = iter(it)
        first = next(it)
        it = itertools.chain([first], it)
        self.state = None
        self.init_state(jax.tree.map(jnp.asarray, first), seed=seed + e)
        if prev_state is not None:
            self.state["gen_params"] = _merge_shared(
                self.state["gen_params"], prev_state["gen_params"]
            )
            self.state["disc_params"] = _merge_shared(
                self.state["disc_params"], prev_state["disc_params"]
            )
        if mesh is not None:
            from ku.dist import shard_gan_state

            self.state = shard_gan_state(self.state, mesh)
        return it

    def fit_generator_progressively(self, generator_factory,
                                    gen_prog_depths: Sequence[int] = (),
                                    disc_prog_depths: Sequence[int] = (),
                                    verbose: int = 1, seed: int = 0,
                                    mesh=None, callbacks=(),
                                    initial_epoch=0):
        """Progressive training (reference :508-804): per scheduled epoch
        the models are rebuilt at the scheduled depth and trained with the
        same inner loop. Depth-parameterized generators/discriminators
        (e.g. StyleGAN's ``depth`` argument) replace ``create_prog_model``;
        one jitted step per distinct depth (retrace only at depth change).

        ``generator_factory(epoch, gen_depth, disc_depth)`` returns
        (gen_module, disc_module, batch_iterator) for that stage. Params
        persist across stages per flax name-based trees (shared layer names
        keep their weights).

        ``mesh``/``callbacks`` thread into every stage's inner loop (the
        reference's progressive loop inherits the callback machinery the
        same way, reference gan.py:694-757); each stage's
        ``on_epoch_end`` fires with the GLOBAL stage index, so a
        :class:`~ku.utils.callbacks.CheckpointCallback` writes per-stage
        checkpoints. ``initial_epoch``: stage to resume from, or
        ``"auto"`` to restore the latest per-stage checkpoint — stage
        ``k``'s state is restored into stage-``k`` trees (rebuilt via the
        factory) and training continues at stage ``k + 1``.
        """
        epochs = int(self.hps.get("epochs", 1))
        history = []
        prev_state = self.state

        if initial_epoch == "auto":
            initial_epoch = 0
            ckpt = next((cb for cb in callbacks
                         if hasattr(cb, "maybe_restore")), None)
            latest = (ckpt.mgr.latest_step()
                      if ckpt is not None and hasattr(ckpt, "mgr") else None)
            if latest is not None and latest < epochs:
                # Rebuild stage `latest`'s trees as the restore template.
                self._prog_stage_setup(
                    int(latest), generator_factory, gen_prog_depths,
                    disc_prog_depths, seed, mesh, prev_state,
                )
                restored = ckpt.maybe_restore(self)
                if restored is not None:
                    prev_state = self.state
                    initial_epoch = int(restored) + 1
        initial_epoch = int(initial_epoch)

        for e in range(initial_epoch, epochs):
            it = self._prog_stage_setup(
                e, generator_factory, gen_prog_depths, disc_prog_depths,
                seed, mesh, prev_state,
            )
            # Run exactly global epoch `e` inside fit_generator so the
            # callbacks (and per-stage checkpoints) see the stage index.
            sub_hps = dict(self.hps)
            sub_hps["epochs"] = e + 1
            old_hps, self.hps = self.hps, sub_hps
            try:
                h = self.fit_generator(it, verbose=verbose, seed=seed + e,
                                       mesh=mesh, callbacks=callbacks,
                                       initial_epoch=e)
            finally:
                self.hps = old_hps
            prev_state = self.state
            history.append(h)
        return history

    # -- evaluation ---------------------------------------------------------

    def _evaluate_jit(self):
        """Cached jitted evaluation over a STACKED batch axis: all
        ``steps`` eval batches run in one ``lax.scan`` dispatch (on
        remote-dispatch setups the per-call round trip otherwise dominates
        small eval batches). Per-batch keys reproduce the historical
        one-dispatch-per-batch values exactly."""
        if not hasattr(self, "_eval_jit_fn"):
            def fn(state, batches, key, offset):
                def one(_, xs):
                    batch, i = xs
                    k_i = jax.random.fold_in(key, offset + i)
                    d = self._disc_loss(state["disc_params"], state, batch,
                                        k_i, lazy_r1=False)
                    g, _ = self._gen_loss(
                        state["gen_params"], state, batch,
                        jax.random.fold_in(k_i, 1),
                    )
                    return None, (d, g)

                n = jax.tree.leaves(batches)[0].shape[0]
                _, (ds, gs) = jax.lax.scan(one, None,
                                           (batches, jnp.arange(n)))
                return ds, gs

            self._eval_jit_fn = jax.jit(fn)
        return self._eval_jit_fn

    def evaluate(self, generator, steps: int = 1, seed: int = 0,
                 steps_per_call: int = 32):
        """Loss evaluation without updates (reference ``_evaluate_disc_ext``
        / ``_evaluate_gen_disc`` — dead code at gan.py:806-980, working
        copies in the StyleGAN example :1161-1335). Returns mean disc_ext
        and gen_disc losses over ``steps`` batches, scanned in chunks of
        ``steps_per_call`` batches per dispatch (bounds the stacked-batch
        HBM footprint while amortizing the dispatch round trip). Requires
        trained/initialized state — it will not silently initialize
        parameters from an eval batch."""
        if self.state is None:
            raise RuntimeError(
                "evaluate() requires initialized state — call init_state/"
                "load_gan_model/fit_generator first (refusing to silently "
                "initialize parameters from an eval batch)"
            )
        it = iter(generator)
        key = jax.random.key(seed)
        eval_fn = self._evaluate_jit()
        d_all, g_all = [], []
        done = 0
        while done < steps:
            n = min(steps_per_call, steps - done)
            batches = [jax.tree.map(jnp.asarray, next(it)) for _ in range(n)]
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
            # Per-batch keys stay fold_in(key, global_step) — chunking
            # cannot change the evaluated values.
            d, g = eval_fn(self.state, stacked, key,
                           jnp.asarray(done, jnp.int32))
            d_all.append(np.asarray(d))
            g_all.append(np.asarray(g))
            done += n
        return {
            "disc_ext_loss": float(np.mean(np.concatenate(d_all))),
            "gen_disc_loss": float(np.mean(np.concatenate(g_all))),
        }

    # -- inference / persistence -------------------------------------------

    def _generate_jit(self):
        if not hasattr(self, "_gen_jit_fn"):
            def fn(params, stats, z, key):
                out, _ = self._gen_apply(params, stats, z, key, train=False)
                return self._gen_output_image(out)

            self._gen_jit_fn = jax.jit(fn)
        return self._gen_jit_fn

    def generate(self, z, key=None):
        """Generate samples (reference :990-999); jitted and cached."""
        key = key if key is not None else jax.random.key(0)
        return self._generate_jit()(
            self.state["gen_params"], self.state["gen_stats"], z, key
        )

    def save_gan_model(self, path: str = "."):
        """Persist both param trees (reference :982-988 saves
        disc_ext.h5 + gen_disc.h5; here npz pairs)."""
        import os

        from ku.utility import save_weights

        save_weights(
            {"params": self.state["gen_params"], "stats": self.state["gen_stats"]},
            os.path.join(path, self.GEN_DISC_PATH),
        )
        save_weights(
            {"params": self.state["disc_params"],
             "stats": self.state["disc_stats"]},
            os.path.join(path, self.DISC_EXT_PATH),
        )

    def load_gan_model(self, path: str = "."):
        """Reload weights (reference :111-124). Requires init_state to have
        built matching trees first, or sets raw trees directly."""
        import os

        from ku.utility import load_weights

        g = load_weights(os.path.join(path, self.GEN_DISC_PATH))
        d = load_weights(os.path.join(path, self.DISC_EXT_PATH))
        if self.state is None:
            self.state = {
                "gen_params": g["params"], "gen_stats": g.get("stats", {}),
                "disc_params": d["params"], "disc_stats": d.get("stats", {}),
                "gen_opt": None, "disc_opt": None,
                "step": jnp.zeros((), jnp.int32),
            }
            if self._compiled:
                self.state["gen_opt"] = self.gen_opt.init(g["params"])
                self.state["disc_opt"] = self.disc_opt.init(d["params"])
        else:
            self.state["gen_params"] = g["params"]
            self.state["disc_params"] = d["params"]
        return self


def _merge_shared(new_tree, old_tree):
    """Copy params for names existing in both trees from old into new."""
    if not isinstance(new_tree, dict) or not isinstance(old_tree, dict):
        return old_tree if jnp.shape(new_tree) == jnp.shape(old_tree) else new_tree
    out = {}
    for k, v in new_tree.items():
        out[k] = _merge_shared(v, old_tree[k]) if k in old_tree else v
    return out


class GAN(AbstractGAN):
    """Concrete engine for caller-supplied gen/disc modules."""

    def __init__(self, conf, gen, disc):
        super().__init__(conf, gen=gen, disc=disc)


def compose_gan_with_mode(gen, disc, mode, conf=None, multi_gpu=False,
                          num_gpus=1):
    """Module-level parity wrapper (reference gan.py:1002-1178): returns a
    compiled :class:`GAN` whose jitted step embodies the disc_ext/gen_disc
    composites. ``multi_gpu``/``num_gpus`` accepted for signature parity
    (dead in the reference too, :1002)."""
    conf = conf or {"hps": {"composing_mode": mode}}
    conf.setdefault("hps", {})["composing_mode"] = mode
    engine = GAN(conf, gen, disc)
    engine.compose_gan_with_mode(mode)
    return engine
