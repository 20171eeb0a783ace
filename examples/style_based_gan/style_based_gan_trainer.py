"""RL-based hyperparameter search harness (actor-critic).

Reference: examples/style_based_gan/style_based_gan_trainer.py:88-436 — an
actor-critic hyperparameter optimizer with a TD target (:324-328) and
action→hps scaling functions (:356-384). The reference file is
non-functional as committed (it calls an undefined ``COVID19Forecastor``,
:387); the capability it represents — "RL harness that proposes hps,
observes a training score, and updates actor+critic by TD learning" — is
implemented here in working form:

- the **actor** maps a (stateless, constant) context to a Gaussian action
  in [-1,1]^n_hps; each action dimension is scaled into an hp range
  (log-uniform for learning rates), mirroring the reference's
  ``cal_lr``-style scaling functions;
- the **critic** estimates the expected score of an action; both update
  from the observed reward with a TD(0) target (reference :324-328);
- ``optimize(train_fn, n_trials)`` runs the propose→train→update loop.
"""

from __future__ import annotations

import math
import os
import sys
from typing import Callable, Dict, Sequence, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import common  # noqa: E402

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402


class _Actor(nn.Module):
    n_actions: int

    @nn.compact
    def __call__(self, ctx):
        h = nn.relu(nn.Dense(32)(ctx))
        mean = jnp.tanh(nn.Dense(self.n_actions)(h))
        log_std = self.param("log_std", nn.initializers.constant(-0.5),
                             (self.n_actions,))
        return mean, log_std


class _Critic(nn.Module):
    @nn.compact
    def __call__(self, ctx, action):
        h = nn.relu(nn.Dense(32)(jnp.concatenate([ctx, action], -1)))
        return nn.Dense(1)(h)[..., 0]


class HPRange:
    """One hyperparameter's action→value scaling (reference :356-384)."""

    def __init__(self, name: str, low: float, high: float, log: bool = False,
                 integer: bool = False):
        self.name, self.low, self.high, self.log, self.integer = (
            name, low, high, log, integer
        )

    def from_action(self, a: float) -> float:
        t = (float(a) + 1.0) / 2.0  # [-1,1] → [0,1]
        if self.log:
            v = math.exp(
                math.log(self.low) + t * (math.log(self.high) - math.log(self.low))
            )
        else:
            v = self.low + t * (self.high - self.low)
        return int(round(v)) if self.integer else v


class StyleGANTrainer:
    """Actor-critic HP optimizer (reference class surface, :88-436)."""

    def __init__(self, hp_ranges: Sequence[HPRange], gamma: float = 0.9,
                 lr: float = 1e-2, seed: int = 0):
        self.hp_ranges = list(hp_ranges)
        self.gamma = gamma
        n = len(self.hp_ranges)
        self.actor = _Actor(n_actions=n)
        self.critic = _Critic()
        key = jax.random.key(seed)
        self._key = key
        ctx = jnp.ones((1, 1))
        self.actor_params = self.actor.init(key, ctx)
        self.critic_params = self.critic.init(key, ctx, jnp.zeros((1, n)))
        self.actor_tx = optax.adam(lr)
        self.critic_tx = optax.adam(lr)
        self.actor_opt = self.actor_tx.init(self.actor_params)
        self.critic_opt = self.critic_tx.init(self.critic_params)
        self.history = []

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def propose(self) -> Tuple[Dict[str, float], jnp.ndarray]:
        ctx = jnp.ones((1, 1))
        mean, log_std = self.actor.apply(self.actor_params, ctx)
        eps = jax.random.normal(self._next_key(), mean.shape)
        action = jnp.clip(mean + jnp.exp(log_std) * eps, -1.0, 1.0)
        hps = {
            r.name: r.from_action(action[0, i])
            for i, r in enumerate(self.hp_ranges)
        }
        return hps, action

    def update(self, action, reward: float, next_value: float = 0.0):
        """TD(0) update (reference :324-328): target = r + γ·V(s')."""
        ctx = jnp.ones((1, 1))
        target = reward + self.gamma * next_value

        def critic_loss(p):
            v = self.critic.apply(p, ctx, action)
            return jnp.mean((v - target) ** 2)

        c_loss, c_grads = jax.value_and_grad(critic_loss)(self.critic_params)
        updates, self.critic_opt = self.critic_tx.update(
            c_grads, self.critic_opt, self.critic_params
        )
        self.critic_params = optax.apply_updates(self.critic_params, updates)

        advantage = target - float(
            self.critic.apply(self.critic_params, ctx, action)[0]
        )

        def actor_loss(p):
            mean, log_std = self.actor.apply(p, ctx)
            std = jnp.exp(log_std)
            logp = -0.5 * jnp.sum(
                ((action - mean) / std) ** 2 + 2 * log_std
                + jnp.log(2 * jnp.pi), axis=-1,
            )
            return -jnp.mean(logp) * advantage

        a_loss, a_grads = jax.value_and_grad(actor_loss)(self.actor_params)
        updates, self.actor_opt = self.actor_tx.update(
            a_grads, self.actor_opt, self.actor_params
        )
        self.actor_params = optax.apply_updates(self.actor_params, updates)
        return float(c_loss), float(a_loss)

    def optimize(self, train_fn: Callable[[Dict[str, float]], float],
                 n_trials: int = 10, verbose: int = 1):
        """Propose→train→update loop; returns the best (hps, score)."""
        best = (None, -np.inf)
        for t in range(n_trials):
            hps, action = self.propose()
            score = float(train_fn(hps))
            self.update(action, score)
            self.history.append((hps, score))
            if score > best[1]:
                best = (hps, score)
            if verbose:
                print(f"trial {t + 1}/{n_trials}: score {score:.4f} hps {hps}")
        return best


def main():
    """Demo: tune the RBM example's CD learning rate + hidden dim on the
    offline dataset, maximizing negative reconstruction error."""
    import jax

    from ku.ebm import RBM

    V, _ = common.load_mnist()
    Vb = (V / 255.0 > 0.5).astype(np.float32)[:1024]

    def train_fn(hps):
        # Fixed shapes across trials → the jitted/Pallas epoch compiles
        # once and is reused for every proposal.
        rbm = RBM(
            {"lr": hps["lr"], "batch_size": 128, "epochs": 1}, 128, seed=0
        )
        rbm.fit(Vb, verbose=0)
        h = rbm.transform(Vb[:256], key=jax.random.key(0))
        v_rec = rbm.inv_transform(h, key=jax.random.key(1))
        return -float(jnp.mean(jnp.abs(v_rec - Vb[:256])))

    tuner = StyleGANTrainer([HPRange("lr", 1e-4, 1e-1, log=True)])
    best_hps, best_score = tuner.optimize(train_fn, n_trials=5)
    print(f"best: {best_hps} (score {best_score:.4f})")


if __name__ == "__main__":
    main()
