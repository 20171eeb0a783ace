"""Training callbacks: history, early stopping, checkpointing.

Reference observability (SURVEY §5): Keras ``CallbackList`` with history +
progress bars per composite model (reference ku/backprop/gan.py:356-379),
per-batch logs routed to ``on_train_batch_end`` (:426-434), a
``stop_training`` flag (:396-397), and epoch resume via Keras
BackupAndRestore internals (:392). Here the same capability surface is a
small explicit callback protocol understood by
:meth:`ku.backprop.AbstractGAN.fit_generator`; checkpointing goes through
orbax (full train state — params + optimizer + step), which is strictly
stronger than the reference's compile=False h5 reloads (optimizer state
was lost there).
"""

from __future__ import annotations

from typing import Callable, Optional


class Callback:
    def on_train_begin(self, engine):
        pass

    def on_train_batch_end(self, engine, step: int, logs: dict):
        """Per logical batch step (reference gan.py:426-434 routes
        train_on_batch logs here). With ``steps_per_call`` dispatch fusion
        the engine still reports each fused step individually from the
        scanned loss arrays."""

    def on_epoch_end(self, engine, epoch: int, logs: dict):
        pass

    def on_train_end(self, engine, history: dict):
        pass


class History(Callback):
    """Collects per-epoch logs (Keras History parity)."""

    def __init__(self):
        self.epochs = []
        self.history = {}

    def on_epoch_end(self, engine, epoch, logs):
        self.epochs.append(epoch)
        for k, v in logs.items():
            self.history.setdefault(k, []).append(v)


class EarlyStopping(Callback):
    """Sets ``engine.stop_training`` when ``monitor`` stops improving
    (reference stop-flag semantics, gan.py:396-397)."""

    def __init__(self, monitor: str = "gen_disc_loss", patience: int = 3,
                 min_delta: float = 0.0, mode: str = "min"):
        self.monitor = monitor
        self.patience = patience
        self.min_delta = min_delta
        self.sign = 1.0 if mode == "min" else -1.0
        self.best = float("inf")
        self.wait = 0

    def on_epoch_end(self, engine, epoch, logs):
        current = self.sign * logs.get(self.monitor, float("inf"))
        if current < self.best - self.min_delta:
            self.best = current
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                engine.stop_training = True


class CheckpointCallback(Callback):
    """Orbax full-train-state checkpoint every ``every`` epochs, with
    resume (``latest_step``) — replaces the reference's per-epoch h5 saves
    (gan.py:982-988) + BackupAndRestore resume (:392)."""

    def __init__(self, directory: str, every: int = 1, max_to_keep: int = 3):
        from ku.io import CheckpointManager

        self.every = every
        self.mgr = CheckpointManager(directory, max_to_keep=max_to_keep)

    def maybe_restore(self, engine) -> Optional[int]:
        """Restore the latest checkpoint into the engine, if any."""
        step = self.mgr.latest_step()
        if step is None:
            return None
        engine.state = self.mgr.restore(step, template=engine.state)
        return step

    def on_epoch_end(self, engine, epoch, logs):
        if (epoch + 1) % self.every == 0:
            self.mgr.save(epoch, engine.state)

    def on_train_end(self, engine, history):
        self.mgr.wait_until_finished()


class LambdaCallback(Callback):
    def __init__(self, on_epoch_end: Optional[Callable] = None,
                 on_train_begin: Optional[Callable] = None,
                 on_train_end: Optional[Callable] = None,
                 on_train_batch_end: Optional[Callable] = None):
        self._epoch_end = on_epoch_end
        self._train_begin = on_train_begin
        self._train_end = on_train_end
        self._batch_end = on_train_batch_end

    def on_train_begin(self, engine):
        if self._train_begin:
            self._train_begin(engine)

    def on_train_batch_end(self, engine, step, logs):
        if self._batch_end:
            self._batch_end(engine, step, logs)

    def on_epoch_end(self, engine, epoch, logs):
        if self._epoch_end:
            self._epoch_end(engine, epoch, logs)

    def on_train_end(self, engine, history):
        if self._train_end:
            self._train_end(engine, history)
