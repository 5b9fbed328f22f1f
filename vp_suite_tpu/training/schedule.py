r"""Learning-rate scheduling.

The reference uses torch's ``ReduceLROnPlateau(patience=5, factor=0.2,
min_lr=1e-6)`` (``vp_suite/vpsuite.py:353-355``). This is inherently
host-side control flow (depends on validation results), so it stays on host:
the scheduler tracks the indicator and the facade writes the updated learning
rate into the optax ``inject_hyperparams`` state between epochs.
"""
import jax.numpy as jnp


class ReduceLROnPlateau:
    def __init__(self, lr, mode="min", factor=0.2, patience=5, min_lr=1e-6):
        self.lr = lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = None
        self.num_bad_epochs = 0

    def step(self, metric) -> float:
        r"""Updates with the epoch's indicator value; returns the current lr."""
        metric = float(metric)
        if self.best is None:
            self.best = metric
        else:
            improved = metric < self.best if self.mode == "min" else metric > self.best
            if improved:
                self.best = metric
                self.num_bad_epochs = 0
            else:
                self.num_bad_epochs += 1
                if self.num_bad_epochs > self.patience:
                    self.lr = max(self.lr * self.factor, self.min_lr)
                    self.num_bad_epochs = 0
        return self.lr


def set_learning_rate(state, lr):
    r"""Writes a new learning rate into an ``optax.inject_hyperparams`` opt
    state held inside a TrainState."""
    opt_state = state.opt_state
    if hasattr(opt_state, "hyperparams") and "learning_rate" in opt_state.hyperparams:
        hp = dict(opt_state.hyperparams)
        # place the new scalar exactly like the old one: an uncommitted host
        # scalar in an otherwise device-committed state changes the jit cache
        # key and forces a train_step recompile every epoch (minutes each on
        # remote-compile TPU backends)
        old = hp.get("learning_rate")
        new_lr = jnp.asarray(lr, jnp.float32)
        if hasattr(old, "sharding"):
            import jax
            new_lr = jax.device_put(new_lr, old.sharding)
        hp["learning_rate"] = new_lr
        opt_state = opt_state._replace(hyperparams=hp)
        return state.replace(opt_state=opt_state)
    return state
