r"""End-to-end reproducibility contract.

With an order-independent data backend (MMF ``backend="native"``: per-index
seeded C generator; ``backend="device"``: PRNG-key-seeded on-device
synthesis), two identically-seeded ``VPSuite.train`` runs produce
BIT-IDENTICAL parameters — all JAX randomness is explicit PRNG keys in the
TrainState, and XLA compilation is deterministic. The default ``numpy``
backend intentionally keeps the reference's shared-RNG sampling (samples
depend on access order, a reference quirk — ``mmnist_on_the_fly.py``), so
it only reproduces statistically. The torch reference cannot make the
bitwise guarantee at all (4-worker DataLoader + cuDNN autotune).
"""
import jax
import numpy as np


def _train_once():
    from vp_suite_tpu import VPSuite
    suite = VPSuite(device="cpu")
    suite.load_dataset("MMF", img_size=16, digit_source="synthetic", n_seqs=16,
                       backend="native")
    suite.create_model("convlstm-shi")
    suite.train(batch_size=4, context_frames=2, pred_frames=2, epochs=2,
                steps_per_epoch=3, no_wandb=True, no_vis=True, seed=123)
    leaves = jax.tree_util.tree_leaves(suite.models[-1].state.params)
    return np.concatenate([np.asarray(p).ravel() for p in leaves])


import pytest


@pytest.mark.slow
def test_training_bit_reproducible_with_native_backend():
    from vp_suite_tpu.native import native_available
    if not native_available():
        pytest.skip("native mmnist generator not built")
    a = _train_once()
    b = _train_once()
    assert np.array_equal(a, b), \
        f"identically-seeded runs diverged: max|d|={np.max(np.abs(a - b))}"
