r"""Fréchet Video Distance.

Capability parity with the reference FVD (``vp_suite/measure/fvd/fvd.py:12-193``):
I3D features on 224x224 videos, chunking for sequences longer than 16 frames,
and the 2-Wasserstein distance between feature distributions using the
eigenvalue method of arXiv:2009.14075.

TPU notes: feature extraction runs jitted on the accelerator; the Wasserstein
eigendecomposition of a nonsymmetric product matrix needs f64 and is not
supported by XLA:TPU, so it runs on host (numpy, f64) — matching the
reference's precision (``fvd.py:164``). A differentiable f32 variant
(:func:`wasserstein2_jax`) is provided for loss-mode use on CPU backends.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vp_suite_tpu.base.base_measure import VPMeasure
from vp_suite_tpu.measure.fvd.i3d import i3d_features, load_params
from vp_suite_tpu.ops.image import resize_bilinear


def calculate_n_chunks(num_frames, min_t=9, max_t=16):
    r"""Chunking plan for the I3D 9<=T<=16 constraint
    (parity: ``fvd.py:52-89``)."""
    n_chunks, drop_last_chunk = 1, False
    if num_frames < min_t:
        print(f"The I3D Module used for FVD needs at least {min_t} input frames "
              f"(given: {num_frames}) -> returning None as loss value!")
        n_chunks = -1
    elif num_frames > max_t:
        possible_chunk_l = range(max_t, min_t - 1, -1)
        n_chunks = None
        for chunk_l in possible_chunk_l:
            if num_frames % chunk_l >= min_t:
                n_chunks = num_frames // chunk_l + 1
        if n_chunks is None:
            missed_frames = [num_frames % chunk_l for chunk_l in possible_chunk_l]
            best_chunk_l = sorted(zip(possible_chunk_l, missed_frames),
                                  key=lambda x: x[1])[-1]
            n_chunks = num_frames // best_chunk_l[0] + 1
            drop_last_chunk = True
        print(f"The I3D Module used for FVD handles at most {max_t} input frames "
              f"(given: {num_frames}) -> input video will be consumed in {n_chunks} chunks!")
    return n_chunks, drop_last_chunk


def wasserstein2_numpy(pred, target):
    r"""2-Wasserstein distance between feature sets, host/f64
    (parity math: ``fvd.py:140-193``). Inputs [b, n]."""
    pred = np.asarray(pred, dtype=np.float64).T     # [n, b]
    target = np.asarray(target, dtype=np.float64).T
    mu_p = pred.mean(axis=1, keepdims=True)
    mu_t = target.mean(axis=1, keepdims=True)
    n, b = pred.shape
    fact = 1.0 if b < 2 else 1.0 / (b - 1)
    e_p = pred - mu_p
    e_t = target - mu_t
    cov_p = e_p @ e_p.T * fact
    cov_t = e_t @ e_t.T * fact
    c_p = e_p * np.sqrt(fact)
    c_t = e_t * np.sqrt(fact)
    m = (c_p.T @ c_t) @ (c_t.T @ c_p)
    s = np.linalg.eigvals(m) + 1e-15
    # match reference: S.sqrt().abs().sum() over complex eigenvalues
    sq_tr_cov = np.abs(np.sqrt(s.astype(np.complex128))).sum()
    trace_term = np.trace(cov_p + cov_t) - 2.0 * sq_tr_cov
    diff = mu_t - mu_p
    mean_term = float((diff * diff).sum())
    return float(trace_term + mean_term)


def wasserstein2_jax(pred, target):
    r"""Differentiable f32 2-Wasserstein, jittable on ALL backends (incl. TPU).

    The reference computes ``sum(sqrt(eigvals(A @ A.T)))`` with ``A =
    c_p.T @ c_t`` via a nonsymmetric eigendecomposition
    (``vp_suite/measure/fvd/fvd.py:164``) — unsupported on XLA:TPU. But
    ``A @ A.T`` is symmetric PSD, so its eigenvalues are exactly the squared
    singular values of ``A``: a self-adjoint :func:`jnp.linalg.eigh` (TPU-
    supported, differentiable) gives the same trace term. Eigenvalues are
    clamped at a small floor so the sqrt gradient stays finite when the
    feature covariance is rank-deficient (b < n, the common case)."""
    pred = pred.T.astype(jnp.float32)
    target = target.T.astype(jnp.float32)
    n, b = pred.shape
    fact = 1.0 if b < 2 else 1.0 / (b - 1)
    mu_p = pred.mean(axis=1, keepdims=True)
    mu_t = target.mean(axis=1, keepdims=True)
    e_p = pred - mu_p
    e_t = target - mu_t
    cov_p = e_p @ e_p.T * fact
    cov_t = e_t @ e_t.T * fact
    a = (e_p.T @ e_t) * fact                  # [b, b]: c_p.T @ c_t
    m = a @ a.T                               # symmetric PSD
    s = jnp.linalg.eigh(m)[0]
    sq_tr_cov = jnp.sqrt(jnp.clip(s, 0.0) + 1e-15).sum()
    trace_term = jnp.trace(cov_p + cov_t) - 2.0 * sq_tr_cov
    diff = mu_t - mu_p
    mean_term = jnp.sum(diff * diff)
    return (trace_term + mean_term).astype(jnp.float32)


class FrechetVideoDistance(VPMeasure):
    r"""FVD measure (parity: ``fvd.py:12-137``). NTHWC input in [-1, 1]-ish
    model range; frames are resized on-device to 224x224."""
    NAME = "Fréchet Video Distance (FVD)"
    REFERENCE = "https://arxiv.org/abs/1812.01717"

    _MIN_T = 9
    _MAX_T = 16
    _I3D_IN_SIZE = (224, 224)

    def __init__(self, device: str = None, in_channels: int = 3):
        super().__init__(device)
        self.in_channels = in_channels
        self.params, self.pretrained = load_params(in_channels)
        self._features_fn = jax.jit(lambda x: i3d_features(x, self.params))

    def forward(self, pred, target):
        if pred.shape != target.shape:
            raise ValueError("FVD: vid shapes not equal!")
        num_frames = pred.shape[1]
        n_chunks, drop_last_chunk = calculate_n_chunks(num_frames, self._MIN_T, self._MAX_T)
        if n_chunks < 1:
            return None
        pred = resize_bilinear(pred, self._I3D_IN_SIZE)
        target = resize_bilinear(target, self._I3D_IN_SIZE)
        pred_chunks = jnp.array_split(pred, n_chunks, axis=1)
        target_chunks = jnp.array_split(target, n_chunks, axis=1)
        n_valid = (n_chunks - 1) if drop_last_chunk else n_chunks
        dists = [self.get_distance(pred_chunks[i], target_chunks[i]) for i in range(n_valid)]
        return jnp.asarray(sum(dists) / n_valid)

    def get_distance(self, pred, target):
        logits_pred = self._features_fn(pred)
        logits_target = self._features_fn(target)
        if isinstance(logits_pred, jax.core.Tracer):
            # loss mode: inside a jit/grad trace (the reference FVD is
            # explicitly loss-capable, ``fvd.py:22-24``) — use the
            # differentiable eigh path; np.asarray would raise here.
            return wasserstein2_jax(logits_pred, logits_target)
        return wasserstein2_numpy(np.asarray(logits_pred), np.asarray(logits_target))
