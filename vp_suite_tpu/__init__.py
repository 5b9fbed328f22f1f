r"""vp-suite-tpu: a TPU-native (JAX/XLA/Pallas/pjit) video prediction framework.

Capability parity target: AIS-Bonn/vp-suite (see SURVEY.md). The public facade
mirrors the reference's ``VPSuite`` API (load_dataset / create_model / train /
test / hyperopt), while the execution engine is pure-functional JAX: flax
models, lax.scan time unrolls, jitted train/eval steps, optax optimizers,
orbax checkpoints, and jax.sharding data parallelism over TPU meshes.
"""
from vp_suite_tpu.__about__ import __version__

__all__ = ["__version__"]


def __getattr__(name):
    # lazy import so `import vp_suite_tpu` stays light
    if name == "VPSuite":
        from vp_suite_tpu.vpsuite import VPSuite
        return VPSuite
    raise AttributeError(f"module 'vp_suite_tpu' has no attribute '{name}'")
