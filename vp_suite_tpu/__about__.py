r"""Package metadata for vp-suite-tpu.

A TPU-native (JAX / XLA / Pallas / pjit) framework for training and evaluating
video prediction models. Capability parity target: AIS-Bonn/vp-suite
(see ``/root/reference/vp_suite/__about__.py:4-16`` for the reference identity).
"""

__title__ = "vp-suite-tpu"
__summary__ = "A TPU-Native Framework for Training and Evaluating Video Prediction Models"
__version__ = "0.1.0"
__author__ = "vp-suite-tpu developers"
__license__ = "MIT"
