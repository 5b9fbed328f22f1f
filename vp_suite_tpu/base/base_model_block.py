r"""Base class for reusable model blocks (cells, encoders, ...).

TPU-native analog of the reference's ``VPModelBlock``
(``vp_suite/base/base_model_block.py:4-13``): a flax module carrying
provenance constants. Blocks are pure functions of (params, inputs); recurrent
blocks expose a ``step`` method usable as a ``jax.lax.scan`` body.
"""
import typing

import flax.linen as nn


class VPModelBlock(nn.Module):
    r"""Base flax module for all model blocks, carrying provenance constants."""
    NAME: typing.ClassVar[str] = None
    PAPER_REFERENCE: typing.ClassVar[str] = None
    CODE_REFERENCE: typing.ClassVar[str] = None
    MATCHES_REFERENCE: typing.ClassVar[str] = None
