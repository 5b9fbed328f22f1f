r"""Driver-integration tests: the __graft_entry__ contract (single-chip
forward + multi-chip dry run) must keep working."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


@pytest.mark.slow
def test_dryrun_multichip_two_devices():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(2)  # uses 2 of the 8 virtual CPU devices


@pytest.mark.slow
def test_entry_forward_compiles():
    import jax
    import __graft_entry__
    fn, (params, x) = __graft_entry__.entry()
    out = jax.jit(fn)(params, x)
    assert out.shape == (2, 10, 64, 64, 3)
