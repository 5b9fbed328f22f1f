r"""The examples/ scripts must stay runnable (slow tier: each spawns a
subprocess exercising the full facade)."""
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = sorted((Path(__file__).parent.parent / "examples").glob("*.py"))


@pytest.mark.slow
@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(script):
    import os
    env = dict(os.environ)
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") \
        + " --xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = str(script.parent.parent) \
        + os.pathsep + env.get("PYTHONPATH", "")
    # force CPU like conftest does (the env var alone is not enough under
    # the axon plugin, so examples must run through VPSuite(device='auto'),
    # which probes TPU first — give it a jax that only has CPU)
    code = (f"import jax; jax.config.update('jax_platforms', 'cpu'); "
            f"exec(open({str(script)!r}).read())")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, timeout=900)
    assert out.returncode == 0, out.stdout.decode()[-2000:] \
        + out.stderr.decode()[-2000:]
