"""The examples/ walkthroughs stay runnable (subprocess smoke).

``eigensolve.py`` is excluded here only for CI time — its every code path
(count, solve, warm restart, slicing) is covered directly in test_eig.py.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("script", ["poisson_direct.py", "distributed.py"])
@pytest.mark.slow
def test_example_runs(script):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # honored by plain jax; the axon
    # sitecustomize overrides it, so also go through a -c shim that forces
    # the platform before the example's first device touch
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import runpy; runpy.run_path(r'%s', run_name='__main__')"
        % os.path.join(_REPO, "examples", script)
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=_REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
