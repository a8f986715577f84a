"""Smoke-run every `examples/` script in a subprocess (slow lane).

The examples double as living documentation of the public surface
(reference keeps runnable `examples/` the same way); each must train
end-to-end offline on the synthetic datasets with no argv. Run on CPU
via the JAX_PLATFORMS=cpu + jax.config override each script carries
(the env var alone is not honored under the axon sitecustomize —
CLAUDE.md).
"""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, "examples", "*.py")))


@pytest.mark.slow
@pytest.mark.parametrize(
    "script", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # force a fresh interpreter: the scripts apply the jax.config platform
    # override themselves before any device op
    r = subprocess.run([sys.executable, "-u", script], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (
        f"{os.path.basename(script)} failed\n--- stdout\n{r.stdout[-2000:]}"
        f"\n--- stderr\n{r.stderr[-2000:]}")
