"""Installability: pip install the repo into a clean prefix, import it from
OUTSIDE the repo root, and train one model through the public API.

Offline equivalent of the reference's ``pip install -e .`` story
(reference setup.py:1-43, pyproject.toml): ``--no-build-isolation`` uses the
local setuptools, ``--no-deps`` skips network resolution.
"""

import os
import subprocess
import sys
import sysconfig

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_pip_install_and_train(tmp_path):
    prefix = tmp_path / "prefix"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-build-isolation",
         "--no-deps", "--quiet", "--prefix", str(prefix), REPO],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    pyver = f"python{sys.version_info.major}.{sys.version_info.minor}"
    site = prefix / "lib" / pyver / "site-packages"
    assert (site / "cogdl_tpu" / "native" / "graph_sampler.cpp").exists(), \
        "native source must ship as package data"
    assert (prefix / "bin" / "cogdl-tpu-train").exists()

    # run from tmp (NOT the repo root) so only the installed copy is visible
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import cogdl_tpu, os\n"
        "assert 'site-packages' in cogdl_tpu.__file__, cogdl_tpu.__file__\n"
        "res = cogdl_tpu.experiment(dataset='sbm', model='gcn', epochs=30,\n"
        "                           seeds=[0], progress=False)\n"
        "(_, runs), = res.items()\n"
        "assert runs[0]['test_acc'] > 0.5, runs\n"
        "print('INSTALLED_OK', runs[0]['test_acc'])\n"
    )
    env = dict(os.environ, PYTHONPATH=str(site), JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600, cwd=str(tmp_path), env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "INSTALLED_OK" in r.stdout
