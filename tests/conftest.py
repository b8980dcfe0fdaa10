"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip code paths are tested without TPU hardware by forcing the host
platform to present 8 XLA CPU devices (the "fake backend" strategy —
SURVEY.md §4e).  x64 is enabled so f64/c128 reference numerics are exact.

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# SLT_TEST_PLATFORM=tpu runs the suite against the real chip (used by
# tests/test_tpu_smoke.py to catch kernel-lowering regressions before the
# round-end bench); the default pins the virtual CPU mesh.
_platform = os.environ.get("SLT_TEST_PLATFORM", "cpu")

if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

# The environment may pre-register an accelerator platform via sitecustomize
# and pin jax.config.jax_platforms; the env var alone does not win, so force
# the config too.
if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: cuts repeat-run compile cost (esp. the
# on-TPU smoke suite, where cold kernels compile through a remote tunnel)
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(params=[np.float64, np.complex128], ids=["f64", "c128"])
def dtype(request):
    """Both element families, mirroring the reference's Double / Complex
    Double instantiations (e.g. Matrix/Sparse.hs:456-457 SPECIALIZE)."""
    return request.param


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_coo(rng, nr, nc, dtype, density=0.25):
    """Random triples with deliberate duplicate collisions, mirroring the
    reference's Arbitrary instance (~nr*nc/4 + 1 samples,
    tests/Test/LinearAlgebra.hs:17-38) so the dedup path is always exercised."""
    n = int(nr * nc * density) + 1
    rows = rng.integers(0, nr, size=n)
    cols = rng.integers(0, nc, size=n)
    vals = rng.standard_normal(n)
    if np.issubdtype(dtype, np.complexfloating):
        vals = vals + 1j * rng.standard_normal(n)
    return rows, cols, vals.astype(dtype)
