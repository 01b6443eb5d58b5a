"""Test configuration: force an 8-device virtual CPU platform.

The build environment's sitecustomize registers the axon TPU PJRT plugin in
EVERY python process when ``PALLAS_AXON_POOL_IPS`` is set, and that
registration overrides ``JAX_PLATFORMS`` — setting env vars here (or even in
the shell) is too late.  The only reliable escape is to re-exec the test
process once with a cleaned environment, before anything imports jax.
"""
import os
import sys

# The sitecustomize imports jax in EVERY process, so checking
# ``"jax" not in sys.modules`` can never work as a guard — use an explicit
# sentinel instead.  execve replaces the process, so the parent's imported
# (axon-registered) jax is irrelevant.  The re-exec must happen inside
# ``pytest_configure`` (not at module import): pytest's fd-level capture is
# already active when conftest loads, and an execve'd child would inherit
# the redirected fds and write all its output into a capture temp file that
# dies with it — capture has to be stopped first, which needs the config.
_NEEDS_REEXEC = bool(
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and not os.environ.get("EPITPU_TEST_CLEAN_ENV")
)


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["EPITPU_TEST_CLEAN_ENV"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
    )

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

import epitpu

# cache setup is explicit (not an import side effect) since round 4; the
# test suite is one of the entry points that wants it
epitpu.enable_compilation_cache()


@pytest.fixture(scope="session")
def sir_dataset():
    """Reference-style synthetic SIR dataset: ODE ground truth, binomial
    thinning p=0.1 (mirrors reference tests/test_under.py:25-33)."""
    import jax.numpy as jnp
    from epitpu.ode import sir_simulate_discrete

    t = np.linspace(0, 14, 100)
    df = sir_simulate_discrete((4800.0, 20.0, 0.0), t, 2.0, 1.0)
    latent = df[["susceptible", "infected", "removed"]].to_numpy()
    rng = np.random.default_rng(42)
    y = rng.binomial(np.round(latent).astype(int), 0.1).astype(np.float32)
    return jnp.asarray(y), latent
