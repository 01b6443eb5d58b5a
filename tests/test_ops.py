"""Pallas fused tau-leap kernel vs the XLA path (TPU only — the test suite
runs on the virtual CPU mesh, where Mosaic kernels cannot execute; these
tests run when launched on real TPU hardware)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epitpu.models import sir_model
from epitpu.ops import pallas_advance_available

pytestmark = pytest.mark.skipif(
    not pallas_advance_available(), reason="needs a TPU backend for Mosaic"
)

THETA = jnp.array([2.0, 1.0])


def _cloud(n):
    return jnp.broadcast_to(
        jnp.array([4800.0, 20.0, 0.0]), (n, 3)
    ).astype(jnp.float32)


def test_pallas_simulate_shapes_and_integrality():
    from epitpu.ops import pallas_simulate

    m = sir_model()
    b = 384  # -> 3 sublane rows per grid cell
    x0 = _cloud(b)
    thetas = jnp.broadcast_to(THETA, (b, 2))
    out = np.asarray(pallas_simulate(m, jnp.int32(3), x0, thetas, 6, 10))
    assert out.shape == (b, 7, 3)
    np.testing.assert_allclose(out.sum(-1), 4820.0, atol=1e-3)
    np.testing.assert_allclose(out, np.round(out), atol=1e-4)
    np.testing.assert_allclose(out[:, 0, :], np.asarray(x0), atol=0)


def test_pallas_simulate_per_lane_theta():
    """Every lane carries its own theta: a (0, 0) candidate must stay frozen
    at x0 while (2, 1) candidates evolve — in the SAME kernel launch."""
    from epitpu.ops import pallas_simulate

    m = sir_model()
    b = 256
    thetas = jnp.broadcast_to(THETA, (b, 2))
    thetas = thetas.at[::2].set(jnp.array([0.0, 0.0]))  # freeze even lanes
    x0 = _cloud(b)
    out = np.asarray(pallas_simulate(m, jnp.int32(9), x0, thetas, 5, 10))
    frozen = out[::2]
    np.testing.assert_array_equal(
        frozen, np.broadcast_to(frozen[:, :1, :], frozen.shape)
    )
    moving = out[1::2]
    assert np.any(moving[:, -1, :] != moving[:, 0, :])
    # infections monotonically deplete S for the active lanes
    assert np.all(np.diff(moving[..., 0], axis=1) <= 0)


def test_pallas_simulate_matches_xla_moments():
    from epitpu.ops import pallas_simulate
    from epitpu.sim import simulate

    m = sir_model()
    b = 2048
    x0 = _cloud(b)
    thetas = jnp.broadcast_to(THETA, (b, 2))
    out_p = np.asarray(pallas_simulate(m, jnp.int32(1), x0, thetas, 8, 20))
    out_x = np.asarray(
        simulate(m, jax.random.PRNGKey(0), x0, THETA, 8, 20)
    )  # [T+1, b, C]
    out_x = np.swapaxes(out_x, 0, 1)
    for t in (2, 5, 8):
        np.testing.assert_allclose(
            out_p[:, t].mean(0), out_x[:, t].mean(0), rtol=0.06, atol=3.0
        )
        np.testing.assert_allclose(
            out_p[:, t].std(0), out_x[:, t].std(0), rtol=0.3, atol=3.0
        )


def test_pallas_simulate_deterministic_per_seed():
    from epitpu.ops import pallas_simulate

    m = sir_model()
    x0 = _cloud(128)
    thetas = jnp.broadcast_to(THETA, (128, 2))
    a = np.asarray(pallas_simulate(m, jnp.int32(5), x0, thetas, 4, 5))
    b = np.asarray(pallas_simulate(m, jnp.int32(5), x0, thetas, 4, 5))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(pallas_simulate(m, jnp.int32(6), x0, thetas, 4, 5))
    assert not np.array_equal(a, c)
