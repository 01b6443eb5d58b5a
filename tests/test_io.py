"""Artifact persistence round-trips (reference CSV layout) + checkpoints."""
import jax
import jax.numpy as jnp
import numpy as np

from epitpu.io import (
    load_dataset,
    load_pmmh_run,
    save_dataset,
    save_pmmh_run,
    warm_start,
    load_checkpoint,
    save_checkpoint,
)
from epitpu.mcmc import Welford


def _fake_run(n=50, t=15, c=3, d=2, seed=0):
    rng = np.random.default_rng(seed)
    thetas = rng.normal([2.0, 1.0], 0.1, size=(n, d))
    lls = rng.normal(-60, 1, size=n)
    trajs = rng.uniform(0, 100, size=(n, t, c))
    return thetas, lls, trajs


def test_save_load_roundtrip(tmp_path):
    thetas, lls, trajs = _fake_run()
    d = str(tmp_path / "run1")
    save_pmmh_run(d, thetas, lls, trajs)
    th2, ll2, tr2 = load_pmmh_run(d)
    np.testing.assert_allclose(th2, thetas)
    np.testing.assert_allclose(ll2, lls)
    np.testing.assert_allclose(tr2, trajs)


def test_reference_csv_layout(tmp_path):
    """The exact files reference scripts expect
    (reference tests/experiments/noise/noise_.1.py:52-56)."""
    thetas, lls, trajs = _fake_run()
    d = tmp_path / "run1"
    save_pmmh_run(str(d), thetas, lls, trajs)
    for f in (
        "thetas.csv",
        "likelihoods.csv",
        "sampled_trajs_susceptible.csv",
        "sampled_trajs_infected.csv",
        "sampled_trajs_recovered.csv",
    ):
        assert (d / f).exists(), f
    # trajectories stored time-major [T, n] as the reference writes them
    plane = np.loadtxt(d / "sampled_trajs_infected.csv", delimiter=",")
    assert plane.shape == (15, 50)
    np.testing.assert_allclose(plane, trajs[:, :, 1].T)
    # CSV-only load path (reference-written runs have no run.npz)
    (d / "run.npz").unlink()
    th2, ll2, tr2 = load_pmmh_run(str(d))
    np.testing.assert_allclose(th2, thetas)
    np.testing.assert_allclose(tr2, trajs, rtol=1e-5)


def test_warm_start(tmp_path):
    thetas, lls, trajs = _fake_run(n=400)
    d = str(tmp_path / "run1")
    save_pmmh_run(d, thetas, lls, trajs)
    theta0, sigma = warm_start(d, burn_in=100, thin=10)
    np.testing.assert_allclose(theta0, thetas[-1])
    assert sigma.shape == (2, 2)
    assert np.linalg.eigvalsh(sigma).min() >= 0


def test_dataset_roundtrip(tmp_path):
    data = np.random.default_rng(0).uniform(size=(15, 3))
    p = str(tmp_path / "data" / "sir.csv")
    save_dataset(p, data)
    back = load_dataset(p)
    np.testing.assert_allclose(back, data, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    w = Welford.init(2)
    w = w.update(jnp.array([2.0, 1.0]))
    w = w.update(jnp.array([2.1, 0.9]))
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(
        p,
        step=123,
        theta=np.array([2.0, 1.0]),
        log_likelihood=np.float32(-61.5),
        trajectory=np.zeros((15, 3)),
        welford=w,
        key=jax.random.PRNGKey(7),
        acceptances=np.int32(37),
    )
    ck = load_checkpoint(p)
    assert ck.step == 123
    np.testing.assert_allclose(ck.theta, [2.0, 1.0])
    w2 = ck.welford()
    np.testing.assert_allclose(np.asarray(w2.mean), np.asarray(w.mean))
    np.testing.assert_allclose(np.asarray(w2.m2), np.asarray(w.m2))
    assert load_checkpoint(str(tmp_path / "missing.npz")) is None


def test_pmmh_checkpoint_roundtrip(tmp_path):
    """save_pmmh_checkpoint/load_pmmh_checkpoint preserve a chain-batched
    PMMHState + history + master key exactly."""
    import jax
    import jax.numpy as jnp

    from epitpu.io import load_pmmh_checkpoint, save_pmmh_checkpoint
    from epitpu.mcmc import PMMHState, Welford

    m, d, t, c = 3, 2, 5, 3
    rng = np.random.default_rng(0)
    state = PMMHState(
        theta=jnp.asarray(rng.normal(size=(m, d)), jnp.float32),
        log_likelihood=jnp.asarray(rng.normal(size=(m,)), jnp.float32),
        trajectory=jnp.asarray(rng.normal(size=(m, t, c)), jnp.float32),
        welford=Welford(
            count=jnp.full((m,), 7.0),
            mean=jnp.asarray(rng.normal(size=(m, d)), jnp.float32),
            m2=jnp.asarray(rng.normal(size=(m, d, d)), jnp.float32),
        ),
        acceptances=jnp.asarray([3, 4, 5], jnp.int32),
        step=jnp.asarray([6, 6, 6], jnp.int32),
    )
    key = jax.random.PRNGKey(42)
    hist_th = rng.normal(size=(m, 7, d)).astype(np.float32)
    hist_ll = rng.normal(size=(m, 7)).astype(np.float32)
    hist_tr = rng.normal(size=(m, 7, t, c)).astype(np.float32)
    p = str(tmp_path / "ck.npz")
    save_pmmh_checkpoint(p, state, key, 100, hist_th, hist_ll, hist_tr,
                         meta={"name": "x"})
    ck = load_pmmh_checkpoint(p)
    assert ck.n_iters == 100
    assert ck.meta == {"name": "x"}
    np.testing.assert_array_equal(ck.key_data, np.asarray(jax.random.key_data(key)))
    np.testing.assert_array_equal(np.asarray(ck.state.theta), np.asarray(state.theta))
    np.testing.assert_array_equal(
        np.asarray(ck.state.welford.m2), np.asarray(state.welford.m2)
    )
    np.testing.assert_array_equal(ck.thetas, hist_th)
    assert load_pmmh_checkpoint(str(tmp_path / "nope.npz")) is None
