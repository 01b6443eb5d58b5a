import time, numpy as np
import jax, jax.numpy as jnp
from epitpu.mcmc import particle_mcmc_chains
from epitpu.models import sir_model
from epitpu.observe import get_observation_model
from epitpu.ode import sir_simulate_discrete
from epitpu.diag import ess

t = np.linspace(0, 14, 100)
df = sir_simulate_discrete((4800.0, 20.0, 0.0), t, 2.0, 1.0)
latent = df[["susceptible", "infected", "removed"]].to_numpy()
rng = np.random.default_rng(42)
y = jnp.asarray(rng.binomial(np.round(latent).astype(int), 0.1).astype(np.float32))
model = sir_model(); obs = get_observation_model("binomial")

def run(key, chains):
    return particle_mcmc_chains(
        model, obs, key, y, jnp.array([2.0, 1.0]), 0.05,
        n_chains=chains, n_iters=128, obs_param=0.1, n_particles=4096,
        n_population=4820, mu=20.0, steps_per_unit=20, n_init_attempts=2,
        sampler="fast_rbg", resample_every=4)

for chains in (32, 64, 128):
    np.asarray(run(jax.random.PRNGKey(0), chains).thetas)
    es, its = [], []
    for seed in (1, 2):
        t0 = time.time()
        r = run(jax.random.PRNGKey(seed), chains)
        th = np.asarray(r.thetas); dt = time.time() - t0
        es.append(float(np.min(ess(th))) / dt); its.append(chains*128/dt)
    print(f"chains={chains:<4} iters/s={np.mean(its):7.1f} ess/s={np.mean(es):7.1f} +- {np.std(es):5.1f}")
