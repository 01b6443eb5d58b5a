"""Particle-Marginal Metropolis-Hastings (PMMH) as a compiled scan kernel.

TPU-native redesign of the reference's sequential Python chain loop
(reference pmcmc.py:251-408).  One MCMC iteration — adaptive-covariance
update, MVN random-walk proposal, full particle filter, ancestral path
sample, and the Metropolis accept/reject — is a single scan body; the whole
chain is one ``lax.scan``; many independent chains run per chip via ``vmap``
and shard across a mesh via ``shard_map`` (see epitpu.dist).

Semantics preserved from the reference (documented quirks included):

* Proposals with any negative component are auto-rejected without counting
  an acceptance (reference pmcmc.py:333-337) — equivalent to a flat prior on
  theta >= 0.  Under vmap the PF still runs for them (both branches of a
  select execute); the result is simply discarded.
* When the reporting probability is inferred (reference ``probs=None``), the
  last theta component is the observation parameter, clamped to [0, 1] for
  the filter and *stored clamped* in the chain (reference pmcmc.py:283-287,
  339-343, 373-374).
* The reference's acceptance ratio multiplies in proposal-density factors
  ``q(theta' | theta_init) / q(theta_init | theta')`` and
  ``q(theta_prev | theta') / q(theta' | theta_prev)`` (reference
  pmcmc.py:380-391).  A multivariate normal density is symmetric in
  (mean, point), so BOTH ratios are identically 1: the formula reduces
  exactly to ``zeta' / zeta_prev``.  We implement that reduction in log
  space, which also eliminates the reference's ``10**constant``
  string-parsing underflow hack (reference pmcmc.py:376-379).
* A degenerate filter (-inf log-likelihood; the reference's
  ``(None, None, None)`` return) auto-rejects (reference pmcmc.py:365-369).
* Adaptive proposals: after ``adapt_start`` iterations the proposal
  covariance is the running ddof=0 covariance of the stored chain plus
  ``1e-4 I`` (reference pmcmc.py:327-328), maintained as a Welford
  accumulator in the carry.

Naming note: the reference calls the number of MCMC iterations ``n_chains``;
here it is ``n_iters``, and ``chains`` always means *parallel* chains.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.base import CompartmentModel
from ..smc.filter import particle_filter
from ..smc.paths import sample_path
from .adaptive import Welford


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PMMHResult:
    """thetas: [n_iters, d]; log_likelihoods: [n_iters] (log of the
    reference's ``likelihoods``); sampled_trajs: [n_iters, T, C];
    acceptances: scalar int (the reference's live acceptance counter,
    pmcmc.py:323, 396)."""

    thetas: jnp.ndarray
    log_likelihoods: jnp.ndarray
    sampled_trajs: jnp.ndarray
    acceptances: jnp.ndarray

    def acceptance_rate(self):
        return self.acceptances / self.thetas.shape[0]


def _filter_ll_and_path(
    model,
    obs_loglik,
    key,
    y,
    model_theta,
    obs_param,
    n_particles,
    n_population,
    mu,
    steps_per_unit,
    resampling,
    sampler,
):
    k_pf, k_path = jax.random.split(key)
    res = particle_filter(
        model,
        obs_loglik,
        k_pf,
        y,
        model_theta,
        obs_param,
        n_particles=n_particles,
        n_population=n_population,
        mu=mu,
        steps_per_unit=steps_per_unit,
        resampling=resampling,
        sampler=sampler,
    )
    traj = sample_path(k_path, res.hidden, res.ancestry)
    return res.log_likelihood, traj


def _split_theta(theta, infer_obs_param, fixed_obs_param):
    """theta -> (model_theta, obs_param, stored_theta)."""
    if infer_obs_param:
        p = jnp.clip(theta[-1], 0.0, 1.0)
        stored = theta.at[-1].set(p)
        return theta[:-1], p, stored
    return theta, fixed_obs_param, theta


def particle_mcmc(
    model: CompartmentModel,
    obs_loglik,
    key,
    y,
    parameters,
    h,
    adaptive: bool = False,
    sigma: Optional[jnp.ndarray] = None,
    n_iters: int = 1000,
    obs_param=0.1,
    infer_obs_param: bool = False,
    n_particles: int = 1000,
    n_population=4820,
    mu=20.0,
    steps_per_unit: int = 20,
    resampling: str = "systematic",
    adapt_start: int = 1000,
    n_init_attempts: int = 16,
    pool_axes: tuple = (),
    sampler: str = "fast",
) -> PMMHResult:
    """Run one PMMH chain.  Mirrors ``particle_mcmc`` (reference
    pmcmc.py:251-408) with ``obs_param``/``infer_obs_param`` replacing the
    reference's overloaded ``probs`` (a float, or None meaning "infer").

    Fully traceable: wrap in ``jax.vmap`` over ``key`` for parallel chains,
    ``jax.jit`` for compilation.  ``parameters`` is the reference's initial
    theta (the MVN proposal is centred on the previous sample; ``parameters``
    only seeds the init search, reference pmcmc.py:276-310).
    """
    parameters = jnp.asarray(parameters, jnp.float32)
    d = parameters.shape[0]
    sigma0 = jnp.eye(d, dtype=jnp.float32) if sigma is None else jnp.asarray(
        sigma, jnp.float32
    )
    h = jnp.asarray(h, jnp.float32)
    t_len, _ = y.shape
    c_latent = model.num_compartments

    run_filter = partial(
        _filter_ll_and_path,
        model,
        obs_loglik,
        n_particles=n_particles,
        n_population=n_population,
        mu=mu,
        steps_per_unit=steps_per_unit,
        resampling=resampling,
        sampler=sampler,
    )

    def propose(k, center, cov):
        z = jax.random.normal(k, (d,))
        chol = jnp.linalg.cholesky(h * cov)
        return center + chol @ z

    # ---- init search: draw candidates around `parameters` until the filter
    # returns a finite likelihood (reference pmcmc.py:276-310).  Vectorized:
    # n_init_attempts candidates evaluated in parallel, first valid one wins.
    k_init, k_chain = jax.random.split(key)
    init_keys = jax.random.split(k_init, n_init_attempts)

    def init_attempt(k):
        k_prop, k_f = jax.random.split(k)
        theta_c = propose(k_prop, parameters, sigma0)
        nonneg = jnp.all(theta_c >= 0.0)
        m_theta, o_param, stored = _split_theta(
            theta_c, infer_obs_param, obs_param
        )
        ll, traj = run_filter(key=k_f, y=y, model_theta=m_theta, obs_param=o_param)
        valid = nonneg & jnp.isfinite(ll)
        return stored, jnp.where(valid, ll, -jnp.inf), traj, valid

    thetas0, lls0, trajs0, valids0 = jax.vmap(init_attempt)(init_keys)
    first = jnp.argmax(valids0)  # first True (0 if none valid)
    theta_init = thetas0[first]
    ll_init = lls0[first]
    traj_init = trajs0[first]
    # if no attempt was valid, start from `parameters` with -inf likelihood:
    # the first finite proposal is then accepted with probability 1.
    any_valid = jnp.any(valids0)
    theta_init = jnp.where(any_valid, theta_init, jnp.clip(parameters, 0.0))
    ll_init = jnp.where(any_valid, ll_init, -jnp.inf)

    # ---- main chain
    w0 = Welford.init(d)
    w0 = w0.update(theta_init)  # thetas[0] enters the adaptive history

    def step(carry, k):
        theta, ll, traj, w, accepts, i = carry
        k_prop, k_f, k_u = jax.random.split(k, 3)

        cov = sigma0
        if adaptive:
            w_eff = w
            for ax in pool_axes:
                # pool adaptation statistics across parallel chains — a
                # collective-powered upgrade over the reference's per-run
                # covariance (no reference counterpart; chains there are
                # separate script invocations)
                w_eff = w_eff.pooled(ax)
            use_adapt = i > adapt_start
            cov = jnp.where(use_adapt, w_eff.covariance(jitter=1e-4), sigma0)

        theta_prop = propose(k_prop, theta, cov)
        nonneg = jnp.all(theta_prop >= 0.0)
        m_theta, o_param, stored = _split_theta(
            theta_prop, infer_obs_param, obs_param
        )
        ll_prop, traj_prop = run_filter(
            key=k_f, y=y, model_theta=m_theta, obs_param=o_param
        )

        # log MH ratio; the proposal-density factors cancel (see module doc)
        log_ratio = ll_prop - ll
        log_u = jnp.log(jax.random.uniform(k_u))
        accept = nonneg & jnp.isfinite(ll_prop) & (log_u < log_ratio)

        theta = jnp.where(accept, stored, theta)
        ll = jnp.where(accept, ll_prop, ll)
        traj = jnp.where(accept, traj_prop, traj)
        w = w.update(theta)
        accepts = accepts + accept.astype(jnp.int32)
        return (theta, ll, traj, w, accepts, i + 1), (theta, ll, traj)

    keys = jax.random.split(k_chain, n_iters - 1)
    carry0 = (
        theta_init,
        ll_init,
        traj_init,
        w0,
        jnp.asarray(1, jnp.int32),
        jnp.asarray(1, jnp.int32),
    )
    (_, _, _, _, accepts, _), (thetas, lls, trajs) = jax.lax.scan(
        step, carry0, keys
    )

    thetas = jnp.concatenate([theta_init[None], thetas], axis=0)
    lls = jnp.concatenate([ll_init[None], lls], axis=0)
    trajs = jnp.concatenate([traj_init[None], trajs], axis=0)
    del c_latent, t_len
    return PMMHResult(
        thetas=thetas,
        log_likelihoods=lls,
        sampled_trajs=trajs,
        acceptances=accepts,
    )


@partial(
    jax.jit,
    static_argnums=(0, 1, 6, 8, 10, 11, 14, 15, 16, 17, 18),
)
def particle_mcmc_jit(
    model,
    obs_loglik,
    key,
    y,
    parameters,
    h,
    adaptive=False,
    sigma=None,
    n_iters=1000,
    obs_param=0.1,
    infer_obs_param=False,
    n_particles=1000,
    n_population=4820,
    mu=20.0,
    steps_per_unit=20,
    resampling="systematic",
    adapt_start=1000,
    n_init_attempts=16,
    sampler="fast",
):
    return particle_mcmc(
        model, obs_loglik, key, y, parameters, h,
        adaptive=adaptive, sigma=sigma, n_iters=n_iters, obs_param=obs_param,
        infer_obs_param=infer_obs_param, n_particles=n_particles,
        n_population=n_population, mu=mu, steps_per_unit=steps_per_unit,
        resampling=resampling, adapt_start=adapt_start,
        n_init_attempts=n_init_attempts, sampler=sampler,
    )


@partial(
    jax.jit,
    static_argnums=(0, 1, 6, 8, 10, 11, 14, 15, 16, 17, 18),
)
def _chains_jit(
    model,
    obs_loglik,
    keys,
    y,
    parameters,
    h,
    adaptive,
    sigma,
    n_iters,
    obs_param,
    infer_obs_param,
    n_particles,
    n_population,
    mu,
    steps_per_unit,
    resampling,
    adapt_start,
    n_init_attempts,
    sampler,
):
    fn = lambda k: particle_mcmc(
        model, obs_loglik, k, y, parameters, h,
        adaptive=adaptive, sigma=sigma, n_iters=n_iters, obs_param=obs_param,
        infer_obs_param=infer_obs_param, n_particles=n_particles,
        n_population=n_population, mu=mu, steps_per_unit=steps_per_unit,
        resampling=resampling, adapt_start=adapt_start,
        n_init_attempts=n_init_attempts, sampler=sampler,
    )
    return jax.vmap(fn)(keys)


def particle_mcmc_chains(
    model,
    obs_loglik,
    key,
    y,
    parameters,
    h,
    n_chains: int = 8,
    adaptive: bool = False,
    sigma=None,
    n_iters: int = 1000,
    obs_param=0.1,
    infer_obs_param: bool = False,
    n_particles: int = 1000,
    n_population=4820,
    mu=20.0,
    steps_per_unit: int = 20,
    resampling: str = "systematic",
    adapt_start: int = 1000,
    n_init_attempts: int = 16,
    sampler: str = "fast",
) -> PMMHResult:
    """Run ``n_chains`` independent PMMH chains vmapped on one device, as ONE
    compiled XLA program (eager dispatch through the tunneled TPU costs
    ~30 s/call regardless of work — everything must run under jit).
    Result arrays gain a leading chains axis.  The reference's counterpart is
    re-running the script into run1/run2/run3 directories
    (reference tests/test_pmcmc_noisy.py:254-256)."""
    keys = jax.random.split(key, n_chains)
    return _chains_jit(
        model, obs_loglik, keys, y,
        jnp.asarray(parameters, jnp.float32), h, adaptive, sigma, n_iters,
        obs_param, infer_obs_param, n_particles, n_population, mu,
        steps_per_unit, resampling, adapt_start, n_init_attempts, sampler,
    )
