"""Exact Gillespie SSA as a *device* kernel, generic over a CompartmentModel.

Same law as the reference's per-model Python event loops
(reference gillespie_algo.py:48-73, 119-141, 193-222): draw
tau ~ Exp(1/sum(a)), pick reaction j ~ Categorical(a/sum(a)), apply the
stoichiometry, stop when the next event would pass ``max_time`` or all rates
vanish.  Instead of one Python loop per particle behind a joblib pool, this
runs the whole batch under one ``lax.while_loop`` with a static event-count
cap: finished lanes are masked out and the loop exits when every lane is done.

For SIR-type models each individual can undergo at most a bounded number of
transitions, so ``max_events = ceil(events_per_individual) * population`` is
a true upper bound (2N for SIR, 3N for SEIR), making the cap safe, not a
truncation.

This exact kernel is the validation oracle for the tau-leap production path
(epitpu.sim.tauleap) and an optional ``method="exact"`` backend for the
particle filter.  A numpy oracle for tiny cases lives in
:func:`simulate_exact_np`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import CompartmentModel


@partial(jax.jit, static_argnums=(0, 4, 5))
def exact_advance(
    model: CompartmentModel,
    key,
    x,
    theta,
    t_span: float,
    max_events: int,
):
    """Advance a batch ``x: [B, C]`` by ``t_span`` using exact SSA.

    Returns the state at time ``t_span`` (the last state before the first
    event past the horizon — identical semantics to the reference's
    ``last_values_only=True`` path, reference gillespie_algo.py:65-73).
    """
    stoich = model.stoich_jnp(x.dtype)  # [R, C]
    b = x.shape[0]

    def cond(carry):
        _, t, _, n_events, active = carry
        return jnp.any(active) & (n_events < max_events)

    def body(carry):
        x, t, key, n_events, active = carry
        key, k_tau, k_j = jax.random.split(key, 3)
        rates = jnp.clip(model.rate_fn(x, theta), 0.0)  # [B, R]
        total = jnp.sum(rates, axis=-1)  # [B]
        alive = active & (total > 0.0)
        safe_total = jnp.where(alive, total, 1.0)
        tau = jax.random.exponential(k_tau, (b,)) / safe_total
        t_new = t + tau
        in_time = t_new <= t_span
        fire = alive & in_time
        # categorical over R via inverse CDF (R is small)
        cdf = jnp.cumsum(rates, axis=-1) / safe_total[:, None]
        u = jax.random.uniform(k_j, (b, 1))
        j = jnp.sum((cdf < u).astype(jnp.int32), axis=-1)
        j = jnp.clip(j, 0, stoich.shape[0] - 1)
        delta = jnp.take(stoich, j, axis=0)  # [B, C]
        x = jnp.where(fire[:, None], x + delta, x)
        t = jnp.where(fire, t_new, t)
        active = fire  # lanes stop once past horizon or rate-dead
        return (x, t, key, n_events + 1, active)

    t0 = jnp.zeros((b,), x.dtype)
    active0 = jnp.ones((b,), bool)
    x_f, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x, t0, key, jnp.asarray(0), active0)
    )
    return x_f


@partial(jax.jit, static_argnums=(0, 4, 5))
def exact_simulate_grid(
    model: CompartmentModel,
    key,
    x,
    theta,
    t_max: int,
    max_events_per_unit: int,
):
    """Exact SSA recorded at integer times 0..t_max for a batch ``[B, C]``.
    Returns ``[t_max + 1, B, C]``.  Equivalent to the reference's full
    trajectory aligned to the integer grid by hand (reference
    abc_algo.py:55-93)."""

    def unit(x, k):
        x_next = exact_advance(model, k, x, theta, 1.0, max_events_per_unit)
        return x_next, x_next

    keys = jax.random.split(key, int(t_max))
    _, traj = jax.lax.scan(unit, x, keys)
    return jnp.concatenate([x[None], traj], axis=0)


def default_max_events(model: CompartmentModel, population) -> int:
    """A safe static event cap: each individual moves through at most
    C-1 compartment transitions."""
    pop = int(np.sum(np.asarray(population)))
    return int((len(model.compartments) - 1) * pop + 16)


# ---------------------------------------------------------------------------
# numpy oracle (tiny populations only — per-event Python dispatch)


def simulate_exact_np(model, rng, x0, theta, max_time, rate_fn_np=None):
    """Host SSA oracle.  ``rate_fn_np`` may supply a numpy rate function;
    otherwise the model's jnp rate_fn is used (slow — tests/tiny cases only).
    Returns (times, states)."""
    x = np.asarray(x0, dtype=np.float64).copy()
    theta_np = np.asarray(theta, dtype=np.float64)
    stoich = model.stoich.astype(np.float64)
    rate = rate_fn_np or (lambda x, th: np.asarray(model.rate_fn(x, th)))
    t = 0.0
    times = [0.0]
    states = [x.copy()]
    while True:
        rates = np.clip(np.asarray(rate(x, theta_np), dtype=np.float64), 0.0, None)
        total = rates.sum()
        if total <= 0.0:
            break
        tau = rng.exponential(1.0 / total)
        if t + tau > max_time:
            break
        j = rng.choice(len(rates), p=rates / total)
        x = x + stoich[j]
        t += tau
        times.append(t)
        states.append(x.copy())
    return np.asarray(times), np.asarray(states)


def grid_from_events(times, states, t_max):
    """Align an event trajectory to integer times 0..t_max -> [t_max+1, C]."""
    idx = np.searchsorted(times, np.arange(t_max + 1) + 1e-12, side="left") - 1
    idx = np.clip(idx, 0, len(times) - 1)
    return states[idx]
