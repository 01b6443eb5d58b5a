"""Device forward simulator: vectorized Euler-multinomial tau-leaping.

This replaces the reference's per-particle Python Gillespie event loop
(reference gillespie_algo.py:48-73: draw tau ~ Exp, draw reaction, update,
repeat) with a fixed-step scheme that is TPU-friendly: static shapes, fully
unrolled substeps inside one XLA computation, and ONE batched binomial draw
per substep for the whole particle cloud.

Scheme (chain-binomial / Euler-multinomial, the standard discretization used
by pomp's ``reulermultinom``): over a substep of length dt, reaction r with
per-capita hazard mu_r fires

    n_r ~ Binomial(x[source_r], 1 - exp(-mu_r * dt))

(competing hazards per source compartment when several reactions share one —
the built-in models don't, so each substep is a single [..., R] binomial).
This keeps counts non-negative *exactly* (no clipping bias) and converges to
the exact SSA law as dt -> 0; ``steps_per_unit`` is the accuracy knob.
(A midpoint predictor variant was tried and *increased* bias for these
convex-growth epidemics, so it was removed.)

Absorbing states need no special handling: when the infectious compartments
hit zero all rates vanish and the binomials draw zeros, freezing the state —
the same effect as the reference's ``while I > 0`` loop exit
(reference gillespie_algo.py:48, 119, 193).

States are float32 holding integer values (exact below 2^24), which keeps
everything on the VPU without casts.  Binomial draws use the fast hybrid
sampler (epitpu.sim.samplers) by default; pass ``sampler="exact"`` for
gold-standard validation runs.

Performance note: per-op dispatch overhead on the tunneled TPU is enormous
(~hundreds of us), so this kernel must always run INSIDE an enclosing
``jax.jit`` (the filter/PMMH entry points are jitted).  Within one compiled
program a ``lax.scan`` trip costs ~1 us, so the substep loop uses a modest
``unroll`` (default 10; bench A/B at production shapes: unroll 4 -> 2562
iters/s, 10 -> 2627, 20 -> 2546) — full unrolling at larger configs also
blew XLA compile time past 10 minutes on this 2-vCPU host.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.base import CompartmentModel
from .samplers import get_binomial_sampler


def _to_rbg(key):
    """Re-wrap a (threefry) PRNG key as an ``rbg`` key.  The rbg impl draws
    its bits from the TPU's hardware RNG instruction instead of running the
    threefry hash on the VPU; measured ~1.2-1.45x faster whole-propagation at
    production shapes (threefry bits are ~70% of the propagate phase — see
    PROFILE.json).  Still fully deterministic given the key; the stream just
    differs from threefry's (and may differ across backends), which is why it
    is opt-in via ``sampler="fast_rbg"`` rather than the default."""
    if jnp.issubdtype(jnp.asarray(key).dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = jnp.asarray(key)
    # concatenate along the last axis (batch-safe: (B, 2) -> (B, 4); a
    # plain tile+slice would corrupt batched key shapes) and idempotent for
    # keys that are already 4-word rbg data
    return jax.random.wrap_key_data(
        jnp.concatenate([data, data], axis=-1)[..., :4], impl="rbg"
    )


def _resolve_rng(key, sampler):
    """``sampler`` may carry an ``_rbg`` suffix selecting the hardware-RNG
    key impl; returns (possibly converted key, base sampler name)."""
    if sampler.endswith("_rbg"):
        return _to_rbg(key), sampler[: -len("_rbg")]
    return key, sampler


def _per_capita(model, x, rates):
    """Per-capita hazards mu[r] = a_r / x[source[r]], NaN-proofed.  The clip
    matters: PMMH evaluates proposals unconditionally under vmap and discards
    negative-theta ones afterwards, so a garbage theta must not poison the
    chain with NaNs."""
    src_x = jnp.take(x, jnp.asarray(model.source), axis=-1)
    return jnp.where(src_x > 0, jnp.clip(rates, 0.0) / jnp.maximum(src_x, 1.0), 0.0)


def _exit_counts(model: CompartmentModel, key, x, mu, dt, binomial):
    """Sample per-reaction event counts for one substep given per-capita
    hazards ``mu [..., R]``.  x: [..., C] -> counts [..., R]."""
    src = jnp.asarray(model.source)

    if model.sources_unique:
        # one reaction per source compartment: sample each reaction directly
        src_x = jnp.take(x, src, axis=-1)  # [..., R]
        p_fire = jnp.clip(-jnp.expm1(-mu * dt), 0.0, 1.0)
        return binomial(key, src_x, p_fire)

    # Generic path: competing hazards — total exits per compartment, then
    # split among its reactions with conditional binomials (static unroll).
    onehot = model.source_onehot()  # [R, C]
    lam = mu @ onehot  # [..., C] total per-capita exit hazard
    p_exit = jnp.clip(-jnp.expm1(-lam * dt), 0.0, 1.0)
    keys = jax.random.split(key, model.num_reactions + 1)
    n_exit = binomial(keys[0], x, p_exit)  # [..., C]

    counts = []
    remaining = n_exit
    rem_rate = lam
    src_list = model.source.tolist()
    for r in range(model.num_reactions):
        c = src_list[r]
        is_last = src_list[(r + 1):].count(c) == 0
        rem_c = remaining[..., c]
        if is_last:
            n_r = rem_c
        else:
            frac = jnp.clip(
                mu[..., r] / jnp.maximum(rem_rate[..., c], 1e-30), 0.0, 1.0
            )
            n_r = binomial(keys[r + 1], rem_c, frac)
        counts.append(n_r)
        remaining = remaining.at[..., c].add(-n_r)
        rem_rate = rem_rate.at[..., c].add(-mu[..., r])
    return jnp.stack(counts, axis=-1)


def substep(model: CompartmentModel, key, x, theta, dt, sampler="fast"):
    """Advance the state by one tau-leap substep of length dt."""
    key, sampler = _resolve_rng(key, sampler)
    binomial = get_binomial_sampler(sampler)
    stoich = model.stoich_jnp(x.dtype)
    rates = model.rate_fn(x, theta)
    mu = _per_capita(model, x, rates)
    n_events = _exit_counts(model, key, x, mu, dt, binomial)  # [..., R]
    return x + n_events @ stoich


@partial(jax.jit, static_argnums=(0, 4, 5, 6, 7))
def advance(
    model: CompartmentModel,
    key,
    x,
    theta,
    t_span,
    steps_per_unit=20,
    sampler="fast",
    unroll: int = 10,
):
    """Advance by ``t_span`` time units using ``t_span * steps_per_unit``
    substeps (scan with modest unroll — see module perf note).  Replaces the
    reference PF's per-particle joblib fan-out of one-unit Gillespie runs
    (reference pmcmc.py:200-220).  x: [..., C]."""
    n_steps = int(round(t_span * steps_per_unit))
    dt = t_span / n_steps
    key, sampler = _resolve_rng(key, sampler)

    def body(x, k):
        return substep(model, k, x, theta, dt, sampler), None

    keys = jax.random.split(key, n_steps)
    x_final, _ = jax.lax.scan(
        body, x, keys, unroll=min(unroll, n_steps)
    )
    return x_final


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def simulate(
    model: CompartmentModel,
    key,
    x0,
    theta,
    t_max,
    steps_per_unit=20,
    sampler="fast",
):
    """Simulate forward and record the state at integer times 0..t_max.

    Returns ``[t_max + 1, ..., C]`` (time-major).  This is the device
    equivalent of running the reference SSA with ``last_values_only=False``
    and aligning the event trajectory to the integer grid, as the ABC driver
    does by hand (reference abc_algo.py:55-93).
    """

    def unit(x, k):
        x_next = advance(model, k, x, theta, 1.0, steps_per_unit, sampler)
        return x_next, x_next

    keys = jax.random.split(key, int(t_max))
    _, traj = jax.lax.scan(unit, x0, keys)
    return jnp.concatenate([x0[None], traj], axis=0)
