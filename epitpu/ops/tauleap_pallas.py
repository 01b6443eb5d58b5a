"""Fused tau-leap propagation as a single Pallas TPU kernel.

The XLA path (epitpu.sim.tauleap.advance) runs ``steps_per_unit`` substeps as
a ``lax.scan``; each substep round-trips the particle state and four random
streams through HBM and pays per-op scheduling overhead.  This kernel keeps
one chain's particle cloud resident in VMEM for ALL substeps of a one-unit
propagation and draws randomness from the on-core PRNG
(``pltpu.prng_random_bits``): one kernel launch replaces the whole substep
scan, and the only HBM traffic is the state in and out.  Measured on TPU v5e:
~0.1 ms for 20 substeps x 32 chains x 4096 particles vs ~13 ms for the XLA
scan path — the particle-propagation cost essentially disappears from the
PMMH iteration.

Sampling law matches epitpu.sim.samplers.fast_binomial (two-regime binomial:
exact inverse-CDF below mean 8, Cornish-Fisher-corrected normal above), with
the normal variate produced by Box-Muller from two on-core uniforms instead
of a threefry normal — equivalent in distribution, validated against the
exact SSA in tests/test_ops.py.

STATUS — why this is NOT the default filter path: on the current runtime a
``pallas_call`` embedded in a ``lax.scan`` body costs ~16 ms of fixed
per-call overhead per trip (measured: scan of 2 trips = 40 ms, 14 trips =
229 ms, while 10 pipelined top-level calls average 0.09 ms each).  The
particle filter and PMMH are sequential scans, so the fused kernel loses to
the plain XLA substep scan (~60 us/trip) despite being ~100x faster in raw
kernel time.  Use this op for *top-level pipelined* propagation workloads
(batched forward simulation, ABC candidate sweeps); revisit as the platform's
custom-call dispatch improves.

Because every sequential-loop use is ruled out by that per-trip overhead,
the per-chain fused ``pallas_advance`` op (advance WITHOUT trajectory
recording, plus its custom_vmap flattening machinery) had no production
path and was removed in round 3; ``pallas_simulate`` — the per-lane
trajectory-recording variant — covers every top-level pipelined workload
the framework ships (ABC candidate sweeps, posterior-predictive forecasts,
app overlays).

Layout: the kernel works on x as [C, N/128, 128] compartment planes (lane
dimension 128); wrappers transpose from the filter's [..., N, C] layout at
the boundary (12 KB per call — negligible).

Replaces the reference PF's per-particle joblib Gillespie fan-out
(reference pmcmc.py:200-220) on the TPU fast path.
"""
from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np

SMALL_MEAN_MAX = 8.0
SMALL_K = 20  # kept in sync with epitpu.sim.samplers
_LANES = 128


def pallas_advance_available() -> bool:
    """True when the default backend can run Mosaic TPU kernels."""
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def _uniform(shape):
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _normal(shape):
    """Box-Muller from two on-core uniforms."""
    u1 = jnp.maximum(_uniform(shape), 1e-12)
    u2 = _uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * np.pi) * u2)


def _binomial_small_exact(u, n, p):
    """Exact inverse-CDF, truncated at SMALL_K terms (same scheme as
    epitpu.sim.samplers._binomial_small_exact).  NOTE: expm1/log1p are not
    lowered by Mosaic; plain exp/log are accurate enough here (p <= 1/2
    after the caller's flip, hazards are small)."""
    p = jnp.clip(p, 0.0, 1.0 - 1e-7)
    ratio = p / (1.0 - p)
    pmf = jnp.exp(n * jnp.log(1.0 - p))
    cdf = pmf
    x = jnp.zeros_like(u)
    for k in range(SMALL_K - 1):
        x = x + (u >= cdf).astype(u.dtype)
        pmf = jnp.maximum(pmf * (n - k) / (k + 1.0) * ratio, 0.0)
        cdf = cdf + pmf
    x = x + (u >= cdf).astype(u.dtype)
    return jnp.minimum(x, n)


def _binomial_normal_cf(z, n, p):
    lam = n * p
    sig = jnp.sqrt(jnp.maximum(lam * (1.0 - p), 1e-12))
    gamma = (1.0 - 2.0 * p) / sig
    zc = z + gamma * (z * z - 1.0) / 6.0
    return jnp.clip(jnp.floor(lam + sig * zc + 0.5), 0.0, n)


def _binomial(n, p):
    """Batched two-regime Binomial(n, p) on in-kernel randomness."""
    p = jnp.clip(p, 0.0, 1.0)
    flip = p > 0.5
    p_eff = jnp.where(flip, 1.0 - p, p)
    lam = n * p_eff
    u = _uniform(n.shape)
    z = _normal(n.shape)
    small = _binomial_small_exact(u, n, p_eff)
    large = _binomial_normal_cf(z, n, p_eff)
    x = jnp.where(lam < SMALL_MEAN_MAX, small, large)
    x = jnp.where(flip, n - x, x)
    x = jnp.where(p == 0.0, jnp.zeros_like(x), x)
    return jnp.where(p == 1.0, n, x)


def _make_substep(model, dt: float, theta):
    """One tau-leap substep over a tuple of [n_rows, 128] compartment planes.
    ``theta`` is either a [d] vector (one parameter set per grid cell) or a
    [n_rows, 128, d] plane stack (one parameter set PER LANE — every lane an
    independent candidate); the models' rate functions broadcast both."""
    c_dim = model.num_compartments
    stoich = model.stoich  # np [R, C]
    source = model.source.tolist()
    r_dim = int(stoich.shape[0])

    def substep(_, x):
        xs = jnp.stack(x, axis=-1)  # [n_rows, 128, C]
        rates = model.rate_fn(xs, theta)  # [n_rows, 128, R]
        counts = []
        for r in range(r_dim):
            src = x[source[r]]
            a_r = jnp.clip(rates[..., r], 0.0)
            mu = jnp.where(src > 0, a_r / jnp.maximum(src, 1.0), 0.0)
            p_fire = jnp.clip(1.0 - jnp.exp(-mu * dt), 0.0, 1.0)
            counts.append(_binomial(src, p_fire))
        x = list(x)
        for c in range(c_dim):
            delta = None
            for r in range(r_dim):
                s = float(stoich[r, c])
                if s == 0.0:
                    continue
                term = counts[r] if s == 1.0 else counts[r] * s
                delta = term if delta is None else delta + term
            if delta is not None:
                x[c] = x[c] + delta
        return tuple(x)

    return substep


def _make_traj_kernel(model, t_max: int, n_sub: int, dt: float):
    """Trajectory-recording kernel with PER-LANE parameters: every lane of
    the [n_rows, 128] tile carries its own (theta, x0) candidate, so one grid
    cell advances ``n_rows * 128`` independent trajectories and records the
    state at every integer time.  This is the top-level pipelined-propagation
    shape (ABC candidate sweeps, posterior-predictive forecasts, app
    overlays) where the fused kernel wins — see module STATUS note.

    refs: seed [G] SMEM; theta [1, d, n_rows, 128] VMEM;
    x [1, C, n_rows, 128] VMEM; out [1, t_max+1, C, n_rows, 128] VMEM.
    """
    c_dim = model.num_compartments

    def kernel(seed_ref, theta_ref, x_ref, o_ref):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        pid = pl.program_id(0)
        pltpu.prng_seed(seed_ref[pid])
        theta = jnp.stack(
            [theta_ref[0, j] for j in range(model.theta_dim)], axis=-1
        )  # [n_rows, 128, d]
        substep = _make_substep(model, dt, theta)
        x = tuple(x_ref[0, c] for c in range(c_dim))
        for c in range(c_dim):
            o_ref[0, 0, c] = x[c]
        for t in range(1, t_max + 1):  # static unroll over units
            x = jax.lax.fori_loop(0, n_sub, substep, x)
            for c in range(c_dim):
                o_ref[0, t, c] = x[c]

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _pallas_simulate_impl(model, seeds, xp, thetap, t_max, steps_per_unit,
                          n_rows):
    """xp [G, C, n_rows, 128], thetap [G, d, n_rows, 128], seeds [G] i32
    -> [G, t_max+1, C, n_rows, 128]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, c_dim = xp.shape[0], xp.shape[1]
    d = thetap.shape[1]
    dt = 1.0 / steps_per_unit
    kernel = _make_traj_kernel(model, t_max, steps_per_unit, dt)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=jax.ShapeDtypeStruct(
            (g, t_max + 1, c_dim, n_rows, _LANES), jnp.float32
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seeds [G]
            pl.BlockSpec(
                (1, d, n_rows, _LANES),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c_dim, n_rows, _LANES),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t_max + 1, c_dim, n_rows, _LANES),
            lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(seeds, thetap, xp)


def pallas_simulate_supported(model, batch: int) -> bool:
    """Whether the fused per-lane trajectory kernel can run: TPU backend,
    one reaction per source compartment, batch a multiple of 128 lanes."""
    return (
        pallas_advance_available()
        and model.sources_unique
        and batch >= _LANES
        and batch % _LANES == 0
    )


def pallas_simulate(model, seed, x0, theta, t_max, steps_per_unit=20):
    """Fused batched forward simulation recording integer-time states: ONE
    kernel launch advances ``B`` independent (theta, x0) candidates through
    ``t_max * steps_per_unit`` substeps entirely in VMEM with on-core
    randomness, each candidate in its own VPU lane.

    The device equivalent of the reference's per-candidate Python Gillespie
    runs aligned to the integer grid (reference abc_algo.py:41-93,
    pred_tmps.py:55-64), replacing the XLA substep-scan path
    (epitpu.sim.tauleap.simulate) on the ABC / forecast / app-overlay fast
    paths — those call it at TOP level (pipelined dispatch), where it is
    ~100x cheaper than inside a sequential scan (see STATUS note).

    Args: seed scalar int32 (per-cell streams derived); x0 [B, C] float32;
    theta [B, d] float32; B must satisfy ``pallas_simulate_supported``.
    Returns [B, t_max+1, C].
    """
    x0 = jnp.asarray(x0, jnp.float32)
    theta = jnp.asarray(theta, jnp.float32)
    b, c_dim = x0.shape
    d = theta.shape[-1]
    if b % _LANES:
        raise ValueError(f"batch must be a multiple of {_LANES}, got {b}")
    m = b // _LANES
    # pack up to 8 sublanes per grid cell (the native 8x128 VPU tile)
    n_rows = next(r for r in (8, 7, 6, 5, 4, 3, 2, 1) if m % r == 0)
    g = m // n_rows
    seeds = jnp.asarray(seed, jnp.int32) + jnp.arange(g, dtype=jnp.int32)
    xp = x0.reshape(g, n_rows, _LANES, c_dim).transpose(0, 3, 1, 2)
    thetap = theta.reshape(g, n_rows, _LANES, d).transpose(0, 3, 1, 2)
    out = _pallas_simulate_impl(
        model, seeds, xp, thetap, int(t_max), int(steps_per_unit), n_rows
    )  # [G, T+1, C, rows, 128]
    return out.transpose(0, 3, 4, 1, 2).reshape(b, t_max + 1, c_dim)
