"""Ancestral path sampling: draw one latent trajectory from filter output.

Reference equivalent: ``particle_path_sampler`` (reference pmcmc.py:236-248)
— pick a uniform terminal particle and walk the ancestry matrix backwards.
Implemented as a reverse ``lax.scan`` so it fuses into the PMMH step.

Indexing note: ``ancestry[p, j]`` maps the particle occupying slot j *after*
the resample at step p to its parent index in ``hidden[p-1]``.  The correct
backward recursion is therefore ``j_{p} = ancestry[p+1, j_{p+1}]``; the
reference uses ``ancestry[p, j]`` (an off-by-one, reference pmcmc.py:244-246),
which still yields a distributionally plausible path for plotting but not a
genealogically consistent one.  We implement the consistent walk; the sampled
path only feeds trajectory plots/storage, so posterior over theta is
unaffected either way.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_path(key, hidden, ancestry, terminal_logw=None):
    """hidden: [T, N, C], ancestry: [T, N] -> trajectory [T, C].

    ``terminal_logw`` ([N] log-weights): when the filter ran with
    ESS-triggered conditional resampling the terminal particles carry
    non-uniform residual weights, and the terminal slot must be drawn
    categorically from them for the path to be a draw from the smoothing
    distribution.  ``None`` (always-resample filters) keeps the reference's
    uniform terminal pick (reference pmcmc.py:238)."""
    t_len, n_particles, _ = hidden.shape
    if terminal_logw is None:
        j_last = jax.random.randint(key, (), 0, n_particles)
    else:
        j_last = jax.random.categorical(key, terminal_logw)

    def back(j, p):
        # moving from time p to p-1: parent of slot j is ancestry[p, j]
        j_prev = ancestry[p, j]
        return j_prev, j_prev

    ps = jnp.arange(t_len - 1, 0, -1)
    _, parents = jax.lax.scan(back, j_last, ps)
    # indices per time step: [j at T-1, parents give j at T-2..0]
    idx = jnp.concatenate([parents[::-1], j_last[None]])
    return jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0, :]
