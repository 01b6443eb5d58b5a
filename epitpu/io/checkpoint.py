"""Resumable chain checkpoints.

The reference's only resume mechanism is the manual warm-restart from CSVs
(reference tests/test_pmcmc_p.py:34-45).  For long multi-host runs we
checkpoint the *full* sampler state — current theta, log-likelihood, current
trajectory, Welford adaptation statistics, PRNG key, and step counter — so a
killed run resumes bit-compatibly rather than approximately.

Two layers:

* ``save_pmmh_checkpoint`` / ``load_pmmh_checkpoint`` — the production path:
  persists a (chain-batched) ``epitpu.mcmc.PMMHState`` plus the master PRNG
  key, total iteration count, and the chain history produced so far; feeds
  straight back into ``particle_mcmc_chains(init_state=...)`` (the runner's
  ``--checkpoint-every`` / ``--resume`` flags drive this).
* ``save_checkpoint`` / ``load_checkpoint`` — the raw single-state record
  (kept for direct library use).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mcmc.adaptive import Welford
from ..mcmc.pmmh import PMMHState


@dataclasses.dataclass
class ChainCheckpoint:
    step: int
    theta: np.ndarray
    log_likelihood: np.ndarray
    trajectory: np.ndarray
    welford_count: np.ndarray
    welford_mean: np.ndarray
    welford_m2: np.ndarray
    key: np.ndarray
    acceptances: np.ndarray

    def welford(self) -> Welford:
        return Welford(
            count=jnp.asarray(self.welford_count),
            mean=jnp.asarray(self.welford_mean),
            m2=jnp.asarray(self.welford_m2),
        )


def save_checkpoint(path, step, theta, log_likelihood, trajectory, welford,
                    key, acceptances):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    np.savez(
        tmp,
        step=np.asarray(step),
        theta=np.asarray(theta),
        log_likelihood=np.asarray(log_likelihood),
        trajectory=np.asarray(trajectory),
        welford_count=np.asarray(welford.count),
        welford_mean=np.asarray(welford.mean),
        welford_m2=np.asarray(welford.m2),
        key=np.asarray(jax.random.key_data(key) if jnp.issubdtype(
            jnp.asarray(key).dtype, jax.dtypes.prng_key) else key),
        acceptances=np.asarray(acceptances),
    )
    # np.savez appends .npz to the temp name
    os.replace(tmp + ".npz", path)


def _key_data(key):
    arr = jnp.asarray(key)
    if jnp.issubdtype(arr.dtype, jax.dtypes.prng_key):
        return np.asarray(jax.random.key_data(key))
    return np.asarray(key)


@dataclasses.dataclass
class PMMHCheckpoint:
    """A resumable multi-chain PMMH run snapshot.

    state: PMMHState with leading chains axis — pass to
      ``particle_mcmc_chains(init_state=...)``.
    key_data: raw uint32 data of the MASTER key the run was started with
      (resume must reuse it so the per-iteration key stream lines up).
    n_iters: the TOTAL planned chain length (sizes the key stream).
    thetas / log_likelihoods / sampled_trajs: chain history so far
      ([M, rows, ...]); ``rows == int(state.step[0]) + 1``.
    meta: free-form run metadata (config snapshot).
    """

    state: PMMHState
    key_data: np.ndarray
    n_iters: int
    thetas: np.ndarray
    log_likelihoods: np.ndarray
    sampled_trajs: np.ndarray
    meta: dict


def save_pmmh_checkpoint(path, state, key, n_iters, thetas,
                         log_likelihoods, sampled_trajs, meta=None):
    """Atomically persist a (chain-batched) PMMHState + history."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    np.savez(
        tmp,
        theta=np.asarray(state.theta),
        log_likelihood=np.asarray(state.log_likelihood),
        trajectory=np.asarray(state.trajectory),
        welford_count=np.asarray(state.welford.count),
        welford_mean=np.asarray(state.welford.mean),
        welford_m2=np.asarray(state.welford.m2),
        acceptances=np.asarray(state.acceptances),
        step=np.asarray(state.step),
        log_scale=np.asarray(state.log_scale),
        key=_key_data(key),
        n_iters=np.asarray(int(n_iters)),
        hist_thetas=np.asarray(thetas),
        hist_log_likelihoods=np.asarray(log_likelihoods),
        hist_sampled_trajs=np.asarray(sampled_trajs),
        meta=np.frombuffer(
            json.dumps(meta or {}).encode(), dtype=np.uint8
        ),
    )
    os.replace(tmp + ".npz", path)


def load_pmmh_checkpoint(path) -> Optional[PMMHCheckpoint]:
    if not os.path.exists(path):
        return None
    z = np.load(path, allow_pickle=False)
    state = PMMHState(
        theta=jnp.asarray(z["theta"]),
        log_likelihood=jnp.asarray(z["log_likelihood"]),
        trajectory=jnp.asarray(z["trajectory"]),
        welford=Welford(
            count=jnp.asarray(z["welford_count"]),
            mean=jnp.asarray(z["welford_mean"]),
            m2=jnp.asarray(z["welford_m2"]),
        ),
        acceptances=jnp.asarray(z["acceptances"]),
        step=jnp.asarray(z["step"]),
        # pre-round-4 checkpoints lack the Robbins-Monro scale; 0 = the
        # identity multiplier, which is what those runs used
        log_scale=jnp.asarray(
            z["log_scale"] if "log_scale" in z.files
            else np.zeros(np.shape(z["step"]), np.float32)
        ),
    )
    return PMMHCheckpoint(
        state=state,
        key_data=z["key"],
        n_iters=int(z["n_iters"]),
        thetas=z["hist_thetas"],
        log_likelihoods=z["hist_log_likelihoods"],
        sampled_trajs=z["hist_sampled_trajs"],
        meta=json.loads(z["meta"].tobytes().decode() or "{}"),
    )


def load_checkpoint(path) -> Optional[ChainCheckpoint]:
    if not os.path.exists(path):
        return None
    z = np.load(path, allow_pickle=False)
    return ChainCheckpoint(
        step=int(z["step"]),
        theta=z["theta"],
        log_likelihood=z["log_likelihood"],
        trajectory=z["trajectory"],
        welford_count=z["welford_count"],
        welford_mean=z["welford_mean"],
        welford_m2=z["welford_m2"],
        key=z["key"],
        acceptances=z["acceptances"],
    )
