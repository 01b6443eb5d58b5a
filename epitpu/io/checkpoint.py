"""Resumable chain checkpoints.

The reference's only resume mechanism is the manual warm-restart from CSVs
(reference tests/test_pmcmc_p.py:34-45).  For long multi-host runs we
checkpoint the *full* sampler state — current theta, log-likelihood, current
trajectory, Welford adaptation statistics, PRNG key, and step counter — so a
killed run resumes bit-compatibly rather than approximately.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mcmc.adaptive import Welford


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
