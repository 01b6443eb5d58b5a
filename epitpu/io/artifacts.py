"""Run artifact persistence in the reference's on-disk layout.

The reference persists each PMCMC run as flat CSVs under
``data/<experiment>/run<i>/``: ``thetas.csv``, ``likelihoods.csv``, and one
``sampled_trajs_<compartment>.csv`` per compartment with trajectories
time-major ``[T, n_iters]`` (reference tests/experiments/noise/noise_.1.py:
45-56, reloaded in tests/test_pmcmc_noisy.py:74-80).  Warm restarts seed the
next run from ``thetas[-1]`` and a covariance of the thinned unique chain
(reference tests/test_pmcmc_p.py:34-45).  We write the identical layout so
reference analysis scripts work unchanged, plus a compact ``run.npz`` with
everything (including log-likelihoods, which the CSV layout would clip to
zero in linear space).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def save_pmmh_run(
    directory,
    thetas,
    log_likelihoods,
    sampled_trajs,
    compartment_names=("susceptible", "infected", "recovered"),
    extra: Optional[Dict[str, np.ndarray]] = None,
):
    """thetas: [n, d]; log_likelihoods: [n]; sampled_trajs: [n, T, C]
    (chain-major, as produced by epitpu.mcmc) — written in the reference's
    time-major CSV layout."""
    os.makedirs(directory, exist_ok=True)
    thetas = np.asarray(thetas)
    lls = np.asarray(log_likelihoods)
    trajs = np.asarray(sampled_trajs)
    np.savetxt(os.path.join(directory, "thetas.csv"), thetas, delimiter=",")
    # the reference stores linear-space likelihoods; keep that file for
    # compatibility and add the log-space one that is actually usable
    np.savetxt(
        os.path.join(directory, "likelihoods.csv"), np.exp(lls), delimiter=","
    )
    np.savetxt(
        os.path.join(directory, "log_likelihoods.csv"), lls, delimiter=","
    )
    if trajs.ndim == 3 and trajs.shape[1] > 0:
        time_major = np.transpose(trajs, (1, 0, 2))  # [T, n, C]
        for c, name in enumerate(compartment_names):
            np.savetxt(
                os.path.join(directory, f"sampled_trajs_{name}.csv"),
                time_major[:, :, c],
                delimiter=",",
            )
    # else: theta-only run (store_trajectories=False) — no history to write
    payload = dict(
        thetas=thetas, log_likelihoods=lls, sampled_trajs=trajs,
        compartment_names=np.asarray(compartment_names),
    )
    if extra:
        payload.update({k: np.asarray(v) for k, v in extra.items()})
    np.savez_compressed(os.path.join(directory, "run.npz"), **payload)


def load_pmmh_run(directory, compartment_names=None):
    """Load a run saved by :func:`save_pmmh_run` (or by the reference's
    np.savetxt calls).  Prefers run.npz; falls back to the CSV layout.
    Returns (thetas [n,d], log_likelihoods [n], sampled_trajs [n,T,C])."""
    npz = os.path.join(directory, "run.npz")
    if os.path.exists(npz):
        z = np.load(npz, allow_pickle=False)
        return z["thetas"], z["log_likelihoods"], z["sampled_trajs"]
    thetas = np.loadtxt(os.path.join(directory, "thetas.csv"), delimiter=",")
    log_path = os.path.join(directory, "log_likelihoods.csv")
    if os.path.exists(log_path):
        lls = np.loadtxt(log_path, delimiter=",")
    else:
        with np.errstate(divide="ignore"):
            lls = np.log(
                np.loadtxt(os.path.join(directory, "likelihoods.csv"), delimiter=",")
            )
    if compartment_names is None:
        compartment_names = ("susceptible", "infected", "recovered")
    planes = [
        np.loadtxt(
            os.path.join(directory, f"sampled_trajs_{n}.csv"), delimiter=","
        )
        for n in compartment_names
    ]
    trajs = np.stack(planes, axis=-1)  # [T, n, C]
    return thetas, lls, np.transpose(trajs, (1, 0, 2))


def save_dataset(path, data, delimiter=", "):
    """Simulated-dataset CSV, reference style (e.g. reference
    tests/test_pmcmc_p.py:29: ``np.savetxt(..., delimiter=", ")``)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savetxt(path, np.asarray(data), delimiter=delimiter)


def load_dataset(path, delimiter=","):
    return np.loadtxt(path, delimiter=delimiter)


def warm_start(directory, burn_in=100, thin=20):
    """Reference warm-restart recipe (tests/test_pmcmc_p.py:34-45): next
    theta0 = last stored sample; proposal covariance = cov of the thinned
    unique chain.  Returns (theta0 [d], sigma [d, d])."""
    thetas, _, _ = load_pmmh_run(directory)
    theta0 = thetas[-1]
    thinned = thetas[burn_in::thin]
    uniq = np.unique(thinned, axis=0)
    if uniq.shape[0] < 2:
        sigma = np.eye(thetas.shape[1])
    else:
        sigma = np.cov(uniq.T, ddof=0)
    return theta0, sigma
