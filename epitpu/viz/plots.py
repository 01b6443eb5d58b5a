"""Standard plot suite, matching the reference's figure vocabulary.

Every PMCMC script in the reference ends with the same hand-rolled figures
saved under ``graphs/<experiment>/run<i>/`` — trace plots per parameter
(beta.png, gamma.png), pairwise scatter/KDE (beta_gamma{,2,3}.png),
likelihood traces (likelihoods{,2}.png), trajectory credible fans
(trajectories{,2,3}.png), multi-chain overlays (*_3chains.png) and
posterior-predictive forecast fans (reference tests/test_pmcmc_noisy.py:
117-237, tests/pred_tmps.py:79-104).  This module generates the same set
from a PMMHResult with stable filenames.

matplotlib is imported lazily so headless/benchmark runs never pay for it.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _save(fig, directory, name):
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, name)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    import matplotlib.pyplot as plt

    plt.close(fig)
    return path


def trace_plots(thetas, directory, names=None, running_window=50):
    """Per-parameter trace + running mean (reference beta.png / gamma.png,
    tests/test_pmcmc_noisy.py:117-139)."""
    plt = _plt()
    th = np.asarray(thetas)
    names = names or [f"theta_{j}" for j in range(th.shape[1])]
    paths = []
    for j, name in enumerate(names):
        fig, ax = plt.subplots(figsize=(7, 3.2))
        ax.plot(th[:, j], lw=0.6, alpha=0.8)
        if th.shape[0] > running_window:
            from ..diag import running_mean

            rm = running_mean(th[:, j], running_window)
            ax.plot(
                np.arange(running_window - 1, th.shape[0]), rm, lw=1.5
            )
        ax.set_xlabel("iteration")
        ax.set_ylabel(name)
        paths.append(_save(fig, directory, f"{name}.png"))
    return paths


def pair_plot(thetas, directory, names=None, name="pair.png"):
    """Pairwise scatter + histograms (reference beta_gamma.png family)."""
    plt = _plt()
    th = np.asarray(thetas)
    d = th.shape[1]
    names = names or [f"theta_{j}" for j in range(d)]
    fig, axes = plt.subplots(d, d, figsize=(2.4 * d, 2.4 * d))
    if d == 1:
        axes = np.array([[axes]])
    for i in range(d):
        for j in range(d):
            ax = axes[i, j]
            if i == j:
                ax.hist(th[:, i], bins=40, density=True, alpha=0.8)
            else:
                ax.scatter(th[:, j], th[:, i], s=2, alpha=0.25)
            if i == d - 1:
                ax.set_xlabel(names[j])
            if j == 0:
                ax.set_ylabel(names[i])
    return _save(fig, directory, name)


def kde_pair_plot(thetas, directory, names=None, name="pair_kde.png"):
    """Smoothed-density posterior pair plot: 1-D Gaussian KDE curves on the
    diagonal, 2-D KDE contour fills off-diagonal — the reference's seaborn
    ``kdeplot`` figures (beta_gamma2/3.png,
    reference tests/test_pmcmc_noisy.py:150-178) without a seaborn
    dependency (scipy.stats.gaussian_kde)."""
    from scipy.stats import gaussian_kde

    plt = _plt()
    th = np.asarray(thetas, dtype=float)
    d = th.shape[1]
    names = names or [f"theta_{j}" for j in range(d)]
    fig, axes = plt.subplots(d, d, figsize=(2.6 * d, 2.6 * d))
    if d == 1:
        axes = np.array([[axes]])
    for i in range(d):
        for j in range(d):
            ax = axes[i, j]
            xi, xj = th[:, i], th[:, j]
            try:
                if i == j:
                    grid = np.linspace(xi.min(), xi.max(), 200)
                    span = grid[-1] - grid[0]
                    if span <= 0:  # degenerate chain
                        ax.hist(xi, bins=10, density=True)
                    else:
                        ax.plot(grid, gaussian_kde(xi)(grid))
                        ax.fill_between(
                            grid, gaussian_kde(xi)(grid), alpha=0.3
                        )
                else:
                    kde = gaussian_kde(np.vstack([xj, xi]))
                    gx = np.linspace(xj.min(), xj.max(), 60)
                    gy = np.linspace(xi.min(), xi.max(), 60)
                    mx, my = np.meshgrid(gx, gy)
                    z = kde(np.vstack([mx.ravel(), my.ravel()])).reshape(
                        mx.shape
                    )
                    ax.contourf(mx, my, z, levels=8, cmap="viridis")
            except np.linalg.LinAlgError:
                # singular covariance (constant chain segment): fall back
                ax.scatter(xj, xi, s=2, alpha=0.3)
            if i == d - 1:
                ax.set_xlabel(names[j])
            if j == 0:
                ax.set_ylabel(names[i])
    return _save(fig, directory, name)


def sweep_comparison_plot(levels, directory, name="sweep_pmse.png"):
    """Cross-level comparison for experiment sweeps: posterior MSE per
    parameter, pooled ESS, and acceptance rate against the swept level —
    the analysis the reference prints at the end of its noise / pobs / tmps
    studies (reference tests/test_noise.py:113-116, test_under.py:118-122,
    test_timepoints.py:98-101).

    ``levels``: list of dicts with keys name, pmse [d], acceptance, ess
    (as produced by epitpu.cli.run.run_sweep)."""
    plt = _plt()
    labels = [str(lv.get("level", lv["name"])) for lv in levels]
    pmse = np.asarray([lv["pmse"] for lv in levels], dtype=float)  # [L, d]
    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
    for j in range(pmse.shape[1]):
        axes[0].plot(labels, pmse[:, j], marker="o", label=f"theta_{j}")
    axes[0].set_yscale("log")
    axes[0].set_ylabel("posterior MSE")
    axes[0].legend(fontsize=7)
    ess = [
        float(np.mean(lv["ess"])) if lv.get("ess") is not None else np.nan
        for lv in levels
    ]
    axes[1].plot(labels, ess, marker="o")
    axes[1].set_ylabel("ESS (pooled chains)")
    acc = [float(np.mean(lv["acceptance"])) for lv in levels]
    axes[2].plot(labels, acc, marker="o")
    axes[2].set_ylabel("acceptance rate")
    for ax in axes:
        ax.set_xlabel("sweep level")
    return _save(fig, directory, name)


def likelihood_plot(log_likelihoods, directory, name="likelihoods.png"):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 3.2))
    ax.plot(np.asarray(log_likelihoods), lw=0.6)
    ax.set_xlabel("iteration")
    ax.set_ylabel("log marginal likelihood")
    return _save(fig, directory, name)


def trajectory_fan(
    sampled_trajs,
    directory,
    observed: Optional[np.ndarray] = None,
    latent_truth: Optional[np.ndarray] = None,
    compartment_names: Sequence[str] = ("susceptible", "infected", "removed"),
    quantiles=(0.05, 0.95),
    name="trajectories.png",
):
    """Credible fan of sampled latent trajectories vs data/truth
    (reference trajectories.png, tests/test_pmcmc_noisy.py:180-237).
    sampled_trajs: [n, T, C] chain-major."""
    plt = _plt()
    tr = np.asarray(sampled_trajs)
    t = np.arange(tr.shape[1])
    c = tr.shape[2]
    fig, axes = plt.subplots(1, c, figsize=(3.6 * c, 3.2), sharex=True)
    if c == 1:
        axes = [axes]
    for k in range(c):
        ax = axes[k]
        lo = np.quantile(tr[:, :, k], quantiles[0], axis=0)
        hi = np.quantile(tr[:, :, k], quantiles[1], axis=0)
        med = np.quantile(tr[:, :, k], 0.5, axis=0)
        ax.fill_between(t, lo, hi, alpha=0.3, label="CI")
        ax.plot(t, med, lw=1.2, label="median")
        if latent_truth is not None and k < latent_truth.shape[1]:
            ax.plot(t, latent_truth[: len(t), k], "k--", lw=1, label="truth")
        if observed is not None and k < observed.shape[1]:
            ax.plot(t, observed[: len(t), k], "r.", ms=4, label="observed")
        name_k = (
            compartment_names[k] if k < len(compartment_names) else f"c{k}"
        )
        ax.set_title(name_k)
        ax.set_xlabel("time")
    axes[0].legend(fontsize=7)
    return _save(fig, directory, name)


def forecast_fan(
    filtered_trajs,
    forecast_trajs,
    directory,
    truth: Optional[np.ndarray] = None,
    compartment: int = 1,
    quantiles=(0.05, 0.95),
    name="forecast.png",
):
    """Posterior-predictive forecast fan: filtered past + simulated future
    (reference tests/pred_tmps.py:79-104).
    filtered_trajs: [n, T0, C]; forecast_trajs: [n, T1, C]."""
    plt = _plt()
    past = np.asarray(filtered_trajs)[:, :, compartment]
    fut = np.asarray(forecast_trajs)[:, :, compartment]
    full = np.concatenate([past, fut], axis=1)
    t = np.arange(full.shape[1])
    fig, ax = plt.subplots(figsize=(7, 3.6))
    lo = np.quantile(full, quantiles[0], axis=0)
    hi = np.quantile(full, quantiles[1], axis=0)
    ax.fill_between(t, lo, hi, alpha=0.3, label="5-95% CI")
    ax.plot(t, np.median(full, axis=0), lw=1.2, label="median")
    ax.axvline(past.shape[1] - 0.5, color="gray", ls=":", label="forecast start")
    if truth is not None:
        ax.plot(np.arange(len(truth)), truth, "k--", lw=1, label="truth")
    ax.set_xlabel("time")
    ax.legend(fontsize=8)
    return _save(fig, directory, name)


def multi_chain_traces(chains, directory, names=None, suffix="_chains"):
    """Overlayed traces from multiple chains (reference *_3chains.png,
    tests/test_pmcmc_noisy.py:254-267).  chains: [M, N, d]."""
    plt = _plt()
    ch = np.asarray(chains)
    names = names or [f"theta_{j}" for j in range(ch.shape[2])]
    paths = []
    for j, nm in enumerate(names):
        fig, ax = plt.subplots(figsize=(7, 3.2))
        for mth in range(ch.shape[0]):
            ax.plot(ch[mth, :, j], lw=0.6, alpha=0.7, label=f"chain {mth}")
        ax.set_xlabel("iteration")
        ax.set_ylabel(nm)
        ax.legend(fontsize=7)
        paths.append(_save(fig, directory, f"{nm}{suffix}.png"))
    return paths


def surface_heatmap(grid2, lls, directory, names=("beta", "gamma"),
                    truth=None, name="surface.png"):
    """Likelihood-surface heatmap over a 2-D theta grid (the reference's
    likelihood-map workflow, tests/testing_sbgrps.py:35-49).  grid2 [G, 2]
    must be a theta_grid (row-major square); lls [G] PF log-likelihoods."""
    plt = _plt()
    import numpy as np

    g = np.asarray(grid2)
    z = np.asarray(lls, dtype=float)
    p = int(round(np.sqrt(g.shape[0])))
    xs = g[:, 0].reshape(p, p)
    ys = g[:, 1].reshape(p, p)
    zz = np.where(np.isfinite(z), z, np.nan).reshape(p, p)
    fig, ax = plt.subplots(figsize=(6, 5))
    pc = ax.pcolormesh(xs, ys, zz, shading="auto")
    fig.colorbar(pc, ax=ax, label="log likelihood")
    if truth is not None:
        ax.plot([truth[0]], [truth[1]], "r*", markersize=12, label="truth")
        ax.legend()
    ax.set_xlabel(names[0])
    ax.set_ylabel(names[1])
    ax.set_title("PF log-likelihood surface")
    return _save(fig, directory, name)


def particle_cloud_plot(
    hidden, ancestry, directory, compartment=1, name="particles.png"
):
    """Particle clouds with ancestry lines (reference
    tests/test_particles.py:78-95).  hidden: [T, N, C]; ancestry: [T, N]."""
    plt = _plt()
    h = np.asarray(hidden)
    a = np.asarray(ancestry).astype(int)
    t_len, n, _ = h.shape
    fig, ax = plt.subplots(figsize=(7, 4))
    show = min(n, 64)
    for p in range(1, t_len):
        for j in range(show):
            parent = a[p, j] if a[p, j] < n else 0
            ax.plot(
                [p - 1, p],
                [h[p - 1, parent, compartment], h[p, j, compartment]],
                color="steelblue",
                alpha=0.15,
                lw=0.5,
            )
    for p in range(t_len):
        ax.scatter([p] * show, h[p, :show, compartment], s=4, color="navy", alpha=0.5)
    ax.set_xlabel("time step")
    ax.set_ylabel(f"compartment {compartment}")
    return _save(fig, directory, name)


def plot_pmmh_suite(
    result,
    directory,
    theta_names=None,
    observed=None,
    latent_truth=None,
    compartment_names=("susceptible", "infected", "removed"),
    burn_in=0,
):
    """One-call version of the reference's per-script plotting block."""
    th = np.asarray(result.thetas)[burn_in:]
    paths = []
    paths += trace_plots(th, directory, theta_names)
    paths.append(pair_plot(th, directory, theta_names))
    paths.append(kde_pair_plot(th, directory, theta_names))
    paths.append(likelihood_plot(np.asarray(result.log_likelihoods), directory))
    trajs = np.asarray(result.sampled_trajs)
    if trajs.ndim == 3 and trajs.shape[1] > 0:
        paths.append(
            trajectory_fan(
                trajs[burn_in:],
                directory,
                observed=observed,
                latent_truth=latent_truth,
                compartment_names=compartment_names,
            )
        )
    # else: theta-only run (store_trajectories=False) — no trajectory fan
    return paths
