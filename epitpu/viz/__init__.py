from .plots import (
    forecast_fan,
    likelihood_plot,
    multi_chain_traces,
    pair_plot,
    particle_cloud_plot,
    plot_pmmh_suite,
    trace_plots,
    trajectory_fan,
)

__all__ = [
    "forecast_fan",
    "likelihood_plot",
    "multi_chain_traces",
    "pair_plot",
    "particle_cloud_plot",
    "plot_pmmh_suite",
    "trace_plots",
    "trajectory_fan",
]
