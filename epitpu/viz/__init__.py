from .plots import (
    forecast_fan,
    kde_pair_plot,
    likelihood_plot,
    multi_chain_traces,
    pair_plot,
    particle_cloud_plot,
    plot_pmmh_suite,
    surface_heatmap,
    sweep_comparison_plot,
    trace_plots,
    trajectory_fan,
)

__all__ = [
    "forecast_fan",
    "kde_pair_plot",
    "likelihood_plot",
    "multi_chain_traces",
    "pair_plot",
    "particle_cloud_plot",
    "plot_pmmh_suite",
    "surface_heatmap",
    "sweep_comparison_plot",
    "trace_plots",
    "trajectory_fan",
]
