from .solver_plots import plot_trajectory, plot_violations

__all__ = ["plot_trajectory", "plot_violations"]
