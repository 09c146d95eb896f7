"""Cross-cutting utilities: loss logging, plots, run logs."""

from .logging import Logger, plot_losses, RunLog  # noqa: F401
