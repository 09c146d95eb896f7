"""Deviation-score inference engine and CSV emitters."""

from .deviation import (  # noqa: F401
    latent_deviation,
    latent_pvalues,
    reconstruction_deviation,
    reconstruction_deviation_roi,
    separate_latent_deviation,
)
from .emitters import DeviationEmitter  # noqa: F401
