"""Pallas TPU kernels for the cVAE hot paths, with jnp fallbacks.

Kernel inventory:
  * mlp.py       — fused conditional-encoder and decoder MLP kernels: the
                   whole (concat -> linears -> LeakyReLU -> heads) chain runs
                   in one pallas_call per batch tile, weights resident in
                   VMEM, matmuls on the MXU in fp32.
  * deviation.py — fused inference kernel: encode -> PoE fuse -> on-chip
                   reparameterize (pltpu PRNG) -> decode -> (x - x_hat)^2
                   row-mean, emitting reconstruction + deviation in a single
                   HBM round trip per modality.

Use ``interpret=True`` (automatic on CPU) for tests.
"""

from .mlp import fused_encoder, fused_decoder_mean  # noqa: F401
from .deviation import fused_pred_deviation  # noqa: F401
