"""Pure-functional compute ops: latent fusion, losses, MLP stacks."""

from .fusion import (  # noqa: F401
    combine_latent,
    gpoe,
    mixture_of_experts,
    mixture_of_product_of_experts,
    poe_logvar,
    product_of_experts,
)
from .losses import (  # noqa: F401
    gaussian_ll,
    kl_standard_normal,
    pairwise_jsd,
)
from .linear import init_mlp, apply_mlp, init_linear  # noqa: F401
