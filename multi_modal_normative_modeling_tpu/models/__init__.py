"""Model zoo: functional re-designs of the reference cVAE.py winning classes.

Registry mirrors multimodal_kfold_train_cvae_supervised.py:150-157.
"""

from .multimodal import MultimodalCVAE  # noqa: F401
from .dmvae import DMVAEFamily  # noqa: F401


def build_model(name: str, input_dim_list, hidden_dim, latent_dim, c_dim,
                modalities: int, non_linear: bool = True):
    """Construct a model by its reference registry name."""
    if name == "cVAE_multimodal":
        return MultimodalCVAE(input_dim_list, hidden_dim, latent_dim, c_dim,
                              modalities, non_linear, variant="cvae")
    if name == "mmJSD":
        return MultimodalCVAE(input_dim_list, hidden_dim, latent_dim, c_dim,
                              modalities, non_linear, variant="mmjsd")
    if name == "mvtCAE":
        return MultimodalCVAE(input_dim_list, hidden_dim, latent_dim, c_dim,
                              modalities, non_linear, variant="mvtcae")
    if name == "DMVAE":
        return DMVAEFamily(input_dim_list, hidden_dim, latent_dim, c_dim,
                           modalities, variant="dmvae")
    if name == "WeightedDMVAE":
        return DMVAEFamily(input_dim_list, hidden_dim, latent_dim, c_dim,
                           modalities, variant="weighted")
    if name == "mmVAEPlus":
        return DMVAEFamily(input_dim_list, hidden_dim, latent_dim, c_dim,
                           modalities, variant="mmvaeplus")
    raise ValueError(
        f"Model '{name}' is not recognized. Available models are: "
        "cVAE_multimodal, mmJSD, DMVAE, WeightedDMVAE, mvtCAE, mmVAEPlus"
    )
