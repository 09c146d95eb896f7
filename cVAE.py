"""Drop-in shim for the reference's ``import cVAE`` surface.

The reference's model library is a single torch module (reference
cVAE.py, 2346 LoC); its live entry points and user scripts import the
winning class definitions from it (SURVEY §2.3). This shim re-exports the
TPU-native equivalents: imperative torch-style facades over the functional
JAX core, so a reference training loop —

    from cVAE import cVAE_multimodal
    model = cVAE_multimodal(input_dim_list=..., hidden_dim=..., ...)
    fwd = model.forward_multimodal(x_list, c_list, combine)
    loss = model.loss_function_multimodal(x_list, fwd)
    model.optimizer1.zero_grad(); loss['total'].backward()
    model.optimizer1.step()

— runs VERBATIM with every step dispatched as jitted XLA programs
(multi_modal_normative_modeling_tpu/compat/imperative.py; quirk decisions
documented there and in PARITY.md). ``torch.save(model, path)`` /
``torch.load(path)`` round-trip like the reference's pickles
(train:211-212).

Dead/legacy reference classes (mmcVAE, cVAE, *_before_refactor, superseded
duplicate defs) are intentionally not exported — last-definition-wins
(SURVEY Q6).
"""
_EXCLUDED_LEGACY = {
    # reference cVAE.py location -> why it is dead there
    "mmcVAE": ":243 — never instantiated by any live script",
    "cVAE": ":391 — unimodal predecessor, never instantiated",
    "cVAE_multimodal_before_refactor": ":566 — superseded duplicate "
                                       "definition (last-definition-wins)",
    "MVTCAE": ":1046 — empty fusion stub (the winning model is the "
              "lowercase mvtCAE at :1754, which IS exported)",
    "ResidualBlock": ":47 — only used by a dead module-level Sequential "
                     "(:97-99) that no live code touches",
}


def __getattr__(name):  # PEP 562: loud message for excluded legacy symbols
    if name in _EXCLUDED_LEGACY:
        raise ImportError(
            f"cVAE.{name} is an excluded legacy symbol (SURVEY Q6): dead "
            f"code in the reference (cVAE.py{_EXCLUDED_LEGACY[name]}) and "
            "intentionally not ported — see the PARITY.md quirk ledger. "
            "Use the winning definitions re-exported by this module "
            "(cVAE_multimodal, mmJSD, mvtCAE, DMVAE, ...) instead.")
    raise AttributeError(f"module 'cVAE' has no attribute {name!r}")


from multi_modal_normative_modeling_tpu.compat.imperative import (  # noqa: F401,E402
    DEVICE,
    DMVAE,
    FocalLoss,
    MixtureOfExperts,
    MoPoE,
    Normal,
    ProductOfExperts,
    ProductOfExperts2,
    WeightedDMVAE,
    cVAE_multimodal,
    cVAE_multimodal_endtoend,
    cVAE_multimodal_regression,
    compute_ll,
    mmJSD,
    mmVAEPlus,
    mvtCAE,
)
