"""Imperative torch-style facade over the functional JAX core.

This is the implementation behind the repo-root ``cVAE.py`` drop-in shim:
reference users whose OWN scripts do ``from cVAE import cVAE_multimodal``
and drive the torch training protocol

    model = cVAE_multimodal(input_dim_list=..., hidden_dim=..., ...)
    model.to(DEVICE)
    fwd = model.forward_multimodal(x_list, c_list, combine)
    loss = model.loss_function_multimodal(x_list, fwd)
    model.optimizer1.zero_grad(); loss['total'].backward()
    model.optimizer1.step()

(multimodal_kfold_train_cvae_supervised.py:150-214, nmpmcont:257-315,
regression:103-127) can keep that loop VERBATIM and have every step run as
jitted XLA programs on the TPU. Under the hood each training step is two
jitted dispatches — a forward program (whose PRNG subkey is recorded so the
loss sees the same reparameterization draw) and a value_and_grad program —
plus an optax update program on ``optimizer1.step()``.

Faithfulness notes:
  * ``optimizer1.lr = clr`` is reproduced as the reference quirk it is
    (SURVEY Q1): on torch.optim.Adam the assignment creates a dead
    attribute and the effective LR stays at the constructor's value; here
    ``lr`` is likewise a plain attribute that ``step()`` never reads.
  * ``backward()`` on any loss component works (a per-component gradient
    program is compiled on demand); calling it twice accumulates, matching
    torch's ``.grad`` accumulation until ``zero_grad()``.
  * Forward/eval outputs are returned as torch CPU tensors so downstream
    reference code (``torch.argmax``, ``.cpu().numpy()``,
    ``x_recon_dist.loc``) runs unmodified; loss dict entries are
    float-likes with ``.item()``/``.backward()``.
  * ``torch.save(model, path)`` / ``torch.load(path)`` round-trip: the
    pickled state carries params, optimizer state and the PRNG cursor as
    numpy; jit caches rebuild lazily.

This facade trades per-step host<->device transfers for drop-in fidelity —
the framework's own CLIs (cli/train_supervised.py etc.) remain the fast
path (whole-run scan, fold-vmap, mesh sharding).
"""
from __future__ import annotations

import math

import numpy as np

DEVICE = "cpu"  # `.to(DEVICE)` target for user-side torch tensors; the
# facade itself ignores device placement (XLA owns it)


def _np_f32(x):
    """numpy float32 view of torch tensors / DataFrames / array-likes."""
    if hasattr(x, "detach"):  # torch.Tensor
        x = x.detach().cpu().numpy()
    elif hasattr(x, "values") and not isinstance(x, np.ndarray):  # DataFrame
        x = x.values
    return np.asarray(x, dtype=np.float32)


def _as_torch(a):
    try:
        import torch

        # device_get returns read-only numpy; torch needs writable memory
        return torch.from_numpy(np.array(a))
    except ImportError:  # pragma: no cover - torch is baked into the image
        return np.asarray(a)


def _torchify_tree(tree):
    """Fetch a device pytree to host in ONE transfer, leaves as torch."""
    import jax

    return jax.tree_util.tree_map(_as_torch, jax.device_get(tree))


class _LossScalar:
    """Float-like loss entry with the torch-Tensor affordances the reference
    loops use: ``.item()``, ``.backward()``, ``float()``, ``np.asarray``."""

    __slots__ = ("_value", "_owner", "_grads", "_grad_fn", "_state_update")

    def __init__(self, value, owner, grads=None, grad_fn=None,
                 state_update=None):
        self._value = float(np.asarray(value))
        self._owner = owner
        self._grads = grads
        self._grad_fn = grad_fn
        self._state_update = state_update

    def item(self) -> float:
        return self._value

    def __float__(self) -> float:
        return self._value

    def __repr__(self) -> str:
        return repr(self._value)

    def __format__(self, spec) -> str:
        return format(self._value, spec)

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self._value, dtype=dtype)

    def detach(self):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return np.asarray(self._value)

    def backward(self):
        grads = self._grads if self._grads is not None else self._grad_fn()
        self._owner._accumulate_grads(grads, self._state_update)


class _Adam:
    """torch.optim.Adam-shaped adapter over optax.

    ``lr`` is a plain assignable attribute that ``step()`` never reads —
    reproducing the reference quirk (SURVEY Q1): the train script's
    ``model.optimizer1.lr = clr`` (train:183) is a dead attribute write on
    torch.optim.Adam, so the effective LR stays at the constructor's value.
    """

    def __init__(self, owner, learning_rate: float):
        self.lr = learning_rate
        self._owner = owner

    def zero_grad(self):
        self._owner._grads = None
        self._owner._pending_state = None

    def step(self):
        self._owner._apply_grads()


class _ImperativeModel:
    """Shared machinery: params/opt state, jit program cache, grad plumbing."""

    _OPTIMIZER_ATTR = "optimizer1"
    _TOTAL_KEY = "total"

    def __init__(self, core, learning_rate: float, ctor_kwargs: dict,
                 seed: int = 42):
        # MUST run before anything initializes a backend (host_init_params
        # resolves jax.devices()): on this image a sitecustomize overrides
        # jax_platforms at interpreter start, silently beating the
        # JAX_PLATFORMS env var — without this, `JAX_PLATFORMS=cpu` user
        # scripts would dispatch every facade step through the remote TPU
        # tunnel (see utils/jaxconfig.py and CLAUDE.md)
        from ..utils.jaxconfig import configure_jax_cache

        configure_jax_cache()

        self._core = core
        self._learning_rate = float(learning_rate)
        self._ctor_kwargs = dict(ctor_kwargs)
        self._seed = seed
        self.training = True
        self._reset_runtime()
        from ..cli.common import host_init_params, host_prng_key

        self._params = host_init_params(core, seed=seed)
        self._key = host_prng_key(seed)
        self._opt_state = None
        setattr(self, self._OPTIMIZER_ATTR, _Adam(self, self._learning_rate))

    def _reset_runtime(self):
        self._programs = {}
        self._grads = None
        self._pending_state = None
        self._optx = None

    # -- torch nn.Module affordances -----------------------------------------
    def to(self, device=None):
        return self

    def train(self, mode: bool = True):
        self.training = bool(mode)
        return self

    def eval(self):
        return self.train(False)

    def parameters(self):
        import jax

        return jax.tree_util.tree_leaves(self._params)

    # -- jit program cache ----------------------------------------------------
    def _jit(self, name, fn, static_argnames=()):
        prog = self._programs.get(name)
        if prog is None:
            import jax

            prog = jax.jit(fn, static_argnames=static_argnames)
            self._programs[name] = prog
        return prog

    # -- gradient plumbing ------------------------------------------------------
    def _accumulate_grads(self, grads, state_update=None):
        if self._grads is None:
            self._grads = grads
        else:
            import jax

            add = self._jit(
                "grad_accumulate",
                lambda a, b: jax.tree_util.tree_map(lambda x, y: x + y, a, b))
            self._grads = add(self._grads, grads)
        if state_update is not None:
            self._pending_state = state_update

    def _apply_grads(self):
        if self._grads is None:
            return
        import optax

        if self._optx is None:
            self._optx = optax.adam(self._learning_rate, eps=1e-8)
        if self._opt_state is None:
            self._opt_state = self._jit("opt_init", self._optx.init)(
                self._params)

        def step(params, opt_state, grads):
            updates, new_state = self._optx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_state

        self._params, self._opt_state = self._jit("opt_step", step)(
            self._params, self._opt_state, self._grads)
        if self._pending_state is not None:
            # non-gradient state (e.g. BN running stats) wins over whatever
            # optax wrote into those leaves — mirrors cli/nmpmcont's
            # state_update hook
            self._params = {**self._params, **self._pending_state}
            self._pending_state = None

    def _wrap_losses(self, values, total_grads, comp_grad_fn,
                     state_update=None):
        """``total_grads`` may be None (eval-mode loss call): the total then
        gets a lazy per-component gradient program like every other key —
        gradient-free loss evaluation never pays for a backward pass."""
        out = {}
        for k, v in values.items():
            if k == self._TOTAL_KEY and total_grads is not None:
                out[k] = _LossScalar(v, self, grads=total_grads,
                                     state_update=state_update)
            else:
                out[k] = _LossScalar(
                    v, self, grad_fn=(lambda kk=k: comp_grad_fn(kk)),
                    state_update=state_update)
        return out

    def _split_key(self):
        """Split the model's PRNG cursor in ONE jitted program (an eager
        jax.random.split would pay a remote compile + RTT per step through
        the TPU tunnel)."""
        import jax

        split = self._jit("key_split", lambda k: tuple(jax.random.split(k)))
        self._key, sub = split(self._key)
        return sub

    # -- pickling (torch.save(model, path) works) ------------------------------
    def __getstate__(self):
        import jax

        tonp = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa: E731
        return {
            "ctor": self._ctor_kwargs,
            "params": tonp(self._params),
            "opt_state": (tonp(self._opt_state)
                          if self._opt_state is not None else None),
            "key": np.asarray(self._key),
            "learning_rate": self._learning_rate,
            "training": self.training,
        }

    def __setstate__(self, state):
        self.__init__(**state["ctor"])
        self._params = state["params"]
        self._opt_state = state["opt_state"]
        self._key = state["key"]
        self._learning_rate = state["learning_rate"]
        self.training = state["training"]
        getattr(self, self._OPTIMIZER_ATTR).lr = state["learning_rate"]


class _MultimodalFacade(_ImperativeModel):
    """Protocol of the six registry classes (train script:150-214):
    forward_multimodal / loss_function_multimodal / optimizer1 /
    pred_recon / reconstruction_deviation_multimodal."""

    _REGISTRY_NAME: str = ""

    def __init__(self, input_dim_list, hidden_dim, latent_dim, c_dim,
                 learning_rate: float = 0.0001, modalities: int = 3,
                 non_linear: bool = False, **_ignored):
        # defaults match the reference ctor exactly (cVAE.py:1087-1095:
        # modalities=3, non_linear=False) so user code relying on them gets
        # identical models
        from ..models import build_model

        core = build_model(self._REGISTRY_NAME, list(input_dim_list),
                           list(hidden_dim), latent_dim, c_dim, modalities,
                           non_linear)
        super().__init__(core, learning_rate, ctor_kwargs=dict(
            input_dim_list=list(input_dim_list), hidden_dim=list(hidden_dim),
            latent_dim=latent_dim, c_dim=c_dim, learning_rate=learning_rate,
            modalities=modalities, non_linear=non_linear))
        self.modalities = modalities

    # pure per-batch loss values (jit-traceable)
    def _loss_values(self, params, xes, cs, key, combine):
        fwd = self._core.forward(params, list(xes), list(cs), key, combine)
        return self._core.loss(params, list(xes), fwd, None)

    def forward_multimodal(self, x_list, c_list, combine):
        xes = tuple(_np_f32(x) for x in x_list)
        cs = tuple(_np_f32(c) for c in c_list)

        def fwd_prog(params, xes, cs, key, combine):
            import jax

            key, sub = jax.random.split(key)
            fwd = self._core.forward(params, list(xes), list(cs), sub,
                                     combine)
            return fwd, sub, key

        fwd, sub, self._key = self._jit(
            "forward", fwd_prog, static_argnames=("combine",))(
                self._params, xes, cs, self._key, combine=combine)
        out = _torchify_tree(fwd)
        # the subkey rides along so loss_function_multimodal reproduces the
        # SAME reparameterization draw this forward used
        out["__mmnm_pending__"] = (xes, cs, np.asarray(sub), combine)
        return out

    def loss_function_multimodal(self, x_list, fwd_rtn):
        token = fwd_rtn.get("__mmnm_pending__") if isinstance(
            fwd_rtn, dict) else None
        if token is None:
            raise ValueError(
                "loss_function_multimodal expects the dict returned by this "
                "model's forward_multimodal (the facade recomputes the "
                "forward under value_and_grad from the recorded batch)")
        xes, cs, sub, combine = token
        import jax

        # grads anchor to the params THIS loss call saw (torch autograd
        # semantics: a later optimizer1.step() must not move the graph)
        params_now = self._params

        def comp_grad(key_name):
            def g(params, xes, cs, key, combine):
                return jax.grad(lambda p: self._loss_values(
                    p, xes, cs, key, combine)[key_name])(params)

            prog = self._jit(f"cgrad::{key_name}", g,
                             static_argnames=("combine",))
            return prog(params_now, xes, cs, sub, combine=combine)

        if self.training:
            def vg(params, xes, cs, key, combine):
                def total_of(p):
                    vals = self._loss_values(p, xes, cs, key, combine)
                    return vals[self._TOTAL_KEY], vals

                (_, vals), grads = jax.value_and_grad(
                    total_of, has_aux=True)(params)
                return vals, grads

            vals, grads = self._jit("loss_grad", vg,
                                    static_argnames=("combine",))(
                params_now, xes, cs, sub, combine=combine)
        else:
            # eval-mode (validation) loss: values only, no backward pass
            vals = self._jit("loss_values", self._loss_values,
                             static_argnames=("combine",))(
                params_now, xes, cs, sub, combine=combine)
            grads = None

        return self._wrap_losses(jax.device_get(vals), grads, comp_grad)

    def pred_recon(self, xes, c, DEVICE=None, combine="gPoE"):
        """Stochastic test-time reconstruction (cVAE.py:1198-1208; a fresh
        reparameterization draw per call — SURVEY Q2). ``xes`` may be
        DataFrames (the reference passes ``.values`` implicitly); ``c`` is
        the one covariate matrix shared across modalities."""
        xs = tuple(_np_f32(x) for x in xes)
        cov = _np_f32(c)
        cs = tuple(cov for _ in xs)
        sub = self._split_key()

        def prog(params, xes, cs, key, combine):
            return self._core.pred_recon(params, list(xes), list(cs), key,
                                         combine)

        recons = self._jit("pred_recon", prog,
                           static_argnames=("combine",))(
            self._params, xs, cs, sub, combine=combine)
        import jax

        return [np.asarray(r) for r in jax.device_get(recons)]

    def reconstruction_deviation_multimodal(self, xes, x_preds):
        """Per-modality per-subject mean squared error (cVAE.py:1210-1212)."""
        return [np.sum((_np_f32(xes[m]) - _np_f32(x_preds[m])) ** 2, axis=1)
                / _np_f32(xes[m]).shape[1] for m in range(self.modalities)]


class cVAE_multimodal(_MultimodalFacade):
    _REGISTRY_NAME = "cVAE_multimodal"


class mmJSD(_MultimodalFacade):
    _REGISTRY_NAME = "mmJSD"


class DMVAE(_MultimodalFacade):
    _REGISTRY_NAME = "DMVAE"


class WeightedDMVAE(_MultimodalFacade):
    _REGISTRY_NAME = "WeightedDMVAE"


class mvtCAE(_MultimodalFacade):
    _REGISTRY_NAME = "mvtCAE"


class mmVAEPlus(_MultimodalFacade):
    _REGISTRY_NAME = "mmVAEPlus"


class cVAE_multimodal_endtoend(_ImperativeModel):
    """nm-PM-cont protocol (nmpmcont:257-315): forward / loss_function /
    optimizer (not optimizer1) / predict; dual decoder banks + classifier
    + margin-contrastive (models/endtoend.py, cVAE.py:2021-2207)."""

    _OPTIMIZER_ATTR = "optimizer"
    _TOTAL_KEY = "total_loss"

    def __init__(self, input_dim_list, hidden_dim, latent_dim, c_dim,
                 learning_rate: float = 0.0001, modalities: int = 3,
                 non_linear: bool = False, classifier_layers=(128, 64),
                 dropout_rate: float = 0.5, num_classes: int = 2,
                 **_ignored):
        # defaults match the reference ctor (cVAE.py:2021-2032)
        from ..models.endtoend import EndToEndCVAE

        core = EndToEndCVAE(list(input_dim_list), list(hidden_dim),
                            latent_dim, c_dim, modalities, non_linear,
                            classifier_layers=list(classifier_layers),
                            dropout_rate=dropout_rate,
                            num_classes=num_classes)
        super().__init__(core, learning_rate, ctor_kwargs=dict(
            input_dim_list=list(input_dim_list), hidden_dim=list(hidden_dim),
            latent_dim=latent_dim, c_dim=c_dim, learning_rate=learning_rate,
            modalities=modalities, non_linear=non_linear,
            classifier_layers=list(classifier_layers),
            dropout_rate=dropout_rate, num_classes=num_classes))
        self.modalities = modalities

    def forward(self, x_list, c_list):
        xes = tuple(_np_f32(x) for x in x_list)
        cs = tuple(_np_f32(c) for c in c_list)

        def fwd_prog(params, xes, cs, key, train):
            import jax

            key, sub = jax.random.split(key)
            fwd = self._core.forward(params, list(xes), list(cs), sub,
                                     train=train)
            return fwd, sub, key

        fwd, sub, self._key = self._jit(
            "forward", fwd_prog, static_argnames=("train",))(
                self._params, xes, cs, self._key, train=self.training)
        out = _torchify_tree(fwd)
        out["__mmnm_pending__"] = (xes, cs, np.asarray(sub), self.training)
        return out

    def loss_function(self, x_list, fwd_rtn, labels, margin=1.0,
                      weight_contrastive=0.1):
        token = fwd_rtn.get("__mmnm_pending__") if isinstance(
            fwd_rtn, dict) else None
        if token is None:
            raise ValueError(
                "loss_function expects the dict returned by this model's "
                "forward")
        xes, cs, sub, train = token
        lab = np.asarray(
            labels.detach().cpu().numpy() if hasattr(labels, "detach")
            else labels).reshape(-1).astype(np.int32)
        margin = np.float32(float(margin))
        w_con = np.float32(float(weight_contrastive))
        import jax

        params_now = self._params  # torch autograd anchor (see facade base)

        def values(p, xes, cs, key, lab, margin, w_con, train):
            fwd = self._core.forward(p, list(xes), list(cs), key,
                                     train=train)
            vals = self._core.loss(p, list(xes), fwd, lab, margin, w_con)
            return vals, fwd["bn_state"]

        def comp_grad(key_name):
            def g(params, xes, cs, key, lab, margin, w_con, train):
                return jax.grad(lambda p: values(
                    p, xes, cs, key, lab, margin, w_con, train)[0][key_name]
                )(params)

            prog = self._jit(f"cgrad::{key_name}", g,
                             static_argnames=("train",))
            return prog(params_now, xes, cs, sub, lab, margin, w_con,
                        train=train)

        if self.training:
            def vg(params, xes, cs, key, lab, margin, w_con, train):
                def total_of(p):
                    vals, bn = values(p, xes, cs, key, lab, margin, w_con,
                                      train)
                    return vals[self._TOTAL_KEY], (vals, bn)

                (_, (vals, bn)), grads = jax.value_and_grad(
                    total_of, has_aux=True)(params)
                return vals, bn, grads

            vals, bn_state, grads = self._jit(
                "loss_grad", vg, static_argnames=("train",))(
                    params_now, xes, cs, sub, lab, margin, w_con, train=train)
        else:
            vals, bn_state = self._jit(
                "loss_values", values, static_argnames=("train",))(
                    params_now, xes, cs, sub, lab, margin, w_con, train=train)
            grads = None

        return self._wrap_losses(jax.device_get(vals), grads, comp_grad,
                                 state_update={"bn_state": bn_state})

    def predict(self, x_list, c_list):
        """Eval-mode classifier logits from the fused mean (cVAE.py:2202)."""
        xes = tuple(_np_f32(x) for x in x_list)
        cs = tuple(_np_f32(c) for c in c_list)

        def prog(params, xes, cs):
            return self._core.predict(params, list(xes), list(cs))

        logits = self._jit("predict", prog)(self._params, xes, cs)
        return _as_torch(np.asarray(logits))


class _Normal:
    """Minimal torch.distributions.Normal stand-in (loc/scale/log_prob)."""

    def __init__(self, loc, scale):
        self.loc = loc
        self.scale = scale

    @property
    def mean(self):
        return self.loc

    def log_prob(self, x):
        var = self.scale * self.scale
        log_scale = (self.scale.log() if hasattr(self.scale, "log")
                     else np.log(self.scale))
        return (-((x - self.loc) ** 2) / (2 * var) - log_scale
                - 0.5 * math.log(2 * math.pi))

    def sample(self):
        if hasattr(self.loc, "detach"):
            import torch

            return self.loc + self.scale * torch.randn_like(self.loc)
        return self.loc + self.scale * np.random.standard_normal(
            np.shape(self.loc)).astype(np.float32)


Normal = _Normal


class cVAE_multimodal_regression(_MultimodalFacade):
    """FI-regression protocol (regression script:103-190): the multimodal
    protocol plus a fi_target/lambda_reg loss and the single-modality
    encode/reparameterise/decode eval path (models/regression.py,
    cVAE.py:2211-2346)."""

    _REGISTRY_NAME = None  # core built directly, not via the registry

    def __init__(self, input_dim_list, hidden_dim, latent_dim, c_dim,
                 learning_rate: float = 0.0001, modalities: int = 3,
                 non_linear: bool = False, **_ignored):
        # defaults match the reference ctor (cVAE.py:2211-2219)
        from ..models.regression import RegressionCVAE

        core = RegressionCVAE(list(input_dim_list), list(hidden_dim),
                              latent_dim, c_dim, modalities, non_linear)
        _ImperativeModel.__init__(self, core, learning_rate,
                                  ctor_kwargs=dict(
            input_dim_list=list(input_dim_list), hidden_dim=list(hidden_dim),
            latent_dim=latent_dim, c_dim=c_dim, learning_rate=learning_rate,
            modalities=modalities, non_linear=non_linear))
        self.modalities = modalities

    def loss_function_multimodal(self, x_list, fwd_rtn, fi_target,
                                 lambda_reg=1.0):
        token = fwd_rtn.get("__mmnm_pending__") if isinstance(
            fwd_rtn, dict) else None
        if token is None:
            raise ValueError(
                "loss_function_multimodal expects the dict returned by this "
                "model's forward_multimodal")
        xes, cs, sub, combine = token
        fi = _np_f32(fi_target).reshape(-1)
        lam = np.float32(float(lambda_reg))
        import jax

        params_now = self._params  # torch autograd anchor (see facade base)

        def values(p, xes, cs, key, fi, lam, combine):
            fwd = self._core.forward(p, list(xes), list(cs), key, combine)
            return self._core.loss(p, list(xes), fwd, fi, lam)

        def comp_grad(key_name):
            def g(params, xes, cs, key, fi, lam, combine):
                return jax.grad(lambda p: values(
                    p, xes, cs, key, fi, lam, combine)[key_name])(params)

            prog = self._jit(f"cgrad_fi::{key_name}", g,
                             static_argnames=("combine",))
            return prog(params_now, xes, cs, sub, fi, lam, combine=combine)

        if self.training:
            def vg(params, xes, cs, key, fi, lam, combine):
                def total_of(p):
                    vals = values(p, xes, cs, key, fi, lam, combine)
                    return vals["total"], vals

                (_, vals), grads = jax.value_and_grad(
                    total_of, has_aux=True)(params)
                return vals, grads

            vals, grads = self._jit("loss_grad_fi", vg,
                                    static_argnames=("combine",))(
                params_now, xes, cs, sub, fi, lam, combine=combine)
        else:
            vals = self._jit("loss_values_fi", values,
                             static_argnames=("combine",))(
                params_now, xes, cs, sub, fi, lam, combine=combine)
            grads = None

        return self._wrap_losses(jax.device_get(vals), grads, comp_grad)

    # single-modality eval path (regression script:183-188)
    def encode(self, x, c, modal_idx: int):
        from ..models.cvae import apply_encoder

        def prog(params, x, c, modal_idx):
            return apply_encoder(params["enc"][modal_idx], x, c,
                                 self._core.base.non_linear)

        mu, logvar = self._jit("encode", prog,
                               static_argnames=("modal_idx",))(
            self._params, _np_f32(x), _np_f32(c), modal_idx=modal_idx)
        return _as_torch(np.asarray(mu)), _as_torch(np.asarray(logvar))

    def reparameterise(self, mu, logvar):
        from ..models.cvae import reparameterize

        sub = self._split_key()
        z = self._jit("reparameterise", reparameterize)(
            sub, _np_f32(mu), _np_f32(logvar))
        return _as_torch(np.asarray(z))

    def decode(self, z, c, modal_idx: int):
        from ..models.cvae import apply_decoder

        def prog(params, z, c, modal_idx):
            return apply_decoder(params["dec"][modal_idx], z, c,
                                 self._core.base.non_linear)

        mean, logvar_out = self._jit("decode", prog,
                                     static_argnames=("modal_idx",))(
            self._params, _np_f32(z), _np_f32(c), modal_idx=modal_idx)
        mean = _as_torch(np.asarray(mean))
        scale = _as_torch(np.exp(0.5 * np.asarray(logvar_out,
                                                  dtype=np.float32)))
        return _Normal(mean, scale)


# -- module-level ops the reference exports (cVAE.py:14, :113, :986-1083) ----

def _run_fusion(fn, *arrays):
    """Run a fusion formula on the LOCAL cpu backend (these are tiny
    eager calls; through the remote tunnel each would cost a compile+RTT)."""
    import jax

    from ..cli.common import _local_cpu_device

    args = [_np_f32(a) for a in arrays]
    cpu = _local_cpu_device()
    if cpu is not None:
        with jax.default_device(cpu):
            out = fn(*args)
    else:  # pragma: no cover - cpu backend always registered
        out = fn(*args)
    return tuple(_as_torch(np.asarray(o)) for o in out)


class ProductOfExperts:
    """cVAE.py:986-998 — returns (mu, var) with the var labeled 'logvar'
    by the reference (Q3 net-math quirk, reproduced as the same values)."""

    def __call__(self, mu, var):
        from ..ops import fusion

        return _run_fusion(fusion.product_of_experts, mu, var)

    forward = __call__


class ProductOfExperts2:
    """cVAE.py:1482-1489 — correct PoE over (mu, logvar)."""

    def __call__(self, mu, logvar):
        from ..ops import fusion

        return _run_fusion(fusion.poe_logvar, mu, logvar)

    forward = __call__


class MixtureOfExperts:
    """cVAE.py:1000-1011 — uniform-weight arithmetic mean of mu and var."""

    def __call__(self, mus, variances):
        from ..ops import fusion

        return _run_fusion(fusion.mixture_of_experts, mus, variances)

    forward = __call__


class MoPoE:
    """cVAE.py:1060-1083 — PoE appended as an extra expert, then MoE."""

    def __call__(self, mus, variances):
        from ..ops import fusion

        return _run_fusion(fusion.mixture_of_product_of_experts, mus,
                           variances)

    forward = __call__


def compute_ll(x, x_recon):
    """cVAE.py:14-15: Gaussian log-likelihood summed over features, meaned
    over the batch. ``x_recon`` is a Normal-like with ``.log_prob``."""
    lp = x_recon.log_prob(x)
    if hasattr(lp, "detach"):  # torch tensor
        return lp.sum(dim=1, keepdim=True).mean(0)
    lp = np.asarray(lp)
    return lp.sum(axis=1, keepdims=True).mean(axis=0)


class FocalLoss:
    """cVAE.py:113-138 (legacy discriminator objective)."""

    def __init__(self, alpha=0.25, gamma=2.0, logits=True, reduce=True):
        self.alpha = alpha
        self.gamma = gamma
        self.logits = logits
        self.reduce = reduce

    def __call__(self, inputs, targets):
        import jax

        from ..cli.common import _local_cpu_device
        from ..ops.losses import focal_loss

        cpu = _local_cpu_device()
        with jax.default_device(cpu):
            out = focal_loss(
                _np_f32(inputs).astype(np.float32),
                _np_f32(targets), self.alpha, self.gamma,
                logits=self.logits,
                reduction="mean" if self.reduce else "none")
        return _as_torch(np.asarray(out))

    forward = __call__
