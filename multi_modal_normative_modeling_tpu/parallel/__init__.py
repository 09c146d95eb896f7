"""Fold-parallel training and device-mesh sharding."""

from .mesh import make_mesh, fold_data_shardings  # noqa: F401
from .folds import MultiFoldTrainer, stack_fold_batches, stack_params  # noqa: F401
from .tensor import make_mesh3, fold_model_shardings, tp_param_specs  # noqa: F401
from .modality import make_ep_mesh, build_ep_step  # noqa: F401
