"""Shared CLI plumbing: the reference flag surface and per-fold data prep."""
from __future__ import annotations

import argparse

from ..utils.jaxconfig import configure_jax_cache

configure_jax_cache()
from pathlib import Path
from typing import List, Tuple

import numpy as np
import pandas as pd

from .. import registry
from ..data.loading import load_dataset
from ..data.preprocess import one_hot_covariates


def add_common_flags(parser: argparse.ArgumentParser,
                     default_n_splits: int = 10) -> argparse.ArgumentParser:
    """The -R/-H/-C/-P/-E/-K/-O/-Model/... flags of the reference scripts
    (multimodal_kfold_train_cvae_supervised.py:216-286)."""
    parser.add_argument('-R', '--dataset_resourse', dest='dataset_resourse',
                        type=str,
                        help='Dataset to use for training test and evaluation.')
    parser.add_argument('-H', '--hz_para_list', dest='hz_para_list', nargs='+',
                        type=int, help='List of paras to perform the analysis.')
    parser.add_argument('-C', '--combine', dest='combine', type=str,
                        help='how do we combine all modalities.')
    parser.add_argument('-P', '--procedure', dest='procedure', type=str,
                        help='Procedure to perform the analysis.')
    parser.add_argument('-E', '--epochs', dest='epochs', type=int,
                        help='Number of epochs to train the model.')
    parser.add_argument('-K', '--n_splits', dest='n_splits', type=int,
                        default=default_n_splits,
                        help='Number of splits for k-fold cross-validation.')
    parser.add_argument('-O', '--oversample_percentage',
                        dest='oversample_percentage', type=float, default=1,
                        help='Percentage of oversampling of the training data.')
    parser.add_argument('-Model', '--model', dest='model',
                        default='cVAE_multimodal', type=str,
                        help='Model to use for training the data.')
    parser.add_argument('-SingleModality', '--single_modality',
                        dest='single_modality', default=None, type=str,
                        help='Single modality to use for training the data.')
    parser.add_argument('-Baselearningrate', '--base_learning_rate',
                        dest='base_learning_rate', type=float, default=0.0001,
                        help='Base learning rate for the model.')
    parser.add_argument('-Maxlearningrate', '--max_learning_rate',
                        dest='max_learning_rate', type=float, default=0.005,
                        help='Max learning rate for the model.')
    parser.add_argument('-TrainingClass', '--training_class',
                        dest='training_class', default='nm', type=str,
                        help='Class to train the model.')
    return parser


def apply_post_parse_defaults(args, default_procedure: str = 'UCA-gPoE',
                              default_epochs: int = 200):
    """Reference post-parse defaulting (train:288-297)."""
    if getattr(args, 'hz_para_list', None) is None:
        args.hz_para_list = [110, 110, 10]
    if getattr(args, 'procedure', None) is None:
        args.procedure = default_procedure
    if getattr(args, 'combine', None) is None:
        args.combine = args.procedure.split('-')[1]
    if getattr(args, 'dataset_resourse', None) is None:
        args.dataset_resourse = 'ADNI'
    if getattr(args, 'epochs', None) is None:
        args.epochs = default_epochs
    return args


_CSV_CACHE: dict = {}
_CSV_LOCK = __import__("threading").Lock()

# Wide numeric tables (PPMI is 3485 columns) parse ~6x faster through the
# native loader; below this width pandas' fixed overhead doesn't matter.
_FASTCSV_MIN_COLS = 256

_log = __import__("logging").getLogger("mmnm.data")
# why the native fast path disengaged, per path -> (mtime_ns, reason): a
# user-visible signal + skips re-attempting the native parse for files known
# to need pandas. Keyed by mtime like _CSV_CACHE, so a rewritten (fixed) file
# gets the fast path back.
fast_path_reasons: dict = {}


def _mtime(path) -> int:
    try:
        return Path(path).stat().st_mtime_ns
    except OSError:
        return -1


def _fast_path_off(path, reason: str, level=None) -> None:
    key = str(path)
    entry = (_mtime(path), reason)
    if fast_path_reasons.get(key) != entry:
        fast_path_reasons[key] = entry
        (level or _log.info)("fastcsv fast path disabled for %s: %s",
                             key, reason)


def _read_modality_fast(path) -> "pd.DataFrame | None":
    """Parse an IID + all-numeric-columns table with the native fastcsv
    loader (or return None to fall back to pandas, logging why on
    'mmnm.data'). Values are correctly rounded (std::from_chars); pandas'
    default parser may differ by 1 ulp. Quoted fields are fully supported
    (RFC4180 incl. embedded newlines; quote-parity row index)."""
    memo = fast_path_reasons.get(str(path))
    if memo is not None:
        if memo[0] == _mtime(path):
            return None  # known to need pandas; don't re-parse natively
        del fast_path_reasons[str(path)]  # file changed: retry natively
    try:
        from ..native.fastcsv import FastCSV, fastcsv_available
    except Exception:
        _fast_path_off(path, "native loader import failed")
        return None
    if not fastcsv_available():
        _fast_path_off(path, "no C++ toolchain: native library unavailable")
        return None
    import csv

    with open(path, newline="") as f:
        header = next(csv.reader(f))
    if "IID" not in header:
        return None  # not a modality table; silently use pandas
    if len(header) < _FASTCSV_MIN_COLS:
        _fast_path_off(
            path, f"narrow table ({len(header)} cols < {_FASTCSV_MIN_COLS}): "
            "pandas fixed overhead is negligible here", _log.debug)
        return None
    value_cols = [c for c in header if c != "IID"]
    try:
        reader = FastCSV(path)
        try:
            ids = reader.read_string_column("IID")
            values = reader.read_columns(value_cols)
        finally:
            reader.close()
    except Exception as exc:
        # e.g. unreadable/degenerate file: never let the fast path be a
        # correctness hazard — pandas decides what the file really is
        _fast_path_off(path, f"native parse failed ({exc!r}): "
                             "deferring to pandas")
        return None
    if np.isnan(values).any():
        # non-numeric or missing cells: pandas' dtype inference is needed.
        # Memoized, so the file is natively parsed at most once.
        _fast_path_off(path, "non-numeric or missing cells detected: "
                             "deferring to pandas dtype inference")
        return None
    frame = pd.DataFrame(values, columns=value_cols)
    frame.insert(header.index("IID"), "IID", ids)
    return frame


def read_csv_cached(path) -> pd.DataFrame:
    """Modality/demographic CSVs are re-read for every fold in the reference
    (train:88-89); cache them per (path, mtime) — k-fold runs read each file
    once instead of k times. Wide numeric tables go through the native C++
    loader (native/fastcsv.cpp) when available."""
    path = Path(path)
    key = (str(path), path.stat().st_mtime_ns)
    with _CSV_LOCK:
        if key in _CSV_CACHE:
            return _CSV_CACHE[key]
    frame = _read_modality_fast(path)
    if frame is None:
        frame = pd.read_csv(path)
    with _CSV_LOCK:
        # drop stale entries for the same path
        for old in [k for k in _CSV_CACHE if k[0] == key[0]]:
            del _CSV_CACHE[old]
        _CSV_CACHE[key] = frame
    return _CSV_CACHE[key]


def load_dataset_cached(demographic_path, ids_path, modality_path):
    """load_dataset with the two big reads served from the CSV cache and the
    joins through the numpy row-map merge (bit-identical to pd.merge for the
    pipeline's key shapes; data/loading.fast_inner_merge)."""
    from ..data.loading import fast_inner_merge, load_demographic_data

    demographic_df = read_csv_cached(demographic_path).dropna()
    ids_df = pd.read_csv(ids_path, usecols=['IID'])
    if ('Run_ID' in demographic_df.columns
            or 'Session_ID' in demographic_df.columns):
        # composite id formats: fall back to the reference-exact loader
        demographic = load_demographic_data(demographic_path, ids_path)
    else:
        ids_df = ids_df.copy()
        if 'participant_id' not in demographic_df.columns:
            # mirror data/loading.load_demographic_data: synthesizing the
            # column when the demographic table already carries one would
            # collide in the merge (suffixed _x/_y columns downstream)
            ids_df['participant_id'] = ids_df['IID']
        demographic = fast_inner_merge(ids_df, demographic_df, on='IID')
    modality_df = read_csv_cached(modality_path)
    return fast_inner_merge(modality_df, demographic, on='IID')


def _local_cpu_device():
    """The local CPU backend's device, or None when the plugin config pins
    the platform list (e.g. this image's axon wrapper can hide 'cpu' until
    the primary backend has initialized — retry after a full init).

    Must be a PROCESS-LOCAL device: in multi-controller runs
    jax.devices('cpu')[0] is global device 0, which other processes
    cannot address — eager host-prep ops committed there would make their
    outputs unfetchable (the 2-process EP test caught exactly this)."""
    import jax

    for attempt in range(2):
        try:
            return jax.local_devices(backend="cpu")[0]
        except Exception:
            if attempt:
                return None
            try:
                jax.devices()  # initialize every available platform
            except Exception:
                return None


def host_init_params(model, seed: int = 42):
    """Initialize model params on the LOCAL CPU backend, returned as numpy.

    JAX's threefry PRNG is bit-identical across backends, so this matches a
    device-side init exactly — but through the remote-TPU tunnel every eager
    init op costs a ~0.4 s remote compile + RTT (measured: 12 s per process
    start for one flagship init), while the CPU-local init is milliseconds
    and the params upload once, asynchronously, at the first jit call."""
    import jax

    from ..utils.jaxconfig import no_compile_cache

    cpu = _local_cpu_device()
    if cpu is None:
        # remote-backend fallback: these compiles ARE worth persisting
        params = model.init_params(jax.random.PRNGKey(seed))
    else:
        with no_compile_cache(), jax.default_device(cpu):
            params = model.init_params(jax.random.PRNGKey(seed))
    return jax.tree_util.tree_map(np.asarray, params)


def host_prng_key(seed: int = 42) -> np.ndarray:
    """jax.random.PRNGKey computed on the local CPU backend (numpy out)."""
    import jax

    from ..utils.jaxconfig import no_compile_cache

    cpu = _local_cpu_device()
    if cpu is None:
        return np.asarray(jax.random.PRNGKey(seed))
    with no_compile_cache(), jax.default_device(cpu):
        return np.asarray(jax.random.PRNGKey(seed))


_PREP_CACHE: "OrderedDict" = __import__("collections").OrderedDict()
_PREP_LOCK = __import__("threading").Lock()
# byte budget for the fold-prep memo (LRU): per-fold entries hold whole
# DataFrames, so at 10k-subject scale an unbounded cache would eat GBs
_PREP_CACHE_BYTES = int(__import__("os").environ.get(
    "MMNM_PREP_CACHE_MB", "1024")) * 1024 * 1024


def _prep_nbytes(prep: dict) -> int:
    total = 0
    for v in prep.values():
        if isinstance(v, pd.DataFrame):
            total += int(v.memory_usage(deep=False).sum())
        elif isinstance(v, np.ndarray):
            total += v.nbytes
    return total


def prepare_modality(project_root: Path, resource: str, dataset_name: str,
                     participants_path, train_ids_path,
                     test_ids_path=None) -> dict:
    """Load + scale one modality for a fold, reference test/train semantics:
    RobustScaler fit on the fold's train rows, applied to both splits
    (vectorized bit-identical fast path, data/preprocess.py);
    qcut one-hot covariates fit independently per split (SURVEY.md Q5).

    Memoized per (paths, mtimes): sweep engines re-enter the test stage at
    every epochs milestone with identical inputs, and the merge + scaler +
    qcut work is deterministic in them. Returns a shallow copy so callers
    may add keys without poisoning the cache."""
    from ..data.preprocess import fit_robust_scaler

    columns_name = registry.get_column_name(resource, dataset_name)
    modality_path = Path(project_root) / 'data' / resource / f'{dataset_name}.csv'
    cache_key = tuple(
        (str(p), _mtime(p)) for p in (participants_path, train_ids_path,
                                      test_ids_path, modality_path)
        if p is not None)
    with _PREP_LOCK:
        hit = _PREP_CACHE.get(cache_key)
        if hit is not None:
            _PREP_CACHE.move_to_end(cache_key)
    if hit is not None:
        return dict(hit)
    train_df = load_dataset_cached(participants_path, train_ids_path,
                                   modality_path)

    train_data, scaler = fit_robust_scaler(train_df[columns_name].values)
    out = {
        'columns': columns_name,
        'train_df': train_df,
        'train_data': train_data.astype(np.float32),
        'train_cov': one_hot_covariates(train_df[['DIA', 'PTGENDER', 'AGE']]),
        # center/scale arrays for servers that scale NEW payloads against
        # this fold's train cohort (cli/serve.py does it on-device)
        'scaler': scaler,
    }
    if test_ids_path is not None:
        test_df = load_dataset_cached(participants_path, test_ids_path,
                                      modality_path)
        out['test_df'] = test_df
        # float64, like the reference's scaled DataFrame (test:90): the
        # emitted normalized_/error CSVs carry float64 formatting while the
        # device path downcasts to float32 at the jit boundary
        out['test_data'] = scaler.transform(test_df[columns_name].values)
        try:
            out['test_cov'] = one_hot_covariates(
                test_df[['DIA', 'AGE', 'PTGENDER']])
        except ValueError as e:
            # fewer test rows than qcut bins (e.g. a serving ids list of
            # one subject): the k-fold evaluation paths never hit this;
            # the serving CLI bins by train quantiles instead
            # (data/preprocess.train_binned_covariates). Keep the reason so
            # k-fold consumers can fail loudly via require_test_cov instead
            # of crashing opaquely on the None far downstream.
            out['test_cov'] = None
            out['test_cov_error'] = str(e)
    if _prep_nbytes(out) <= _PREP_CACHE_BYTES:
        with _PREP_LOCK:
            _PREP_CACHE[cache_key] = out
            _PREP_CACHE.move_to_end(cache_key)
            while (len(_PREP_CACHE) > 1
                   and sum(map(_prep_nbytes, _PREP_CACHE.values()))
                   > _PREP_CACHE_BYTES):
                _PREP_CACHE.popitem(last=False)
    return dict(out)


def assert_modalities_aligned(frames, context: str,
                              key: str = 'participant_id') -> None:
    """Every modality's merged frame must cover the same subjects in the
    same order: the stacked inference paths pair modality-0 row indices and
    participant ids with the LAST modality's covariates (reference test:102
    semantics), which is only coherent when the row sets agree. A modality
    CSV missing subjects would otherwise emit silently misaligned
    per-subject CSVs (or a negative-pad crash)."""
    base = frames[0][key].to_numpy()
    for i, frame in enumerate(frames[1:], 1):
        cur = frame[key].to_numpy()
        if len(cur) != len(base) or not (cur == base).all():
            raise ValueError(
                f"{context}: modality row sets/orders differ between "
                f"modality 0 ({len(base)} rows) and modality {i} "
                f"({len(cur)} rows); every modality CSV must cover the "
                "same subjects in the same order")


def emit_fold_artifacts(model_dir: Path, per_fold_logs, per_fold_params,
                        model_config: dict, n_folds: int,
                        plot: bool = True, fold_ids=None) -> None:
    """Threaded per-fold artifact emission shared by every trainer CLI:
    loss plot + checkpoint into ``model_dir/{fold_id:03d}``. Safe to thread —
    plot_losses is OO-Agg (no pyplot global state) and save_checkpoint
    writes atomically. ``per_fold_logs[i]`` feeds Logger.extend; pass
    plot=False to skip plots (sweep intermediate milestones, matching the
    reference loop's transient per-point plots). ``fold_ids`` names the
    output dirs when they are not simply 0..n_folds-1 (bootstrap replicate
    sets can be non-contiguous)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..train.checkpoints import save_checkpoint
    from ..utils.logging import Logger, plot_losses

    if fold_ids is None:
        fold_ids = range(n_folds)

    def emit(i):
        fold_dir = model_dir / f'{fold_ids[i]:03d}'
        fold_dir.mkdir(parents=True, exist_ok=True)
        if plot:
            logger = Logger()
            logger.extend(per_fold_logs[i])
            plot_losses(logger, fold_dir, 'training')
        save_checkpoint(fold_dir, per_fold_params[i], model_config)

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(emit, range(n_folds)))


def load_model_and_params(fold_dir: Path):
    """Restore (model, params, config) from a fold/replicate checkpoint dir:
    cVAE_model.json -> model, abstract-shaped zero template (eager init costs
    a round trip per op through the remote-TPU tunnel) -> load_checkpoint."""
    import json

    import jax

    from ..train import load_checkpoint

    config = json.loads((Path(fold_dir) / 'cVAE_model.json').read_text())
    model = build_model_from_config(config)
    shapes = jax.eval_shape(model.init_params,
                            jax.ShapeDtypeStruct((2,), np.uint32))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)
    params, _ = load_checkpoint(fold_dir, template_params=template)
    return model, params, config


def require_test_cov(prep: dict, context: str) -> np.ndarray:
    """Fetch a prep's qcut test covariates, failing with the original qcut
    error if prepare_modality could not bin them (test split smaller than
    the bin count). The k-fold evaluation CLIs consume test_cov directly —
    without this, a None flows into np.pad/np.stack and crashes with an
    unrelated broadcast error far from the cause."""
    cov = prep.get('test_cov')
    if cov is None:
        raise ValueError(
            f"{context}: test covariates unavailable — "
            f"{prep.get('test_cov_error', 'qcut binning failed')}. "
            "The k-fold test stage needs >= bin-count test rows per fold; "
            "for single-subject scoring use the serving CLI (cli.score), "
            "which bins by train quantiles.")
    return cov


def fold_paths(kfold_dir: Path, fold: int) -> Tuple[Path, Path]:
    return (kfold_dir / f'train_ids_{fold:03d}.csv',
            kfold_dir / f'test_ids_{fold:03d}.csv')


def fuse_preps(base_preps: List[dict], base_names: List[str],
               resource: str) -> dict:
    """Build the UCA early-fusion modality by concatenating the base
    modalities' already-scaled matrices in memory, instead of reading the
    early_fusion_modalities_<resource>.csv.

    Numerically identical to the file-based path: RobustScaler is
    per-column, so scaling the concatenated raw table fit on the same train
    rows equals concatenating the per-modality scaled blocks; row order
    follows the base modality CSVs exactly like the offline builder
    (early_fusion_modalities.py asserts shared IID order).
    """
    columns = []
    for prep, name in zip(base_preps, base_names):
        columns += [f"{c}_{name}" for c in prep['columns']]
    fused = {
        'columns': columns,
        'train_df': base_preps[0]['train_df'],
        'train_data': np.concatenate(
            [p['train_data'] for p in base_preps], axis=1),
        'train_cov': base_preps[-1]['train_cov'],
    }
    if 'test_data' in base_preps[0]:
        fused['test_df'] = base_preps[0]['test_df']
        fused['test_data'] = np.concatenate(
            [p['test_data'] for p in base_preps], axis=1)
        fused['test_cov'] = base_preps[-1]['test_cov']
        if 'test_cov_error' in base_preps[-1]:
            # preserve the qcut failure reason for require_test_cov
            fused['test_cov_error'] = base_preps[-1]['test_cov_error']
    return fused


def prepare_folds(args, project_root: Path, kfold_dir: Path, model_dir: Path,
                  dataset_names: List[str], participants_path):
    """Per-fold train-split prep for the supervised trainer (host side,
    threaded over fold x modality). Creates the per-fold model dirs and
    returns ``(folds, input_dim_list, c_dim)`` where ``folds`` is a list of
    ``(data_list, cov_list)`` per fold.

    With ``args.in_memory_fusion`` on a UCA procedure, the early-fusion
    modality is built by concatenating the scaled base blocks (fuse_preps)
    instead of reading its CSV.
    """
    from concurrent.futures import ThreadPoolExecutor

    n_folds = args.n_splits
    fold_ids = []
    for fold in range(n_folds):
        train_ids_path, _ = fold_paths(kfold_dir, fold)
        (model_dir / f'{fold:03d}').mkdir(exist_ok=True, parents=True)
        fold_ids.append(train_ids_path)

    in_memory_fusion = (getattr(args, 'in_memory_fusion', False)
                        and args.procedure.startswith('UCA'))
    load_names = dataset_names[:-1] if in_memory_fusion else dataset_names

    def prep_one(job):
        train_ids_path, dataset_name = job
        return prepare_modality(
            project_root, args.dataset_resourse, dataset_name,
            participants_path, train_ids_path,
        )

    jobs = [(ids, name) for ids in fold_ids for name in load_names]
    with ThreadPoolExecutor(max_workers=8) as pool:
        preps = list(pool.map(prep_one, jobs))

    folds = []
    input_dim_list = None
    c_dim = None
    n_loaded = len(load_names)
    for f in range(n_folds):
        fold_preps = list(preps[f * n_loaded:(f + 1) * n_loaded])
        if in_memory_fusion:
            fold_preps.append(fuse_preps(
                fold_preps, load_names, args.dataset_resourse))
        folds.append(([p['train_data'] for p in fold_preps],
                      [p['train_cov'] for p in fold_preps]))
        if input_dim_list is None:
            input_dim_list = [p['train_data'].shape[1] for p in fold_preps]
            c_dim = fold_preps[0]['train_cov'].shape[1]
    return folds, input_dim_list, c_dim


def parse_axis_sizes(spec, flag: str, n_axes, usage: str):
    """Comma- (or 'x'-) separated mesh axis sizes -> list[int], validated
    against positivity, the allowed axis counts, and the visible device
    count. SystemExit with the flag's usage on any error (shared by --mesh
    and --ep_mesh so the grammars cannot drift)."""
    import jax

    try:
        sizes = [int(s) for s in str(spec).replace('x', ',').split(',')]
    except ValueError:
        raise SystemExit(f"{flag} {spec!r}: expected comma-separated axis "
                         f"sizes, e.g. {usage}")
    if len(sizes) not in n_axes:
        counts = ' or '.join(str(n) for n in sorted(n_axes))
        raise SystemExit(f"{flag} takes {counts} axis sizes: {usage}")
    if any(s < 1 for s in sizes):
        raise SystemExit(f"{flag} {spec}: axis sizes must be positive")
    total = int(np.prod(sizes))
    if total != jax.device_count():
        raise SystemExit(f"{flag} {spec}: {total} mesh slots != "
                         f"{jax.device_count()} visible devices")
    return sizes


def parse_mesh(spec, n_folds: int, batch_size: int):
    """--mesh 'F,D' or 'F,D,M' -> (Mesh, shardings_fn or None).

    Validates against the visible device count and the divisibility rules
    the shardings rely on (stacked fold axis over F, batch rows over D).
    Three axes engage the tensor-parallel strategy (parallel/tensor.py)."""
    if not spec:
        return None, None
    sizes = parse_axis_sizes(spec, '--mesh', (2, 3),
                             '2,4 or 2,2,2 (fold,data[,model])')
    if n_folds % sizes[0]:
        raise SystemExit(f"--mesh {spec}: {n_folds} folds not divisible by "
                         f"the fold axis ({sizes[0]})")
    n_data = sizes[1]
    if n_data > 1 and batch_size % n_data:
        raise SystemExit(f"--mesh {spec}: batch size {batch_size} not "
                         f"divisible by the data axis ({n_data})")
    from ..parallel import fold_model_shardings, make_mesh, make_mesh3

    if len(sizes) == 2:
        return make_mesh(n_fold=sizes[0], n_data=sizes[1]), None
    return (make_mesh3(n_fold=sizes[0], n_data=sizes[1], n_model=sizes[2]),
            fold_model_shardings)


def ep_mesh_divisibility(sizes, n_folds: int, batch_size: int,
                         modalities: int, modality_axis_len=None,
                         modality_axis_desc=None):
    """Why an --ep_mesh geometry (M,D or F,M,D axis sizes) cannot launch,
    or None. Mirrors the runtime gates (parallel/modality.py
    _check_ep_geometry + EPFoldTrainer, train/packed.py
    PackedMultiFoldTrainer, cli/train_supervised.py fold check) so the
    train CLIs and doctor --ep-check fail fast — and identically — without
    building a trainer. ``modality_axis_len``/``modality_axis_desc``
    override the EP-axis geometry for layouts whose sharded axis is not
    [M]: the packed dual-bank endtoend trainer shards [2M], so
    cli/nmpmcont.py passes 2*modalities with desc 'dual-bank axis 2M'."""
    if len(sizes) == 3:
        if n_folds % sizes[0]:
            return (f"{n_folds} folds not divisible by the fold axis "
                    f"({sizes[0]})")
        m_axis, d_axis = sizes[1], sizes[2]
    else:
        m_axis, d_axis = sizes
    mal = modalities if modality_axis_len is None else modality_axis_len
    desc = (f"{modalities} modalities" if modality_axis_desc is None
            else f"{modality_axis_desc}={mal}")
    if mal % m_axis:
        return (f"{desc} not divisible over the "
                f"{m_axis}-way 'modality' mesh axis")
    # the 2-axis EP trainer shards batch rows by hand (shard_map); the
    # 3-axis path lets GSPMD place them, which tolerates uneven shards
    if len(sizes) == 2 and batch_size % d_axis:
        return (f"batch_size {batch_size} not divisible over the "
                f"{d_axis}-way 'data' mesh axis")
    return None


def parse_infer_mesh(spec):
    """--mesh 'F,D' (or the train stage's 'F,D,M' — one flag set drives the
    whole chain) -> ('fold', 'data') Mesh for the vmapped inference programs
    (test stage): folds shard over 'fold', padded test rows over 'data'.
    A tensor-parallel 'model' axis has no role in row-independent inference,
    so it collapses into 'data'. Fold-count divisibility is checked at the
    call site (the number of folds with restorable checkpoints isn't known
    at parse time)."""
    if not spec:
        return None
    import jax

    try:
        sizes = [int(s) for s in str(spec).replace('x', ',').split(',')]
    except ValueError:
        sizes = []
    if any(s < 1 for s in sizes):
        raise SystemExit(f"--mesh {spec}: axis sizes must be positive")
    if len(sizes) == 3:
        sizes = [sizes[0], sizes[1] * sizes[2]]
    if len(sizes) != 2:
        raise SystemExit(f"--mesh {spec!r}: expected two comma-separated "
                         "axis sizes, e.g. 2,4 (fold,data)")
    if sizes[0] * sizes[1] != jax.device_count():
        raise SystemExit(f"--mesh {spec}: {sizes[0] * sizes[1]} mesh slots "
                         f"!= {jax.device_count()} visible devices")
    from ..parallel import make_mesh

    return make_mesh(n_fold=sizes[0], n_data=sizes[1])


def fold_infer_jit(fn, mesh, with_key: bool = True):
    """jit(vmap(fn)) for the test stages' (stacked_params, xes, cs[, keys])
    signature, optionally sharded over a ('fold', 'data') mesh: per-fold
    params/keys over 'fold', padded test rows over 'data' (rows are
    independent through every model, so this is pure scale-out)."""
    import jax

    vfn = jax.vmap(fn)
    if mesh is None:
        return jax.jit(vfn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    def sh(spec):
        return NamedSharding(mesh, spec)

    in_sh = [sh(P('fold')), sh(P('fold', 'data')), sh(P('fold', 'data'))]
    if with_key:
        in_sh.append(sh(P('fold')))
    return jax.jit(vfn, in_shardings=tuple(in_sh))


def infer_row_tile(mesh, base: int = 64) -> int:
    """Row-padding bucket for the vmapped inference programs: with a mesh
    the bucket must also divide evenly across the 'data' axis."""
    if mesh is None:
        return base
    import math

    return math.lcm(base, mesh.shape['data'])


def check_infer_fold_axis(mesh, n_folds: int, what: str = 'folds') -> None:
    if mesh is None:
        return
    ax = mesh.shape['fold']
    if n_folds % ax:
        raise SystemExit(f"--mesh: {n_folds} {what} not divisible by the "
                         f"fold axis ({ax})")


def parse_sweep_mesh(spec, n_configs: int, n_folds: int):
    """--mesh 'S,F' -> ('config', 'fold') Mesh for the sweep engine.

    Grid points shard over 'config' (embarrassingly parallel scale-out),
    folds over 'fold'; both extents must divide evenly."""
    if not spec:
        return None
    import jax

    try:
        sizes = [int(s) for s in str(spec).replace('x', ',').split(',')]
    except ValueError:
        sizes = []
    if len(sizes) != 2:
        raise SystemExit(f"--mesh {spec!r}: expected two comma-separated "
                         "axis sizes, e.g. 4,2 (config,fold)")
    if any(s < 1 for s in sizes):
        raise SystemExit(f"--mesh {spec}: axis sizes must be positive")
    total = sizes[0] * sizes[1]
    if total != jax.device_count():
        raise SystemExit(f"--mesh {spec}: {total} mesh slots != "
                         f"{jax.device_count()} visible devices")
    if n_configs % sizes[0]:
        raise SystemExit(f"--mesh {spec}: {n_configs} grid configs not "
                         f"divisible by the config axis ({sizes[0]})")
    if n_folds % sizes[1]:
        raise SystemExit(f"--mesh {spec}: {n_folds} folds not divisible by "
                         f"the fold axis ({sizes[1]})")
    from ..parallel.mesh import make_sweep_mesh

    return make_sweep_mesh(n_config=sizes[0], n_fold=sizes[1])


def parse_run_mesh(args, n_folds: int, batch_size: int):
    """Resolve a CLI's --mesh into (Mesh, shardings_fn) for run_folds.

    Mirrors cli/train_supervised.py's contract: the mesh shards the
    fold-parallel program, so --fold_parallel is required; announces the
    mesh geometry when one engages."""
    spec = getattr(args, 'mesh', None)
    if spec and not getattr(args, 'fold_parallel', False):
        raise SystemExit('--mesh requires --fold_parallel (the mesh shards '
                         'the fold-parallel program)')
    mesh, shardings_fn = parse_mesh(spec, n_folds=n_folds,
                                    batch_size=batch_size)
    if mesh is not None:
        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        print(f'fold-parallel training over a {axes} device mesh')
    return mesh, shardings_fn


def add_mesh_flag(parser) -> None:
    """The --mesh flag shared by every fold-parallel-capable trainer CLI."""
    parser.add_argument('--mesh', dest='mesh', default=None, metavar='F,D',
                        help='shard the fold-parallel program over a device '
                             'mesh: F,D (folds x data-parallel) or F,D,M '
                             '(+ tensor-parallel model axis); product must '
                             'equal the visible device count; requires '
                             '--fold_parallel')


def add_resume_flags(parser) -> None:
    """--checkpoint_every/--resume shared by every run_folds-based trainer."""
    parser.add_argument('--checkpoint_every', dest='checkpoint_every',
                        type=int, default=0, metavar='N',
                        help='write a resumable train-state checkpoint '
                             '(params + optimizer state + PRNG + epoch '
                             'cursor) every N epochs; chunked execution is '
                             'bit-identical to the single-scan run')
    parser.add_argument('--resume', dest='resume', action='store_true',
                        help='resume a killed run from its train-state '
                             'checkpoint (requires --checkpoint_every)')


def require_checkpoint_for_resume(args) -> None:
    """--resume without --checkpoint_every would silently retrain from
    scratch (the resumable branch is never taken) — refuse loudly instead."""
    if getattr(args, 'resume', False) and not (
            getattr(args, 'checkpoint_every', 0) or 0):
        raise SystemExit(
            '--resume requires --checkpoint_every N: a resumable train '
            'state is only written (and read) when checkpointing is on')


def uniform_covariates(folds):
    """None when every fold's per-modality covariate blocks are identical,
    else the reason string. The packed layouts feed ONE covariate block to
    every modality, which is only equivalent to the per-modality path when
    the blocks match (they do whenever the modality CSVs share row order,
    the common case — but never assume it silently). Shared by
    train_supervised/sweep_supervised/run_folds."""
    import numpy as np

    for _, cov_list in folds:
        first = cov_list[0]
        for c in cov_list[1:]:
            if c.shape != first.shape or not np.array_equal(c, first):
                return ('per-modality covariates differ across modalities '
                        '(packed layout shares one block)')
    return None


def run_folds(model, config, folds, params_list, keys, fold_parallel: bool,
              loss_fn=None, state_update=None, per_fold_extras=None,
              mesh=None, shardings_fn=None, state_dir=None,
              checkpoint_every: int = 0, resume: bool = False,
              packed: bool = False):
    """Train every fold — sequentially with a shared compiled trainer, or all
    at once as one vmapped program (numerics identical; see
    tests/test_parallel.py). ``folds`` is a list of (data_list, cov_list).
    With ``mesh`` (a parse_mesh result) the vmapped program additionally
    shards folds/batch rows (and, with a 3-axis mesh, weights) across
    devices. With ``checkpoint_every`` > 0 (requires ``state_dir``) training
    runs in resumable chunks — one whole-run state under ``state_dir`` on
    the fold-parallel path, per-fold states under ``state_dir/NNN`` on the
    sequential path — and kill-and-resume is bit-identical.

    ``packed=True`` (--packed_xla) trains on the packed-modality layouts
    (mixed-width cvae-skeleton -> width-grouped, else padded stacked) when the
    model/config/data support it — cvae-skeleton variants, no custom
    loss/state/extras, no mesh, identical per-modality covariate blocks —
    and falls back loudly to the per-modality layout otherwise.

    Returns (per_fold_params, per_fold_logs) as host numpy pytrees.
    """
    if resume and not checkpoint_every:
        raise SystemExit(
            '--resume requires --checkpoint_every N: a resumable train '
            'state is only written (and read) when checkpointing is on')
    if checkpoint_every and state_dir is None:
        # every state-dir join below assumes a real path; a bare TypeError
        # from Path(None) would hide the actual caller mistake
        raise SystemExit(
            'checkpoint_every > 0 requires state_dir: resumable train '
            'states need a directory to live in')
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..train import FoldTrainer
    from ..parallel import MultiFoldTrainer, stack_fold_batches, stack_params
    from ..parallel.folds import unstack_params

    n_folds = len(folds)
    if packed:
        from ..train.packed import packed_supported

        reasons = [r for r, on in [
            ('custom loss', loss_fn is not None),
            ('non-gradient state updates', state_update is not None),
            ('per-sample extras', bool(per_fold_extras)),
            ('--mesh', mesh is not None),
        ] if on]
        if not reasons:
            ok, why = packed_supported(model, config)
            if not ok:
                reasons.append(why)
        if not reasons:
            cov_reason = uniform_covariates(folds)
            if cov_reason:
                reasons.append(cov_reason)
        if reasons:
            print(f'--packed_xla unavailable ({"; ".join(reasons)}); '
                  'using the per-modality layout')
            packed = False
    if packed:
        from pathlib import Path as _Path

        from ..train.grouped import (notice_stale_padded_state,
                                     packed_state_dirname,
                                     select_packed_trainer)

        cls, layout, grouped = select_packed_trainer(model, fold_parallel)
        if fold_parallel:
            max_n = max(f[0][0].shape[0] for f in folds)
            pmft = cls(model, config, max_n)
            print(f'train model (all folds fold-parallel, {layout} '
                  'modalities)')
            if checkpoint_every:
                if resume:
                    notice_stale_padded_state(state_dir, grouped)
                return pmft.run_resumable(
                    params_list, folds, list(keys),
                    state_dir=_Path(state_dir)
                    / packed_state_dirname(grouped),
                    checkpoint_every=checkpoint_every, resume=resume)
            return pmft.run(params_list, folds, list(keys))
        ptr = cls(model, config, folds[0][0][0].shape[0])
        print(f'train model ({layout} modalities)')
        per_fold_params, per_fold_logs = [], []
        for f, (data_list, cov_list) in enumerate(folds):
            if checkpoint_every:
                if resume:
                    notice_stale_padded_state(state_dir, grouped, f)
                params, logs = ptr.run_resumable(
                    params_list[f], data_list, cov_list[0], keys[f],
                    state_dir=_Path(state_dir)
                    / packed_state_dirname(grouped, f),
                    checkpoint_every=checkpoint_every, resume=resume)
            else:
                params, logs = ptr.run(params_list[f], data_list,
                                       cov_list[0], key=keys[f])
            per_fold_params.append(params)
            per_fold_logs.append(logs)
        return per_fold_params, per_fold_logs
    if fold_parallel and config.shuffle:
        # the shuffled path permutes over each trainer's padded batch grid;
        # vmapped folds share ONE grid (the largest), so a smaller fold's
        # permutation domain would differ from its sequential run and the
        # 'numerics identical' contract would silently break
        nbs = {max(1, -(-f[0][0].shape[0] // config.batch_size))
               for f in folds}
        if len(nbs) > 1:
            print('fold-parallel disabled for this run: shuffle=True with '
                  'unequal fold batch grids would diverge from the '
                  'sequential numerics; training folds sequentially')
            fold_parallel = False
            if mesh is not None:
                print('--mesh ignored: it shards the fold-parallel program')
                mesh = None
    if fold_parallel:
        max_n = max(f[0][0].shape[0] for f in folds)
        mft = MultiFoldTrainer(model, config, max_n, loss_fn=loss_fn,
                               state_update=state_update, mesh=mesh,
                               shardings_fn=shardings_fn)
        stacked = stack_params(params_list)
        batches = stack_fold_batches([f[0] for f in folds],
                                     [f[1] for f in folds],
                                     config.batch_size,
                                     extras=per_fold_extras)
        # with a mesh, keep batches on the host: jit's in_shardings place
        # the shards (an eager device_put would commit them to one device)
        if mesh is None:
            batches = jax.device_put(batches)
        if checkpoint_every:
            out_params, logs = mft.run_resumable(
                stacked, batches, jnp.stack(list(keys)),
                state_dir=state_dir, checkpoint_every=checkpoint_every,
                resume=resume)
        else:
            out_params, logs = mft.run(stacked, batches,
                                       jnp.stack(list(keys)))
        host_params = jax.tree_util.tree_map(np.asarray,
                                             jax.device_get(out_params))
        host_logs = jax.tree_util.tree_map(np.asarray, jax.device_get(logs))
        return (unstack_params(host_params, n_folds),
                [{k: v[f] for k, v in host_logs.items()}
                 for f in range(n_folds)])

    trainer = FoldTrainer(model, config, folds[0][0][0].shape[0],
                          loss_fn=loss_fn, state_update=state_update)
    per_fold_params, per_fold_logs = [], []
    for f, (data_list, cov_list) in enumerate(folds):
        extras = per_fold_extras[f] if per_fold_extras else None
        if checkpoint_every:
            from pathlib import Path as _Path

            params, logs = trainer.run_resumable(
                params_list[f], data_list, cov_list, keys[f],
                state_dir=_Path(state_dir) / f'{f:03d}',
                checkpoint_every=checkpoint_every, resume=resume,
                extras=extras)
        else:
            params, logs = trainer.run(params_list[f], data_list, cov_list,
                                       key=keys[f], extras=extras)
        per_fold_params.append(
            jax.tree_util.tree_map(np.asarray, jax.device_get(params)))
        per_fold_logs.append(logs)
    return per_fold_params, per_fold_logs


def model_config_dict(args, input_dim_list: List[int], c_dim: int,
                      modalities: int) -> dict:
    return {
        'model': args.model,
        'input_dim_list': list(map(int, input_dim_list)),
        'hidden_dim': list(args.hz_para_list[:-1]),
        'latent_dim': int(args.hz_para_list[-1]),
        'c_dim': int(c_dim),
        'modalities': int(modalities),
        'non_linear': True,
        'combine': args.combine,
    }


def build_model_from_config(config: dict):
    from ..models import build_model

    return build_model(
        config['model'], config['input_dim_list'], config['hidden_dim'],
        config['latent_dim'], config['c_dim'], config['modalities'],
        config.get('non_linear', True),
    )
