"""Resident normative-model scoring service (serving daemon).

Beyond-reference capability. The reference has no serving story at all —
its only scoring path is the k-fold test script re-run from scratch
(multimodal_kfold_test_cvae_supervised.py), which on this stack would pay
the per-process device-session attach (~0.4 s healthy, measured minutes
when the tunnel is degraded — RESULTS.md) plus model/data load on EVERY
request. This daemon pays them once:

  * at startup it loads every fold checkpoint, re-fits each fold's
    RobustScaler from its train ids (the reference's serving convention,
    test script:82-90), bins covariates by train quantiles
    (data/preprocess.train_binned_covariates), and compiles ONE
    fold-vmapped device program that scales -> encodes -> decodes ->
    deviates all folds of the ensemble in a single dispatch —
    per-request work is one jitted call plus a few host microseconds;
  * requests are served over HTTP (stdlib, loopback by default):
      GET  /healthz            liveness + model/config introspection
      POST /score              {"ids": [...]} resolved against the
                               project's modality tables, or raw payloads
                               {"features": {modality: [[...], ...]},
                                "covariates": {"AGE": [...],
                                               "PTGENDER": [...]}}
                               (+ optional "roi": true, "fold": int,
                                "latent": true for latent z-scores against
                                each fold's train-cohort latent statistics,
                                utils_vae.py:155-161)
  * batch sizes are padded to a bucket multiple so repeat request shapes
    reuse the compiled program (the persistent compile cache,
    utils/jaxconfig.py, covers daemon restarts).

Bind contract (non-loopback hardening):

  * default bind is loopback (127.0.0.1) — safe on a shared box with no
    further configuration;
  * binding any other interface is allowed but should carry a bearer token
    (``--auth_token`` or the ``MMNM_SERVE_TOKEN`` env var). With a token
    set, every ``POST /score`` must send ``Authorization: Bearer <token>``
    (constant-time comparison) or gets 401; ``GET /healthz`` stays open for
    liveness probes and carries no cohort data. A non-loopback bind with
    no token logs a loud warning;
  * request bodies are capped (``--max_body_bytes``, default 64 MiB —
    sized for a batch-256 PPMI-width raw JSON payload): oversized or
    length-less requests are rejected 413/411 BEFORE the body is read, so
    a hostile client cannot balloon daemon memory;
  * TLS is out of scope — front with a reverse proxy for encrypted or
    internet-facing deployments. This daemon's trust boundary is
    "research network with a token", not "public internet".


Scoring semantics match cli/score.py (same per-fold scalers, train-binned
covariates, per-fold PRNG streams, fold-ensemble mean), with the per-fold
loop replaced by one vmap over stacked params — tested against score.py
in tests/test_serve.py.
"""
from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pandas as pd

from ..data.preprocess import train_binned_covariates
from ..infer.ensemble import (
    ensure_latent_stats,
    fold_infer_fn,
    fold_latent_fn,
    load_ensemble,
    validate_features,
)
from . import common


class ServeError(ValueError):
    """Client-visible request error (HTTP 400)."""


class ScoringService:
    """Fold-ensemble deviation scoring with all state resident in memory.

    One instance per trained experiment directory; thread-safe (device
    dispatch is serialized on a lock, host prep runs concurrently).
    """

    def __init__(self, resource: str, procedure: str, combine: str = None,
                 n_splits: int = 10, project_root=None, seed: int = 42,
                 pad_to: int = 64, mesh=None, ep_mesh=None):
        import jax

        from ..utils.jaxconfig import warm_device_session

        warm_device_session()  # overlap the session attach with host prep
        # --mesh F,D: the resident scoring program shards the fold ensemble
        # over 'fold' and request rows over 'data' (pure scale-out — rows
        # are independent and folds don't communicate).
        # --ep_mesh F,M,D: the packed-modality program additionally shards
        # per-modality experts over 'modality' — PPMI-width scoring is
        # where the modality axis pays (parallel/modality.py:17-22).
        if mesh is not None and ep_mesh is not None:
            raise ValueError('--ep_mesh is mutually exclusive with --mesh')
        self.mesh = mesh
        self.ep_mesh = ep_mesh
        if mesh is not None:
            common.check_infer_fold_axis(mesh, n_splits)
            pad_to = common.infer_row_tile(mesh, base=pad_to)
        if ep_mesh is not None:
            common.check_infer_fold_axis(ep_mesh, n_splits)
            pad_to = common.infer_row_tile(ep_mesh, base=pad_to)
        self.resource = resource
        self.procedure = procedure
        # resolved after the checkpoint load below: the trained config's
        # 'combine' beats the procedure-suffix heuristic (wrong for SM-*)
        self.combine = combine
        self.n_splits = n_splits
        self.seed = seed
        self.pad_to = pad_to
        self.project_root = Path(project_root) if project_root else Path.cwd()
        self.started = time.time()
        self.requests_served = 0
        self._lock = threading.Lock()
        # separate build lock: concurrent FIRST latent requests must not
        # race ensure_latent_stats' state mutation, and holding the
        # dispatch lock through a compile would stall plain scoring
        self._latent_build_lock = threading.Lock()

        kfold_dir = self.project_root / 'outputs' / 'kfold_analysis'
        participants_path = (self.project_root / 'data' / resource / 'y.csv')

        # ---- per-fold state: params, scalers, train covariate cohorts ----
        state = load_ensemble(resource, procedure, combine=self.combine,
                              n_splits=n_splits,
                              project_root=self.project_root, seed=seed)
        self.state = state
        self.combine = state.combine
        self.dataset_names = state.dataset_names
        self.model, self.config = state.model, state.config
        self._train_covs = state.train_covs
        self._stacked_params = state.stacked_params
        self._centers = state.centers  # tuples of [K, F_m], one per modality
        self._scales = state.scales
        self._seeds = state.seeds

        # ---- full-cohort modality frames for ids-mode resolution ----
        self.columns = state.columns
        self._frames = []
        all_ids = kfold_dir / 'serve_all_ids.csv'
        all_ids.parent.mkdir(parents=True, exist_ok=True)
        pd.DataFrame({'IID': pd.read_csv(participants_path)['IID']}).to_csv(
            all_ids, index=False)
        for name in self.dataset_names:
            frame = common.load_dataset_cached(
                participants_path, all_ids,
                self.project_root / 'data' / resource / f'{name}.csv')
            self._frames.append(frame.set_index('participant_id'))

        # ---- the one device program: all folds, scale->infer->deviate ----
        # params/scalers/covs/seeds carry the fold axis; raw features are
        # shared across folds and broadcast
        self._ep = None
        self._ep_grouped = None
        if ep_mesh is not None:
            from ..models.stacked import (
                SKELETON_VARIANTS,
                StackedMultimodalCVAE,
            )

            name = self.config.get('model', 'cVAE_multimodal')
            if name not in SKELETON_VARIANTS:
                raise SystemExit(
                    f"--ep_mesh serving supports the cVAE skeleton only "
                    f"({sorted(SKELETON_VARIANTS)}; checkpoint model "
                    f"{name!r})")
            if self.config['modalities'] % ep_mesh.shape['modality']:
                raise SystemExit(
                    f"--ep_mesh: {self.config['modalities']} modalities not "
                    f"divisible over the {ep_mesh.shape['modality']}-way "
                    "'modality' mesh axis")
            from jax.sharding import NamedSharding, PartitionSpec as P

            def sh(spec):
                return NamedSharding(ep_mesh, spec)

            from ..models.grouped import GroupedStackedCVAE, width_groups

            nm = ep_mesh.shape['modality']
            if len(width_groups(self.config['input_dim_list'])) > 1:
                # round 5: mixed-width cohorts serve on the pad-free
                # width-grouped layout — divisible width-group axes shard
                # over 'modality', ragged groups replicate (same rule as
                # parallel/modality.grouped_fold_shardings); the wide
                # cohorts EP targets stop paying the pad-to-widest tax
                from ..infer.ensemble import (
                    fold_infer_fn_grouped,
                    pack_ensemble_grouped,
                )

                grouped = GroupedStackedCVAE(
                    self.config['input_dim_list'],
                    self.config['hidden_dim'], self.config['latent_dim'],
                    self.config['c_dim'], self.config['modalities'],
                    self.config.get('non_linear', True),
                    variant=SKELETON_VARIANTS[name])
                self._ep_grouped = grouped
                self._ep = pack_ensemble_grouped(state, grouped)
                self._ep_stacked = grouped

                from ..parallel.modality import ep_divisible_spec

                def leaf_sh(leaf):
                    # shared divisible-or-replicate EP rule (one owner:
                    # parallel/modality.ep_divisible_spec)
                    return sh(ep_divisible_spec(nm, np.shape(leaf)))

                params_sh = jax.tree_util.tree_map(leaf_sh, self._ep[0])
                cg_sh = tuple(
                    sh(P('fold',
                         'modality' if np.shape(c)[1] % nm == 0 else None,
                         None))
                    for c in self._ep[1])
                xg_sh = tuple(
                    sh(P('modality' if np.shape(c)[1] % nm == 0 else None,
                         'data', None))
                    for c in self._ep[1])
                vinfer = jax.vmap(fold_infer_fn_grouped(state, grouped),
                                  in_axes=(0, 0, 0, 0, 0, None))
                self._infer = jax.jit(vinfer, in_shardings=(
                    params_sh, cg_sh, cg_sh,
                    sh(P('fold', 'data', None)), sh(P('fold')), xg_sh))
            else:
                from ..infer.ensemble import (
                    fold_infer_fn_ep,
                    pack_ensemble_ep,
                )

                stacked = StackedMultimodalCVAE(
                    self.config['input_dim_list'],
                    self.config['hidden_dim'], self.config['latent_dim'],
                    self.config['c_dim'], self.config['modalities'],
                    self.config.get('non_linear', True),
                    variant=SKELETON_VARIANTS[name])
                self._ep = pack_ensemble_ep(state, stacked)
                self._ep_stacked = stacked
                params_sh = jax.tree_util.tree_map(
                    lambda leaf: sh(P('fold', 'modality',
                                      *([None] * (np.ndim(leaf) - 2)))),
                    self._ep[0])
                vinfer = jax.vmap(fold_infer_fn_ep(state, stacked),
                                  in_axes=(0, 0, 0, 0, 0, None))
                self._infer = jax.jit(vinfer, in_shardings=(
                    params_sh, sh(P('fold', 'modality', None)),
                    sh(P('fold', 'modality', None)),
                    sh(P('fold', 'data', None)),
                    sh(P('fold')), sh(P('modality', 'data', None))))
        else:
            vinfer = jax.vmap(fold_infer_fn(state),
                              in_axes=(0, 0, 0, 0, 0, None))
            self._infer = jax.jit(vinfer, in_shardings=self._shardings(
                n_fold_axis_args=5)) if mesh is not None else jax.jit(vinfer)
        # latent z-scoring program compiled lazily on the first latent
        # request (separate trace; most deployments never ask for it)
        self._latent_prog = None

    def _shardings(self, n_fold_axis_args: int):
        """in_shardings for a (fold-axis args..., xes) program signature:
        fold-stacked operands over 'fold' (covs, arg index 3, additionally
        shards its row dim over 'data'), broadcast feature rows over
        'data'."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        def sh(spec):
            return NamedSharding(self.mesh, spec)

        fold_axis = [sh(P('fold'))] * n_fold_axis_args
        fold_axis[3] = sh(P('fold', 'data'))   # covs: [K, rows, C]
        return tuple(fold_axis) + (sh(P('data')),)  # xes: [rows, F_m]

    def _latent_infer(self):
        import jax

        if self.ep_mesh is not None:
            raise ServeError(
                'latent scoring is not available under --ep_mesh (the '
                'fused-latent z-score path runs per-modality); serve with '
                '--mesh or unmeshed for latent requests')
        with self._latent_build_lock:
            if self._latent_prog is None:
                try:
                    ensure_latent_stats(self.state)
                except ValueError as e:
                    raise ServeError(str(e))
                vlat = jax.vmap(fold_latent_fn(self.state),
                                in_axes=(0, 0, 0, 0, 0, 0, None))
                self._latent_prog = (
                    jax.jit(vlat, in_shardings=self._shardings(
                        n_fold_axis_args=6)) if self.mesh is not None
                    else jax.jit(vlat))
        return self._latent_prog

    # ------------------------------------------------------------- scoring
    def score_ids(self, ids, roi: bool = False, fold: int = None,
                  latent: bool = False) -> dict:
        """Score subjects already present in the project's modality tables."""
        if not ids:
            raise ServeError('empty ids list')
        rows = []
        for name, frame in zip(self.dataset_names, self._frames):
            missing = [i for i in ids if i not in frame.index]
            if missing:
                raise ServeError(
                    f'unknown participant id(s) in modality {name}: '
                    f'{missing[:5]}')
            rows.append(frame.loc[list(ids)])
        features = [r[cols].to_numpy(np.float32)
                    for r, cols in zip(rows, self.columns)]
        covariates = rows[-1][['AGE', 'PTGENDER']]  # last-modality
        result = self._score(features, covariates, roi=roi, fold=fold,
                             latent=latent)
        result['participant_id'] = list(ids)
        return result

    def score_raw(self, features: dict, covariates: dict, roi: bool = False,
                  fold: int = None, latent: bool = False) -> dict:
        """Score raw feature payloads (no project-table lookup)."""
        mats, n = validate_features(features, self.dataset_names,
                                    [len(c) for c in self.columns],
                                    error_cls=ServeError)
        try:
            cov_frame = pd.DataFrame({'AGE': covariates['AGE'],
                                      'PTGENDER': covariates['PTGENDER']})
        except (KeyError, TypeError, ValueError) as e:
            raise ServeError(f'covariates must carry equal-length AGE and '
                             f'PTGENDER lists: {e}')
        if len(cov_frame) != n:
            raise ServeError('covariate length != subject count')
        return self._score(mats, cov_frame, roi=roi, fold=fold,
                           latent=latent)

    def _score(self, features, cov_frame, roi: bool, fold,
               latent: bool = False) -> dict:
        if fold is not None and not 0 <= fold < self.n_splits:
            raise ServeError(f'fold must be in [0, {self.n_splits})')
        latent_prog = self._latent_infer() if latent else None
        n = features[0].shape[0]
        padded = -(-n // self.pad_to) * self.pad_to
        xes = tuple(np.pad(f, ((0, padded - n), (0, 0))) for f in features)
        try:
            covs = np.stack([
                train_binned_covariates(tc, cov_frame).astype(np.float32)
                for tc in self._train_covs])               # [K, n, C]
        except ValueError as e:
            raise ServeError(f'covariate binning failed: {e}')
        covs = np.pad(covs, ((0, 0), (0, padded - n), (0, 0)))
        with self._lock:
            if self._ep is not None:
                params_p, centers_p, scales_p = self._ep
                x_packed = self._ep_stacked.pack_inputs(list(xes))
                devs, sq = self._infer(params_p, centers_p, scales_p, covs,
                                       self._seeds, x_packed)
                devs = np.asarray(devs)[:, :, :n]          # [K, M, n]
                rois = None
                if roi and self._ep_grouped is not None:
                    # sq is a tuple per width group [K, G_g, p, d_g]:
                    # reassemble the per-ROI plane in original modality
                    # order (exact widths — no padded columns to strip)
                    sq = [np.asarray(s) for s in sq]
                    g = self._ep_grouped
                    blocks = []
                    for m in range(len(self.columns)):
                        gi = next(i for i, (_, idx) in enumerate(g.groups)
                                  if m in idx)
                        within = g.groups[gi][1].index(m)
                        blocks.append(sq[gi][:, within, :n, :])
                    rois = np.concatenate(blocks, axis=2)  # [K, n, sum F]
                elif roi:
                    sq = np.asarray(sq)                    # [K, M, p, d_max]
                    dims = [len(c) for c in self.columns]
                    rois = np.concatenate(
                        [sq[:, m, :n, :d] for m, d in enumerate(dims)],
                        axis=2)                            # [K, n, sum F]
            else:
                devs, rois = self._infer(self._stacked_params, self._centers,
                                         self._scales, covs, self._seeds,
                                         xes)
                devs = np.asarray(devs)[:, :, :n]          # [K, M, n]
                rois = np.asarray(rois)[:, :n] if roi else None
            if latent:
                lat_s, lat_z = latent_prog(
                    self._stacked_params, self._centers, self._scales, covs,
                    self.state.latent_mean, self.state.latent_var, xes)
                lat_s = np.asarray(lat_s)[:, :n]           # [K, n]
                lat_z = np.asarray(lat_z)[:, :n]           # [K, n, D]
            self.requests_served += 1
        folds = slice(None) if fold is None else slice(fold, fold + 1)
        per_mod = devs[folds].mean(axis=0)                 # [M, n]
        out = {
            'deviation': per_mod.mean(axis=0).tolist(),
            'per_modality': {name: per_mod[m].tolist()
                             for m, name in enumerate(self.dataset_names)},
            'n_folds': self.n_splits if fold is None else 1,
        }
        if roi:
            out['roi_columns'] = [f'{c}_{name}' for cols, name
                                  in zip(self.columns, self.dataset_names)
                                  for c in cols]
            out['roi'] = rois[folds].mean(axis=0).tolist()
        if latent:
            out['latent_deviation'] = lat_s[folds].mean(axis=0).tolist()
            out['latent_per_dim'] = lat_z[folds].mean(axis=0).tolist()
        return out

    def health(self) -> dict:
        import jax
        return {
            'status': 'ok',
            'resource': self.resource,
            'procedure': self.procedure,
            'combine': self.combine,
            'n_folds': self.n_splits,
            'modalities': list(self.dataset_names),
            'feature_dims': [len(c) for c in self.columns],
            'model': self.config.get('variant', 'cvae'),
            'latent_scoring': (self.state.supports_latent
                               and self.ep_mesh is None),
            'mesh': (dict(self.ep_mesh.shape) if self.ep_mesh is not None
                     else dict(self.mesh.shape) if self.mesh is not None
                     else None),
            # EP resident-program layout (round 5): mixed-width cohorts
            # serve on the pad-free width-grouped layout
            'ep_layout': (None if self.ep_mesh is None
                          else 'width-grouped'
                          if self._ep_grouped is not None else 'packed'),
            'backend': jax.default_backend(),
            'uptime_seconds': round(time.time() - self.started, 1),
            'requests_served': self.requests_served,
        }


# ------------------------------------------------------------------ HTTP
DEFAULT_MAX_BODY_BYTES = 64 * 1024 * 1024  # fits a batch-256 PPMI-width
#                                            (3 x 3485 floats) raw JSON body


def make_server(service: ScoringService, host: str = '127.0.0.1',
                port: int = 0, auth_token: str = None,
                max_body_bytes: int = DEFAULT_MAX_BODY_BYTES,
                ) -> ThreadingHTTPServer:
    """Build the HTTP server around a :class:`ScoringService`.

    ``auth_token`` (optional) gates every POST behind
    ``Authorization: Bearer <token>`` (compared constant-time);
    ``GET /healthz`` stays open for liveness probes. ``max_body_bytes``
    rejects oversized (413) or length-less (411) requests before the body
    is read. See the module docstring's bind contract.
    """
    import hmac
    import logging

    if auth_token is not None and not auth_token:
        raise ValueError('auth_token must be non-empty when set')
    if host not in ('127.0.0.1', 'localhost', '::1') and not auth_token:
        logging.getLogger('mmnm.serve').warning(
            'binding non-loopback interface %s WITHOUT --auth_token: '
            'any client that can reach this port can score payloads — '
            'set --auth_token / MMNM_SERVE_TOKEN (module docstring: '
            'bind contract)', host)

    class Handler(BaseHTTPRequestHandler):
        server_version = 'mmnm-serve/1.0'

        def log_message(self, fmt, *args):  # route through logging, not
            import logging                   # stderr-per-request
            logging.getLogger('mmnm.serve').info(fmt, *args)

        def _reply(self, code: int, payload: dict, headers=()):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            for k, v in headers:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _authorized(self) -> bool:
            if auth_token is None:
                return True
            # compare as bytes: compare_digest raises TypeError on
            # non-ASCII str operands (headers decode as latin-1), which
            # would abort the connection instead of returning 401
            supplied = self.headers.get('Authorization', '').encode(
                'latin-1', 'backslashreplace')
            expected = f'Bearer {auth_token}'.encode(
                'latin-1', 'backslashreplace')
            return hmac.compare_digest(supplied, expected)

        def do_GET(self):
            if self.path.rstrip('/') in ('', '/healthz'.rstrip('/')):
                self._reply(200, service.health())
            else:
                self._reply(404, {'error': f'no route {self.path}'})

        def do_POST(self):
            if self.path.rstrip('/') != '/score':
                self._reply(404, {'error': f'no route {self.path}'})
                return
            if not self._authorized():
                self._reply(401, {'error': 'missing or invalid bearer '
                                           'token'},
                            headers=[('WWW-Authenticate', 'Bearer')])
                return
            # a MISSING header must also 411 (the contract: reject
            # length-less requests before reading; a chunked body left
            # unread would desync subsequent keep-alive requests)
            raw_length = self.headers.get('Content-Length')
            try:
                length = int(raw_length)
            except (TypeError, ValueError):
                length = -1
            if length < 0:
                self._reply(411, {'error': 'Content-Length required'})
                return
            if length > max_body_bytes:
                # refuse BEFORE reading: the cap exists so a hostile
                # client cannot balloon daemon memory
                self._reply(413, {'error': f'request body {length} bytes '
                                  f'exceeds cap {max_body_bytes}'})
                return
            try:
                req = json.loads(self.rfile.read(length) or b'{}')
                roi = bool(req.get('roi', False))
                fold = req.get('fold')
                latent = bool(req.get('latent', False))
                if 'ids' in req:
                    out = service.score_ids(req['ids'], roi=roi, fold=fold,
                                            latent=latent)
                elif 'features' in req:
                    out = service.score_raw(req['features'],
                                            req.get('covariates', {}),
                                            roi=roi, fold=fold,
                                            latent=latent)
                else:
                    raise ServeError(
                        "request needs 'ids' or 'features'+'covariates'")
                self._reply(200, out)
            except (ServeError, json.JSONDecodeError) as e:
                self._reply(400, {'error': str(e)})
            except Exception as e:  # keep the daemon alive on surprises
                self._reply(500, {'error': f'{type(e).__name__}: {e}'})

    return ThreadingHTTPServer((host, port), Handler)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description='Serve a trained normative model over HTTP.')
    parser.add_argument('-R', '--dataset_resourse', type=str, default='ADNI')
    parser.add_argument('-P', '--procedure', type=str, default='UCA-gPoE')
    parser.add_argument('-C', '--combine', type=str, default=None)
    parser.add_argument('-K', '--n_splits', type=int, default=10)
    parser.add_argument('--host', default='127.0.0.1')
    parser.add_argument('--port', type=int, default=8465)
    parser.add_argument('--seed', type=int, default=42)
    parser.add_argument('--ready_file', default=None,
                        help='write host:port here once listening (for '
                             'scripts/tests that need the bound port).')
    parser.add_argument('--mesh', dest='mesh', default=None, metavar='F,D',
                        help='shard the resident scoring program over a '
                             '(fold, data) device mesh: ensemble folds over '
                             'F, request rows over D; product must equal '
                             'the visible device count')
    parser.add_argument('--ep_mesh', dest='ep_mesh', default=None,
                        metavar='F,M,D',
                        help='expert-parallel serving: the resident packed-'
                             'modality program shards ensemble folds over '
                             'F, per-modality experts over M (must divide '
                             'the modality count) and request rows over D. '
                             'cVAE family; latent scoring stays on '
                             '--mesh/unmeshed. Mutually exclusive with '
                             '--mesh.')
    parser.add_argument('--auth_token', default=None,
                        help='require "Authorization: Bearer <token>" on '
                             'POST /score (default: $MMNM_SERVE_TOKEN if '
                             'set; /healthz stays open for liveness). '
                             'Strongly recommended for non-loopback binds '
                             '— see the module docstring bind contract.')
    parser.add_argument('--max_body_bytes', type=int,
                        default=DEFAULT_MAX_BODY_BYTES,
                        help='reject request bodies larger than this '
                             '(413) before reading them (default 64 MiB)')
    return parser


def run(argv=None, project_root=None):
    import os

    args = build_parser().parse_args(argv)
    token = args.auth_token or os.environ.get('MMNM_SERVE_TOKEN') or None
    ep_mesh = None
    if getattr(args, 'ep_mesh', None):
        if args.mesh:
            raise SystemExit('--ep_mesh is mutually exclusive with --mesh')
        sizes = common.parse_axis_sizes(
            args.ep_mesh, '--ep_mesh', (3,), '2,2,2 (fold,modality,data)')
        from ..parallel.modality import make_ep_mesh3

        try:
            ep_mesh = make_ep_mesh3(n_fold=sizes[0], n_modality=sizes[1],
                                    n_data=sizes[2])
        except ValueError as exc:
            raise SystemExit(f'--ep_mesh {args.ep_mesh}: {exc}')
    service = ScoringService(
        args.dataset_resourse, args.procedure, combine=args.combine,
        n_splits=args.n_splits, project_root=project_root, seed=args.seed,
        mesh=common.parse_infer_mesh(args.mesh), ep_mesh=ep_mesh)
    server = make_server(service, args.host, args.port, auth_token=token,
                         max_body_bytes=args.max_body_bytes)
    host, port = server.server_address[:2]
    if args.ready_file:
        Path(args.ready_file).write_text(f'{host}:{port}\n')
    print(f'serving {args.dataset_resourse}/{args.procedure} '
          f'({args.n_splits}-fold ensemble) on http://{host}:{port} '
          f'— POST /score, GET /healthz')
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return server


if __name__ == '__main__':
    run()
