"""Per-fold checkpointing.

The reference pickles whole torch modules per fold
(multimodal_kfold_train_cvae_supervised.py:211-212, ``cVAE_model.pkl``) and
re-loads them in the test scripts. Here checkpoints are msgpack parameter
pytrees plus a JSON model config (enough to rebuild the model), written to the
same per-fold directory layout ``outputs/kfold_analysis/supervised_cvae/<fold>/``
under the name ``cVAE_model.ckpt`` / ``cVAE_model.json``.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(directory, params, model_config: dict,
                    name: str = "cVAE_model",
                    backend: str = "msgpack") -> Path:
    """backend 'msgpack' (single-file flax.serialization blob, default) or
    'orbax' (ocp.StandardCheckpointer directory)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    params = jax.tree_util.tree_map(np.asarray, params)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        target = (directory / f"{name}.orbax").resolve()
        if target.exists():
            import shutil

            shutil.rmtree(target)
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(target, params)
        checkpointer.wait_until_finished()
        out = target
    else:
        import os

        # Each file is individually atomic (tmp + os.replace): a kill can
        # never leave a truncated json or blob. First creation is also
        # pair-consistent (consumers gate on the .ckpt, written last). A
        # RE-save over an existing checkpoint still has a window between
        # the two replaces where new json sits beside the old blob — two
        # files cannot be swapped atomically on POSIX — so load_checkpoint
        # turns the resulting restore mismatch into an actionable error.
        jtmp = directory / f".{name}.json.{os.getpid()}.tmp"
        jtmp.write_text(json.dumps(model_config, indent=1))
        os.replace(jtmp, directory / f"{name}.json")
        blob = serialization.to_bytes(params)
        tmp = directory / f".{name}.ckpt.{os.getpid()}.tmp"
        tmp.write_bytes(blob)
        os.replace(tmp, directory / f"{name}.ckpt")
        return directory / f"{name}.ckpt"
    with open(directory / f"{name}.json", "w") as f:
        json.dump(model_config, f, indent=1)
    return out


def load_checkpoint(directory, template_params=None,
                    name: str = "cVAE_model") -> Tuple[dict, dict]:
    """Returns (params, model_config). ``template_params`` (a pytree with the
    right structure) restores exact types; if omitted, the stored raw
    structure is returned. Detects the backend from what's on disk."""
    directory = Path(directory)
    with open(directory / f"{name}.json") as f:
        config = json.load(f)
    orbax_dir = directory / f"{name}.orbax"
    if orbax_dir.exists():
        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        if template_params is not None:
            import jax.numpy as jnp

            abstract = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype),
                template_params)
            params = checkpointer.restore(orbax_dir.resolve(), abstract)
        else:
            params = checkpointer.restore(orbax_dir.resolve())
        return params, config
    blob = (directory / f"{name}.ckpt").read_bytes()

    def mismatch_error(detail):
        return ValueError(
            f"checkpoint blob {directory / f'{name}.ckpt'} does not match "
            f"its {name}.json config (likely a save killed between the "
            "config and blob writes, or a re-train with a different "
            "architecture that died mid-save): delete the directory and "
            f"retrain. Underlying error: {detail}")

    try:
        if template_params is not None:
            params = serialization.from_bytes(template_params, blob)
        else:
            params = serialization.msgpack_restore(blob)
    except Exception as e:
        raise mismatch_error(e) from e
    if template_params is not None:
        # from_bytes restores by key structure without validating leaf
        # shapes — a torn json/blob pair would otherwise surface later as
        # a cryptic dot-shape error inside the jitted program
        bad = []
        jax.tree_util.tree_map(
            lambda t, p: bad.append((np.shape(t), np.shape(p)))
            if np.shape(t) != np.shape(p) else None,
            template_params, params)
        if bad:
            raise mismatch_error(
                f"leaf shape mismatches (template vs stored): {bad[:4]}")
    return params, config


def checkpoint_exists(directory, name: str = "cVAE_model") -> bool:
    directory = Path(directory)
    return ((directory / f"{name}.ckpt").exists()
            or (directory / f"{name}.orbax").exists())


# ---- mid-run train state (params + optimizer state + PRNG + epoch cursor) ----
# Beyond reference parity (the reference pickles params only, train:211-212):
# on this framework cold compiles cost 60-350 s through the remote-compile
# tunnel, so a killed sweep must be resumable. The epoch cursor, loss history
# and tensors are serialized into ONE blob written atomically (tmp +
# os.replace), so a kill at any instant leaves a fully-consistent previous
# state — cursor and tensors can never disagree.

def save_train_state(directory, params, opt_state, key, epoch: int,
                     logs=None, name: str = "train_state",
                     meta: "dict | None" = None) -> Path:
    """``meta`` (flat str->str dict) fingerprints the numeric trajectory
    family (loss variant, precision) so a resume under DIFFERENT numerics
    is refused instead of silently continuing a hybrid trajectory (see
    run_chunked)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    # meta rides as a uint8 JSON blob: flax/msgpack serialize ndarray
    # leaves, not python/numpy strings
    meta_arr = np.frombuffer(
        json.dumps({str(k): str(v) for k, v in (meta or {}).items()},
                   sort_keys=True).encode(), dtype=np.uint8).copy()
    host = jax.tree_util.tree_map(
        np.asarray, {"params": params, "opt_state": opt_state, "key": key,
                     "epoch": np.int64(epoch),
                     "meta": meta_arr,
                     "logs": dict(logs) if logs is not None else {}})
    blob = serialization.to_bytes(host)
    import os

    # pid-suffixed tmp: in a multi-process mesh every process checkpoints
    # the same (all-gathered) state to the same path — last replace wins
    tmp = directory / f".{name}.ckpt.{os.getpid()}.tmp"
    tmp.write_bytes(blob)
    os.replace(tmp, directory / f"{name}.ckpt")
    # informational sidecar only (the cursor of record lives in the blob)
    (directory / f"{name}.json").write_text(
        json.dumps({"epoch": int(epoch)}))
    return directory / f"{name}.ckpt"


def load_train_state(directory, template: dict, name: str = "train_state"):
    """Returns ({'params','opt_state','key'}, epoch, logs-or-None).
    ``template`` must hold same-structure 'params'/'opt_state'/'key'."""
    directory = Path(directory)
    blob = (directory / f"{name}.ckpt").read_bytes()
    # logs length varies with the epoch cursor -> restore it untyped
    raw = serialization.msgpack_restore(blob)
    state = serialization.from_state_dict(
        {"params": template["params"], "opt_state": template["opt_state"],
         "key": template["key"]},
        {k: raw[k] for k in ("params", "opt_state", "key")})
    epoch = int(np.asarray(raw["epoch"]))
    logs = raw.get("logs") or None
    return state, epoch, logs


def peek_train_meta(directory, name: str = "train_state"):
    """The stored trajectory fingerprint, or None for pre-meta / untagged
    states."""
    blob = (Path(directory) / f"{name}.ckpt").read_bytes()
    raw = serialization.msgpack_restore(blob)
    meta = raw.get("meta")
    if meta is None:
        return None
    decoded = json.loads(bytes(np.asarray(meta, dtype=np.uint8)).decode())
    return decoded or None


def train_state_exists(directory, name: str = "train_state") -> bool:
    return (Path(directory) / f"{name}.ckpt").exists()


def run_chunked(state_dir, total_epochs: int, checkpoint_every: int,
                resume: bool, params, opt_state, key, run_chunk,
                template_fn, logs_concat_axis: int = 0,
                meta: "dict | None" = None):
    """Shared chunked-training loop behind FoldTrainer.run_resumable and
    MultiFoldTrainer.run_resumable: resume from disk if present, run
    ``run_chunk(n, params, opt_state, key) -> (params, opt_state, key,
    logs)`` until ``total_epochs``, checkpointing atomically after every
    chunk. ``template_fn()`` builds the typed restore template lazily;
    ``opt_state`` may be None (initialized by the caller's template).

    ``meta`` fingerprints the run's numeric trajectory family (loss
    variant, precision — trainer.loss_fingerprint): a resume whose
    fingerprint differs from the stored state's is REFUSED, because
    continuing under different numerics would produce a hybrid trajectory
    matching neither an uninterrupted old-config run nor a fresh
    new-config one (e.g. resuming a pre-fused-heads checkpoint under the
    merged-head default, or dropping --no_fused_heads on the resume
    invocation). Pre-meta states (older builds) skip the check."""
    if checkpoint_every <= 0:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}")
    start, logs_acc = 0, None
    if resume and train_state_exists(state_dir):
        stored_meta = peek_train_meta(state_dir)
        loss_name = str((meta or {}).get("loss", ""))
        if meta and stored_meta is None and (
                loss_name == "fused_heads_loss_fn"
                or loss_name.startswith("packed")):
            # pre-fingerprint (round-2/3-era) states were written under
            # older default numerics (the two-matmul encoder heads; the
            # packed layouts additionally merged their heads in round 4),
            # so this is exactly the migration case the fingerprint guard
            # cannot check — warn loudly instead of silently continuing a
            # possibly-hybrid trajectory
            fix = ("pass --no_fused_heads to match it"
                   if loss_name == "fused_heads_loss_fn"
                   else "re-train (the packed encoder-head program "
                        "changed in round 4)")
            print(
                f"WARNING: {state_dir} holds a train state from a build "
                "without trajectory fingerprints, and this run's default "
                f"numerics ({loss_name}) postdate those builds. If the "
                f"original run used the older loss form, resuming now "
                f"mixes numerics — {fix}, or delete the state directory "
                "to restart under the current default.")
        if meta and stored_meta and stored_meta != {
                str(k): str(v) for k, v in meta.items()}:
            raise ValueError(
                f"refusing to resume {state_dir}: the stored train state "
                f"was written under {stored_meta}, but this run is "
                f"configured as { {str(k): str(v) for k, v in meta.items()} }"
                " — a mixed-numerics trajectory would match neither "
                "config. Re-launch with the original flags (e.g. "
                "--no_fused_heads / --precision) or delete the state to "
                "restart fresh.")
        template = template_fn()
        state, start, logs_acc = load_train_state(state_dir, template)
        params, opt_state, key = (state["params"], state["opt_state"],
                                  state["key"])
    while start < total_epochs:
        n = min(checkpoint_every, total_epochs - start)
        params, opt_state, key, logs = run_chunk(n, params, opt_state, key)
        host_logs = jax.tree_util.tree_map(np.asarray, _to_host(logs))
        logs_acc = host_logs if logs_acc is None else {
            k: np.concatenate([logs_acc[k], host_logs[k]],
                              axis=logs_concat_axis)
            for k in host_logs
        }
        start += n
        save_train_state(state_dir, _to_host(params),
                         _to_host(opt_state), _to_host(key),
                         start, logs_acc, meta=meta)
    return params, (logs_acc if logs_acc is not None else {})


def _to_host(tree):
    """device_get that also handles multi-process global arrays: a leaf
    sharded across processes is not fully addressable, so plain device_get
    raises — all-gather it first (every process then checkpoints the same
    full state, matching the single-process file contents)."""
    def fetch(leaf):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(leaf, tiled=True))
        return jax.device_get(leaf)

    return jax.tree_util.tree_map(fetch, tree)
