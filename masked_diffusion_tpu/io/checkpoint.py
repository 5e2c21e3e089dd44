"""Orbax checkpoints with the reference's on-disk layout contract.

checkpoint-epoch-N/{unet, unet_ema, optimizer, meta.json} mirrors the custom
accelerate save hooks (main_train_masked.py:195-225: diffusers-style unet/ +
unet_ema/ subfolders) and the save cadence path
(trainer_masked_mean_shift.py:268-269). Resume scans output_dir for the
highest-numbered checkpoint-* exactly like resume_train
(main_train_masked.py:250-277).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"checkpoint-(?:epoch-)?(\d+)$")

# long-lived per-item checkpointers for async saves: StandardCheckpointer IS
# an orbax AsyncCheckpointer — save() returns after the device->host copy and
# the disk write runs in a background thread; one checkpointer per item name
# lets the three item writes of one checkpoint overlap, while each NEW save
# only waits for the same item's previous (long-finished by the next cadence)
# write. They must outlive the saves, hence module scope.
_ASYNC_CKPTRS: dict = {}


def wait_for_async_saves() -> None:
    """Block until every in-flight async checkpoint write has committed.
    Call before process exit (Trainer.train does, in its finally block) —
    an abandoned background write leaves a tmp dir the latest-scan skips."""
    for c in _ASYNC_CKPTRS.values():
        c.wait_until_finished()


def _checkpointer(item: str, async_save: bool):
    if not async_save:
        return ocp.StandardCheckpointer()
    if item not in _ASYNC_CKPTRS:
        _ASYNC_CKPTRS[item] = ocp.StandardCheckpointer()
    return _ASYNC_CKPTRS[item]


def save_checkpoint(
    checkpoint_dir: str,
    epoch: int,
    global_step: int,
    params: Any,
    ema_params: Optional[Any] = None,
    opt_state: Optional[Any] = None,
    extra_meta: Optional[dict] = None,
    history: Optional[dict] = None,
    keep_last: int = 0,
    async_save: bool = False,
) -> str:
    """Write checkpoint-epoch-{epoch}/ under checkpoint_dir.

    `history` (e.g. {'loss_mean_epoch': [...], 'lr_list': [...]}) lands in
    history.npz so a resumed run continues its loss/lr curves instead of
    restarting them — the analog of the lr-scheduler state accelerate's
    load_state restores (main_train_masked.py:195-225).

    `keep_last` > 0 prunes older checkpoint-* dirs after a successful save,
    keeping the newest N (by epoch suffix). Default 0 keeps everything — the
    reference's behavior (its cadence saves accumulate unboundedly,
    trainer_masked_mean_shift.py:268-269); the knob exists because a 50k-epoch
    workload otherwise writes thousands of ~GB checkpoints.

    `async_save` returns after the device->host copy and commits the ~GB
    disk writes in background threads (the reference blocks training for the
    whole accelerator.save_state). Orbax finalizes atomically (tmp dir +
    rename), `find_resume_checkpoint` skips uncommitted dirs, and
    `wait_for_async_saves()` drains in-flight writes before process exit.
    """
    from masked_diffusion_tpu.utils.host import is_main_process

    path = os.path.abspath(os.path.join(checkpoint_dir, f"checkpoint-epoch-{epoch}"))
    # exist_ok mkdir is idempotent and safe on a shared filesystem; the orbax
    # saves below are COLLECTIVE — every process must make these calls
    # (orbax coordinates the per-shard writes internally)
    os.makedirs(path, exist_ok=True)
    items = [("unet", params)]
    if ema_params is not None:
        items.append(("unet_ema", ema_params))
    if opt_state is not None:
        items.append(("optimizer", opt_state))
    if async_save:
        for sub, tree in items:
            _checkpointer(sub, True).save(os.path.join(path, sub), tree, force=True)
    else:
        ckptr = ocp.StandardCheckpointer()
        for sub, tree in items:
            ckptr.save(os.path.join(path, sub), tree, force=True)
        ckptr.wait_until_finished()
    if is_main_process():  # sidecar files: process 0 only (utils/host.py)
        # 'items' records which subdirs a COMPLETE checkpoint must contain —
        # is_complete_checkpoint verifies each is finalized, so a crash
        # between the unet commit and the (parallel) ema/optimizer commits
        # cannot produce a dir that resumes with silently-reset EMA/Adam state
        meta = {
            "epoch": int(epoch),
            "global_step": int(global_step),
            "items": [sub for sub, _ in items],
        }
        if extra_meta:
            meta.update(extra_meta)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        if history:
            np.savez(
                os.path.join(path, "history.npz"),
                **{k: np.asarray(v) for k, v in history.items()},
            )
        if keep_last and keep_last > 0:
            _prune_checkpoints(checkpoint_dir, keep_last, protect=path)
    return path


def _prune_checkpoints(
    checkpoint_dir: str, keep_last: int, protect: Optional[str] = None
) -> None:
    """Delete stale checkpoint-* dirs, retaining the newest keep_last
    COMPLETE checkpoints (by epoch suffix). Runs on process 0 only.

    Only complete checkpoints count toward (or are protected by) the quota:
    an async save's in-flight dir is never deleted but never displaces a
    committed checkpoint either — pruning a committed dir while the new one
    is still uncommitted would leave a crash window with ZERO resumable
    checkpoints. `protect` names the just-dispatched checkpoint EXPLICITLY
    (save_checkpoint passes its own path) — inferring it from the max epoch
    would rmtree the in-flight save whenever a previous run left
    higher-numbered dirs in the directory. Any other incomplete dir is
    crashed-save garbage (every pre-dispatch write has committed —
    AsyncCheckpointer.save waits for the same item's previous op) and is
    always deleted."""
    import shutil

    protect = os.path.abspath(protect) if protect else None
    complete, incomplete = [], []
    for d in os.listdir(checkpoint_dir):
        m = _CKPT_RE.search(d)
        full = os.path.abspath(os.path.join(checkpoint_dir, d))
        if m and os.path.isdir(full):
            (complete if is_complete_checkpoint(full) else incomplete).append(
                (int(m.group(1)), full)
            )
    complete.sort()
    stale = complete[:-keep_last]
    stale += incomplete
    for _, path in stale:
        if path == protect:
            continue
        shutil.rmtree(path, ignore_errors=True)


def load_checkpoint(
    path: str,
    params_template: Any,
    ema_template: Optional[Any] = None,
    opt_state_template: Optional[Any] = None,
) -> Tuple[Any, Optional[Any], Optional[Any], dict]:
    """Restore (params, ema_params, opt_state, meta) from a checkpoint dir.

    Templates provide shapes/dtypes/shardings for a typed restore; pass the
    freshly-initialized state's trees.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()

    def _restore(sub: str, template):
        p = os.path.join(path, sub)
        if template is None or not os.path.isdir(p):
            return None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(p, abstract)

    params = _restore("unet", params_template)
    ema = _restore("unet_ema", ema_template)
    opt_state = _restore("optimizer", opt_state_template)

    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    else:
        m = _CKPT_RE.search(os.path.basename(path))
        if m:
            meta = {"epoch": int(m.group(1)), "global_step": 0}
    hist_path = os.path.join(path, "history.npz")
    if os.path.exists(hist_path):
        with np.load(hist_path) as h:
            meta["history"] = {k: h[k].tolist() for k in h.files}
    return params, ema, opt_state, meta


def _item_finalized(path: str, sub: str) -> bool:
    d = os.path.join(path, sub)
    return os.path.isdir(d) and not ocp.utils.is_tmp_checkpoint(d)


def is_complete_checkpoint(path: str) -> bool:
    """True when every item save of this checkpoint has COMMITTED (orbax
    writes each item to a tmp dir and renames atomically on finalize).

    The item list comes from meta.json's 'items' (written at dispatch), so a
    crash between the unet commit and the parallel unet_ema/optimizer
    commits is detected — accepting such a dir would resume with silently
    re-initialized EMA/Adam state. Fallback when meta.json predates 'items'
    or was never written: unet/ finalized and no orbax tmp dirs anywhere in
    the checkpoint."""
    meta_path = os.path.join(path, "meta.json")
    items = None
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                items = json.load(f).get("items")
        except (OSError, ValueError):
            return False  # truncated meta: mid-crash artifact
    if items:
        return all(_item_finalized(path, sub) for sub in items)
    if not _item_finalized(path, "unet"):
        return False
    try:
        entries = os.listdir(path)
    except OSError:
        return False
    return not any(ocp.utils.TMP_DIR_SUFFIX in e for e in entries)


def find_resume_checkpoint(output_dir: str, resume_from: str = "latest") -> Optional[str]:
    """Resolve --resume_from_checkpoint (main_train_masked.py:250-277):
    'latest' scans output_dir for checkpoint-* sorted by trailing int,
    skipping incomplete (crashed / still-writing) checkpoints; otherwise the
    given path is used directly."""
    if resume_from not in ("latest", "True", True):
        return resume_from if os.path.isdir(str(resume_from)) else None
    if not os.path.isdir(output_dir):
        return None
    cands = []
    for d in os.listdir(output_dir):
        m = _CKPT_RE.search(d)
        full = os.path.join(output_dir, d)
        if m and os.path.isdir(full) and is_complete_checkpoint(full):
            cands.append((int(m.group(1)), d))
    if not cands:
        return None
    cands.sort()
    return os.path.join(output_dir, cands[-1][1])
