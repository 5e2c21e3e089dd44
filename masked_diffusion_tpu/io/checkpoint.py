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
    """
    from masked_diffusion_tpu.utils.host import is_main_process

    path = os.path.abspath(os.path.join(checkpoint_dir, f"checkpoint-epoch-{epoch}"))
    # exist_ok mkdir is idempotent and safe on a shared filesystem; the orbax
    # saves below are COLLECTIVE — every process must make these calls
    # (orbax coordinates the per-shard writes internally)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "unet"), params, force=True)
    if ema_params is not None:
        ckptr.save(os.path.join(path, "unet_ema"), ema_params, force=True)
    if opt_state is not None:
        ckptr.save(os.path.join(path, "optimizer"), opt_state, force=True)
    ckptr.wait_until_finished()
    if is_main_process():  # sidecar files: process 0 only (utils/host.py)
        meta = {"epoch": int(epoch), "global_step": int(global_step)}
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
            _prune_checkpoints(checkpoint_dir, keep_last)
    return path


def _prune_checkpoints(checkpoint_dir: str, keep_last: int) -> None:
    """Delete all but the newest keep_last checkpoint-* dirs (by epoch
    suffix). Runs on process 0 only, after the new checkpoint is fully
    written, so a crash mid-prune can only leave extra checkpoints behind."""
    import shutil

    cands = []
    for d in os.listdir(checkpoint_dir):
        m = _CKPT_RE.search(d)
        full = os.path.join(checkpoint_dir, d)
        if m and os.path.isdir(full):
            cands.append((int(m.group(1)), full))
    cands.sort()
    for _, stale in cands[:-keep_last]:
        shutil.rmtree(stale, ignore_errors=True)


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


def find_resume_checkpoint(output_dir: str, resume_from: str = "latest") -> Optional[str]:
    """Resolve --resume_from_checkpoint (main_train_masked.py:250-277):
    'latest' scans output_dir for checkpoint-* sorted by trailing int;
    otherwise the given path is used directly."""
    if resume_from not in ("latest", "True", True):
        return resume_from if os.path.isdir(str(resume_from)) else None
    if not os.path.isdir(output_dir):
        return None
    cands = []
    for d in os.listdir(output_dir):
        m = _CKPT_RE.search(d)
        if m and os.path.isdir(os.path.join(output_dir, d)):
            cands.append((int(m.group(1)), d))
    if not cands:
        return None
    cands.sort()
    return os.path.join(output_dir, cands[-1][1])
