"""Checkpointing with the reference's logical payload and selection rules.

Payload parity: /root/reference/main/train.py:57-64 — model params,
optimizer state, epoch, train-loss history, test-error history. File
semantics parity: /root/reference/lib/funcs_utils.py:111-128 —
``checkpoint{epoch}`` every epoch, ``best`` on best joint error, ``final``
at the last epoch; loading can ``pick_best``.

Uses orbax-free msgpack serialization via flax (no global registry, safe
for cross-host restore); arrays land on host then are device-put by the
caller with the desired sharding.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, epoch: int, end_epoch: int,
                    payload: dict, is_best: bool | None = None) -> str:
    """Write one epoch's checkpoint (+ best/final aliases)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = dict(payload)
    payload["epoch"] = epoch
    host = _to_host(payload)
    blob = pickle.dumps(
        {k: (serialization.to_bytes(v) if k in ("params", "opt_state")
             else v)
         for k, v in host.items()}
    )
    name = "final.ckpt" if epoch == end_epoch else f"checkpoint{epoch}.ckpt"
    path = os.path.join(ckpt_dir, name)
    with open(path, "wb") as f:
        f.write(blob)
    if is_best:
        with open(os.path.join(ckpt_dir, "best.ckpt"), "wb") as f:
            f.write(blob)
    return path


def _latest_numbered(ckpt_dir: str) -> str | None:
    """Highest-EPOCH ``checkpoint{N}.ckpt`` (numeric, not lexicographic —
    a string sort resumes 'checkpoint9' over 'checkpoint12')."""
    best_n, best_f = -1, None
    for f in os.listdir(ckpt_dir):
        m = re.fullmatch(r"checkpoint(\d+)\.ckpt", f)
        if m and int(m.group(1)) > best_n:
            best_n, best_f = int(m.group(1)), f
    return best_f


def load_checkpoint(path: str, params_template: Any = None,
                    opt_state_template: Any = None,
                    prefer: str = "best") -> dict:
    """Load a checkpoint. For a DIRECTORY, ``prefer`` picks the candidate
    order: ``"best"`` (evaluation/demo: best → final → latest epoch) or
    ``"latest"`` (resume: final → latest epoch → best — resuming from
    best.ckpt would silently rewind completed epochs)."""
    if os.path.isdir(path):
        order = (("best.ckpt", "final.ckpt") if prefer == "best"
                 else ("final.ckpt",))
        for cand in order:
            p = os.path.join(path, cand)
            if os.path.isfile(p):
                path = p
                break
        else:
            latest = _latest_numbered(path)
            if latest is None and prefer == "latest" and os.path.isfile(
                    os.path.join(path, "best.ckpt")):
                latest = "best.ckpt"
            if latest is None:
                raise FileNotFoundError(f"no checkpoint in {path}")
            path = os.path.join(path, latest)
    with open(path, "rb") as f:
        raw = pickle.loads(f.read())
    out = dict(raw)
    if params_template is not None and "params" in raw:
        out["params"] = serialization.from_bytes(
            params_template, raw["params"])
    if opt_state_template is not None and "opt_state" in raw:
        out["opt_state"] = serialization.from_bytes(
            opt_state_template, raw["opt_state"])
    return out
