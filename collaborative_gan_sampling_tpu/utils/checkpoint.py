"""Checkpoint / resume (C15, SURVEY.md section 5.4).

The reference uses ``tf.train.Saver`` and this is load-bearing: collaborative
sampling is *defined* as a post-training phase on a restored checkpoint
(every sampling mode in ``main_synthetic.py`` / ``celebA/model.py`` restores
a trained (G, D) before refining). The rebuild must support "train once,
refine many times with different (K, lambda, gamma)".

Implementation: flat msgpack via ``flax.serialization`` written atomically
(tmp file + rename), storing {G params, D params, both optimizer states,
step}. The PRNG needs no saving — keys are derived from (seed, step), so a
restored run regenerates identical streams (utils/prng.py).
"""

from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization


def _ckpt_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"ckpt_{step:08d}.msgpack")


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    keep: int = 3) -> str:
    """Atomically write `state` (any pytree) for `step`; prune old ckpts."""
    os.makedirs(ckpt_dir, exist_ok=True)
    state = serialization.to_state_dict(jax.device_get(state))
    path = _ckpt_path(ckpt_dir, step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(serialization.msgpack_serialize(state))
    os.replace(tmp, path)  # atomic on POSIX
    _prune(ckpt_dir, keep)
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(f for f in os.listdir(ckpt_dir)
                   if f.startswith("ckpt_") and f.endswith(".msgpack"))
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


def restore_checkpoint(path: str, target: Any | None = None) -> Any:
    """Restore a pytree. With `target`, result has target's exact types;
    without, returns the raw dict-of-arrays."""
    with open(path, "rb") as fh:
        raw = serialization.msgpack_restore(fh.read())
    if target is None:
        return raw
    return serialization.from_state_dict(target, raw)


def _prune(ckpt_dir: str, keep: int) -> None:
    ckpts = sorted(f for f in os.listdir(ckpt_dir)
                   if f.startswith("ckpt_") and f.endswith(".msgpack"))
    for f in ckpts[:-keep] if keep > 0 else []:
        os.remove(os.path.join(ckpt_dir, f))
