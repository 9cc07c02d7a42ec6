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

import hashlib
import json
import os
from typing import Any

import jax
from flax import serialization


class ConfigMismatchError(ValueError):
    """Restoring a checkpoint whose saved config disagrees with the caller's.

    Without this gate, a mismatched architecture surfaces as an opaque flax
    state-dict shape error deep inside ``from_state_dict``."""


def _ckpt_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"ckpt_{step:08d}.msgpack")


def _config_dict(config: Any) -> dict:
    return config if isinstance(config, dict) else config.to_dict()


def _config_hash(cfg_dict: dict) -> str:
    blob = json.dumps(cfg_dict, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    keep: int = 3, config: Any | None = None) -> str:
    """Atomically write `state` (any pytree) for `step`; prune old ckpts.

    With `config` (a Config or plain dict), a ``config.json`` sidecar with a
    content hash is written beside the checkpoints so restores can detect
    architecture mismatches with a clear error (SURVEY.md section 5.4)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    state = serialization.to_state_dict(jax.device_get(state))
    path = _ckpt_path(ckpt_dir, step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(serialization.msgpack_serialize(state))
    os.replace(tmp, path)  # atomic on POSIX
    if config is not None:
        cfg = _config_dict(config)
        side = os.path.join(ckpt_dir, "config.json")
        tmp = side + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"config": cfg, "hash": _config_hash(cfg)}, fh,
                      indent=2, sort_keys=True)
        os.replace(tmp, side)
    _prune(ckpt_dir, keep)
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(f for f in os.listdir(ckpt_dir)
                   if f.startswith("ckpt_") and f.endswith(".msgpack"))
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


def restore_checkpoint(path: str, target: Any | None = None,
                       config: Any | None = None) -> Any:
    """Restore a pytree. With `target`, result has target's exact types;
    without, returns the raw dict-of-arrays.

    With `config`, the checkpoint dir's ``config.json`` sidecar (if present)
    is checked: a differing ``model`` section raises ConfigMismatchError
    naming the offending fields instead of an opaque flax shape error."""
    if config is not None:
        _check_config(os.path.dirname(os.path.abspath(path)), config)
    with open(path, "rb") as fh:
        raw = serialization.msgpack_restore(fh.read())
    if target is None:
        return raw
    # Forward compatibility for optional state fields: a checkpoint written
    # before a None-defaulted field existed (e.g. TrainState.g_ema) restores
    # into the new structure by filling the missing key with the target's
    # None. Only None-valued target fields are filled — a missing key whose
    # target holds real arrays still errors (that's data loss, not an
    # optional feature).
    tgt_sd = serialization.to_state_dict(target)
    if isinstance(raw, dict) and isinstance(tgt_sd, dict):
        for k, v in tgt_sd.items():
            if k not in raw and v is None:
                raw[k] = None
    return serialization.from_state_dict(target, raw)


def saved_config(ckpt_dir: str) -> dict | None:
    """The config dict stored beside the checkpoints, or None. The sidecar's
    content hash is verified on read — a hand-edited or corrupted sidecar
    fails loudly rather than silently gating restores on stale content."""
    side = os.path.join(ckpt_dir, "config.json")
    if not os.path.exists(side):
        return None
    with open(side) as fh:
        data = json.load(fh)
    cfg = data["config"]
    want = data.get("hash")
    if want is not None and _config_hash(cfg) != want:
        raise ConfigMismatchError(
            f"{side} is corrupted or was edited by hand (content hash "
            f"mismatch); delete it or restore the original sidecar")
    return cfg


def _check_config(ckpt_dir: str, config: Any) -> None:
    saved = saved_config(ckpt_dir)
    if saved is None:
        return
    current = _config_dict(config)
    saved_model = saved.get("model", saved)
    cur_model = current.get("model", current)
    diffs = sorted(
        k for k in set(saved_model) | set(cur_model)
        if saved_model.get(k) != cur_model.get(k))
    if diffs:
        detail = ", ".join(
            f"{k}: saved={saved_model.get(k)!r} vs current={cur_model.get(k)!r}"
            for k in diffs)
        raise ConfigMismatchError(
            f"checkpoint in {ckpt_dir} was written with a different model "
            f"config ({detail}); restore with the matching config or delete "
            f"the checkpoint dir")


def _prune(ckpt_dir: str, keep: int) -> None:
    ckpts = sorted(f for f in os.listdir(ckpt_dir)
                   if f.startswith("ckpt_") and f.endswith(".msgpack"))
    for f in ckpts[:-keep] if keep > 0 else []:
        os.remove(os.path.join(ckpt_dir, f))
