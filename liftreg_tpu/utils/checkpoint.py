"""Checkpointing: {params, opt_state, epoch, global_step, schedule state}.

Same policy as the reference (``net_utils.py:198-235``,
``RegistrationNet.py:493-501,546-554``): periodic ``<prefix>_checkpoint``
saves plus ``model_best`` on the highest validation score; tolerant resume
(``net_utils.py:127-192``). Serialization is flax msgpack — a single file,
no torch pickles.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(state: dict, is_best: bool, save_path: str, prefix: str,
                    filename: str = "checkpoint"):
    """state: {'epoch', 'params', 'opt_state', 'global_step', 'lr_state'}."""
    os.makedirs(save_path, exist_ok=True)
    # to_state_dict flattens arbitrary pytrees (e.g. optax states) into
    # nested dicts that msgpack can serialize
    payload = serialization.msgpack_serialize(
        _to_numpy_tree(serialization.to_state_dict(state)), in_place=False)
    if is_best:
        out = os.path.join(save_path, "model_best.ckpt")
    else:
        out = os.path.join(save_path, "_".join([prefix, filename]) + ".ckpt")
    tmp = out + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, out)
    return out


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def resume_train(model_path: str, params_template=None):
    """Load a checkpoint for resuming; returns (start_epoch, global_step,
    state) or None if absent (mirrors ``resume_train``,
    ``net_utils.py:127-192``: missing file prints a warning, training starts
    fresh)."""
    if not os.path.isfile(model_path):
        print(f"=> no checkpoint found at '{model_path}'")
        return None
    print(f"=> loading checkpoint '{model_path}'")
    state = load_checkpoint(model_path)
    start_epoch = int(state.get("epoch", -1)) + 1
    global_step = state.get("global_step",
                            {p: 0 for p in ("train", "val", "debug", "test")})
    global_step = {k: int(v) for k, v in global_step.items()}
    if params_template is not None:
        # tolerant restore: keep template entries missing from the checkpoint
        try:
            state["params"] = serialization.from_state_dict(
                params_template, state["params"])
        except Exception as e:  # noqa: BLE001 — parity with strict=False
            def modules(tree):
                inner = tree.get("params", tree) if hasattr(tree, "get") \
                    else tree
                return set(inner.keys()) if hasattr(inner, "keys") else set()

            tpl_mods = modules(serialization.to_state_dict(params_template))
            ck_mods = modules(state["params"])
            missing = sorted(tpl_mods - ck_mods)
            unexpected = sorted(ck_mods - tpl_mods)
            if tpl_mods and len(tpl_mods & ck_mods) < len(tpl_mods) / 2:
                # a majority-mismatched tree is an architecture mismatch
                # (e.g. a checkpoint from a renamed module layout), not a
                # partially-extended model — failing loud beats training
                # silently from what is effectively a fresh init
                raise ValueError(
                    f"checkpoint '{model_path}' parameter tree does not "
                    f"match the model: checkpoint has {unexpected[:4]}..., "
                    f"model expects {missing[:4]}... ({e})") from e
            print("Warning !!! Error reading the whole model, loading the "
                  f"matching subset (missing from ckpt: {missing}; "
                  f"unexpected in ckpt: {unexpected}; {e})")
    return start_epoch, global_step, state
