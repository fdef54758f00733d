"""Checkpoint save/restore for params + optimizer state + config.

The reference piggybacks on Lightning checkpoints in debug mode
(reference: src/segger/data/writer.py:286-292,
src/segger/debug/prediction.py:5-30).  segger-tpu checkpoints are a
plain ``.npz`` of the flattened parameter/optimizer pytrees plus a JSON
treedef + config — dependency-free and readable anywhere.  (Orbax is
available for sharded multi-host checkpoints; this single-host format is
what the debug/resume commands use.)
"""
from __future__ import annotations

import json
from dataclasses import asdict, is_dataclass
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax


def _flatten(tree) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(
    path,
    params,
    opt_state=None,
    config: Optional[Dict] = None,
    extra: Optional[Dict] = None,
) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {}
    meta: Dict[str, Any] = {"has_opt_state": opt_state is not None}

    p_leaves, p_def = _flatten(params)
    for i, leaf in enumerate(p_leaves):
        arrays[f"p_{i}"] = np.asarray(leaf)
    meta["params_treedef"] = str(p_def)
    meta["n_params"] = len(p_leaves)

    if opt_state is not None:
        o_leaves, o_def = _flatten(opt_state)
        for i, leaf in enumerate(o_leaves):
            arrays[f"o_{i}"] = np.asarray(leaf)
        meta["opt_treedef"] = str(o_def)
        meta["n_opt"] = len(o_leaves)

    if config is not None:
        if is_dataclass(config):
            config = asdict(config)
        meta["config"] = {
            k: v for k, v in config.items()
            if isinstance(v, (int, float, str, bool, type(None)))
        }
    if extra:
        meta["extra"] = extra

    np.savez_compressed(path, **arrays)
    path.with_suffix(".json").write_text(json.dumps(meta, indent=2))
    return path


def load_checkpoint(
    path, params_template, opt_state_template=None
) -> Tuple[Any, Any, Dict]:
    """Restore into the structure of the given templates (obtained by
    re-initializing the model with the checkpointed config)."""
    path = Path(path)
    data = np.load(path if path.suffix else path.with_suffix(".npz"))
    meta = json.loads(path.with_suffix(".json").read_text())

    p_leaves, p_def = _flatten(params_template)
    assert meta["n_params"] == len(p_leaves), (
        f"checkpoint has {meta['n_params']} param leaves, template has "
        f"{len(p_leaves)} — config mismatch?"
    )
    new_p = jax.tree_util.tree_unflatten(
        p_def, [data[f"p_{i}"] for i in range(meta["n_params"])]
    )
    new_o = None
    if meta.get("has_opt_state") and opt_state_template is not None:
        o_leaves, o_def = _flatten(opt_state_template)
        new_o = jax.tree_util.tree_unflatten(
            o_def, [data[f"o_{i}"] for i in range(meta["n_opt"])]
        )
    return new_p, new_o, meta
