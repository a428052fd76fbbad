"""Logging, checkpointing, and evaluation cadence.

Replaces the reference's callback stack (training/base_callbacks.py +
sb_helper.py wiring):

* `MonitorLogger`     — episode CSV (r, l, t, s columns) equivalent to
                        sb's Monitor + the fork's success column
                        (trained_models/*/log_file.monitor.csv). Batched:
                        one aggregate row per logging interval. Uses the
                        native C++ async writer when built (runtime/), else
                        buffered Python IO.
* `CurriculumLogger`  — curriculum_steps.csv (curriculum.py:51-54).
* `Checkpointer`      — Orbax snapshots of the full LoopState every
                        `checkpoint_freq` frames (CheckpointCallback,
                        sb_helper.py:81-82) + best-model tracking
                        (EvalCallback, base_callbacks.py:107-115).
* `TrainingTimer`     — rolling steps/s (TrainingTimeCallback,
                        base_callbacks.py:153-246).
"""

from __future__ import annotations

import csv
import json
import os
import time

import jax
import numpy as np

try:
    from deep_rl_grasping_tpu.runtime.native import AsyncCsvWriter
except Exception:  # pragma: no cover - native lib not built
    AsyncCsvWriter = None


class MonitorLogger:
    """Episode stats CSV in the reference Monitor format: one row PER
    EPISODE (r, l, t, s — the fork's success column included), drained from
    the device-side episode ring each host iteration. `log` remains for
    aggregate rows (single-row-per-flush callers)."""

    def __init__(self, model_dir, filename="log_file.monitor.csv"):
        os.makedirs(model_dir, exist_ok=True)
        path = os.path.join(model_dir, filename)
        self._t0 = time.time()
        header_meta = json.dumps({"t_start": self._t0, "env_id": "gripper-env-v0"})
        if AsyncCsvWriter is not None:
            self._writer = AsyncCsvWriter(path, f"#{header_meta}\nr,l,t,s\n")
            self._file = None
        else:
            self._file = open(path, "w", newline="")
            self._file.write(f"#{header_meta}\n")
            self._csv = csv.writer(self._file)
            self._csv.writerow(["r", "l", "t", "s"])
            self._writer = None

    def log(self, mean_return, mean_length, success_rate):
        t = time.time() - self._t0
        if self._writer is not None:
            self._writer.write(
                f"{mean_return:.2f},{mean_length:.1f},{t:.1f},{success_rate:.4f}\n"
            )
        else:
            self._csv.writerow(
                [f"{mean_return:.2f}", f"{mean_length:.1f}", f"{t:.1f}", f"{success_rate:.4f}"]
            )
            self._file.flush()

    def log_episodes(self, rows):
        """Write one CSV row per episode. rows: (N, 3) array-like of
        (return, length, success)."""
        t = time.time() - self._t0
        lines = "".join(
            f"{r:.2f},{l:.0f},{t:.1f},{s:.0f}\n" for r, l, s in rows
        )
        if not lines:
            return
        if self._writer is not None:
            self._writer.write(lines)
        else:
            self._file.write(lines)
            self._file.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
        elif self._file is not None:
            self._file.close()


class ScalarLogger:
    """logs.csv-style training diagnostics (losses, sr, lambda)."""

    def __init__(self, model_dir, filename="logs.csv"):
        os.makedirs(model_dir, exist_ok=True)
        self._path = os.path.join(model_dir, filename)
        self._file = None
        self._fields = None

    def log(self, step, scalars):
        row = {"step": int(step), **{k: float(v) for k, v in scalars.items()}}
        if self._file is None:
            self._fields = list(row)
            self._file = open(self._path, "w", newline="")
            self._csv = csv.DictWriter(self._file, fieldnames=self._fields)
            self._csv.writeheader()
        self._csv.writerow({k: row.get(k, "") for k in self._fields})
        self._file.flush()

    def close(self):
        if self._file:
            self._file.close()


class CurriculumLogger:
    """curriculum_steps.csv (curriculum.py:51-54)."""

    def __init__(self, model_dir):
        os.makedirs(model_dir, exist_ok=True)
        self._path = os.path.join(model_dir, "curriculum_steps.csv")
        self._last_iteration = 0

    def log(self, policy_iteration, lam):
        policy_iteration = int(policy_iteration)
        if policy_iteration != self._last_iteration:
            with open(self._path, "a") as f:
                f.write(f"{policy_iteration} {float(lam):.6f}\n")
            self._last_iteration = policy_iteration


def _raw_lookup(raw, path):
    """Walk a raw orbax restore (nested dicts/lists) along a pytree key
    path from the live template (dict keys, struct attrs, sequence ids)."""
    node = raw
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", None)
        if name is None:
            name = getattr(k, "idx", None)
        if isinstance(node, (list, tuple)):
            node = node[int(name)]
        elif isinstance(node, dict):
            if name in node:
                node = node[name]
            elif str(name) in node:
                node = node[str(name)]
            else:
                raise KeyError(str(name))
        else:
            raise KeyError(str(name))
    return node


def _graft_raw(raw, template):
    """Graft a raw orbax restore onto `template` by key path.

    Paths missing from the checkpoint, or whose stored leaf has a different
    shape than the template (e.g. an obs ring from an older layout), keep
    the template default — and every such fallback is logged so a partially
    initialized restore is loud, not silent."""
    import logging

    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    fell_back = []
    for path, leaf in leaves:
        try:
            val = _raw_lookup(raw, path)
            if hasattr(leaf, "dtype"):
                val = jnp.asarray(val, dtype=leaf.dtype)
            if hasattr(leaf, "shape") and hasattr(val, "shape") \
                    and tuple(val.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape {tuple(val.shape)} != template {tuple(leaf.shape)}"
                )
            out.append(val)
        except (KeyError, IndexError, TypeError, ValueError) as e:
            fell_back.append(f"{jax.tree_util.keystr(path)}: {e}")
            out.append(leaf)
    if fell_back:
        logging.warning(
            "checkpoint graft kept template defaults for %d path(s):\n  %s",
            len(fell_back), "\n  ".join(fell_back),
        )
    return jax.tree_util.tree_unflatten(treedef, out)


class Checkpointer:
    """Orbax checkpoints of arbitrary pytrees + best-model tracking."""

    def __init__(self, model_dir, max_to_keep=3):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(os.path.join(model_dir, "logs"))
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )
        self._best_dir = os.path.abspath(os.path.join(model_dir, "best_model"))
        os.makedirs(self._best_dir, exist_ok=True)
        self._best_mgr = ocp.CheckpointManager(
            self._best_dir, options=ocp.CheckpointManagerOptions(max_to_keep=1)
        )
        self.best_metric = -np.inf

    def save(self, step, tree):
        import orbax.checkpoint as ocp

        self._mgr.save(int(step), args=ocp.args.StandardSave(tree))

    def save_best(self, step, tree, metric):
        import orbax.checkpoint as ocp

        if metric > self.best_metric:
            self.best_metric = float(metric)
            self._best_mgr.save(int(step), args=ocp.args.StandardSave(tree))
            return True
        return False

    def restore(self, tree, step=None):
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step() if step is None else int(step)
        try:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(tree))
        except (ValueError, KeyError, TypeError) as e:
            # Structure-evolution fallback: checkpoints written by older
            # code (e.g. a different CurriculumState layout) fail the exact
            # StandardRestore match. Restore the raw nested-dict tree and
            # graft values onto the template by key path, keeping template
            # defaults for paths the checkpoint doesn't have (each kept
            # default is logged by _graft_raw). IO/corruption errors are
            # NOT caught — a truly unreadable checkpoint must fail loudly.
            import logging

            logging.warning("StandardRestore failed (%s); grafting raw restore", e)
            raw = self._mgr.restore(step)
            return _graft_raw(raw, tree)

    def restore_best(self, tree):
        """Restore the best-eval bundle (saved by save_best)."""
        import orbax.checkpoint as ocp

        step = self._best_mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no best-model checkpoint under {self._best_dir}"
            )
        try:
            return self._best_mgr.restore(step, args=ocp.args.StandardRestore(tree))
        except (ValueError, KeyError, TypeError) as e:
            import logging

            logging.warning("best StandardRestore failed (%s); grafting", e)
            return _graft_raw(self._best_mgr.restore(step), tree)

    def restore_raw(self, step=None):
        step = self._mgr.latest_step() if step is None else int(step)
        return self._mgr.restore(step)

    def latest_step(self):
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()
        self._best_mgr.wait_until_finished()


class RingCheckpointer:
    """Replay-ring snapshots (separate from the learner Checkpointer).

    The learner bundle stays small and frequent; the ring payload is
    ~rows x 16 KB and is written on its own (sparser) cadence plus on
    SIGTERM, under <model_dir>/ring. One snapshot is kept — the newest-K
    window supersedes any older one by construction (see replay.snapshot).
    """

    def __init__(self, model_dir):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(os.path.join(model_dir, "ring"))
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir, options=ocp.CheckpointManagerOptions(max_to_keep=1)
        )

    def save(self, step, snap):
        import orbax.checkpoint as ocp

        self._mgr.save(int(step), args=ocp.args.StandardSave(snap))

    def restore_raw(self):
        """Latest snapshot as a raw dict, or None when absent."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step)

    def wait(self):
        self._mgr.wait_until_finished()


class TrainingTimer:
    """Rolling env-frames/s + update/s (TrainingTimeCallback equivalent)."""

    def __init__(self, window=20):
        self._t = None
        self._history = []
        self._window = window

    def tick(self, frames):
        now = time.perf_counter()
        if self._t is not None:
            dt = now - self._t
            self._history.append(frames / max(dt, 1e-9))
            self._history = self._history[-self._window:]
        self._t = now

    @property
    def steps_per_s(self):
        return float(np.mean(self._history)) if self._history else 0.0
