"""Checkpoint structure-evolution tolerance.

Old checkpoints (e.g. the round-1 CurriculumState layout with
success_count/episode_count) must stay restorable after the state pytree
changes shape: Checkpointer.restore falls back to a raw restore grafted
onto the new template by key path (training/callbacks.py _graft_raw).
"""

import jax.numpy as jnp
import numpy as np
from flax import struct

from deep_rl_grasping_tpu.training.callbacks import Checkpointer, _graft_raw


@struct.dataclass
class _OldCurr:
    lam: jnp.ndarray
    success_count: jnp.ndarray
    episode_count: jnp.ndarray


@struct.dataclass
class _NewCurr:
    lam: jnp.ndarray
    ring: jnp.ndarray
    ptr: jnp.ndarray


def test_graft_matching_paths_and_defaults():
    raw = {
        "algo_state": {"w": np.arange(4.0).reshape(2, 2)},
        "curriculum": {"lam": np.float64(0.5), "success_count": np.int64(3),
                       "episode_count": np.int64(7)},
    }
    template = {
        "algo_state": {"w": jnp.zeros((2, 2), jnp.float32)},
        "curriculum": _NewCurr(
            lam=jnp.asarray(0.0, jnp.float32),
            ring=jnp.zeros(8, jnp.float32),
            ptr=jnp.asarray(0, jnp.int32),
        ),
    }
    out = _graft_raw(raw, template)
    np.testing.assert_allclose(np.asarray(out["algo_state"]["w"]),
                               raw["algo_state"]["w"])
    assert float(out["curriculum"].lam) == 0.5          # grafted
    assert out["curriculum"].ring.shape == (8,)          # template default
    assert int(out["curriculum"].ptr) == 0               # template default
    # dtype follows the template, not the checkpoint
    assert out["curriculum"].lam.dtype == jnp.float32


def test_graft_handles_tuples():
    raw = {"opt": [{"mu": np.ones(3)}, {"nu": np.full(3, 2.0)}]}
    template = {"opt": ({"mu": jnp.zeros(3)}, {"nu": jnp.zeros(3)})}
    out = _graft_raw(raw, template)
    np.testing.assert_allclose(np.asarray(out["opt"][0]["mu"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["opt"][1]["nu"]), 2.0)


def test_restore_old_layout_end_to_end(tmp_path):
    old_bundle = {
        "algo_state": {"w": np.ones((2, 2), np.float32)},
        "obs_rms": {"mean": np.zeros(3, np.float32)},
        "curriculum": _OldCurr(
            lam=jnp.asarray(0.75, jnp.float32),
            success_count=jnp.asarray(5, jnp.int32),
            episode_count=jnp.asarray(9, jnp.int32),
        ),
    }
    ck = Checkpointer(str(tmp_path))
    ck.save(1, old_bundle)
    ck.wait()

    new_template = {
        "algo_state": {"w": jnp.zeros((2, 2), jnp.float32)},
        "obs_rms": {"mean": jnp.ones(3, jnp.float32)},
        "curriculum": _NewCurr(
            lam=jnp.asarray(0.0, jnp.float32),
            ring=jnp.zeros(4, jnp.float32),
            ptr=jnp.asarray(0, jnp.int32),
        ),
    }
    out = Checkpointer(str(tmp_path)).restore(new_template)
    np.testing.assert_allclose(np.asarray(out["algo_state"]["w"]), 1.0)
    assert float(out["curriculum"].lam) == 0.75
    assert out["curriculum"].ring.shape == (4,)
