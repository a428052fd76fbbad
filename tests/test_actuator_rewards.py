"""Pure-function unit tests: action decoding tables and reward math
(the reference has no unit tests for these — SURVEY.md §4 implication)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deep_rl_grasping_tpu.envs import actuator as act
from deep_rl_grasping_tpu.envs import curriculum as curr
from deep_rl_grasping_tpu.envs import rewards as rew


def _spec(simplified=False, discrete=False, pads=3):
    return act.ActuatorSpec(
        simplified=simplified, discrete=discrete,
        max_translation=0.03, max_yaw_rotation=0.15,
        discrete_step=0.01, yaw_step=0.1, num_actions_pad=pads,
        include_robot_height=False,
    )


class TestActuator:
    def test_continuous_full_denormalization(self):
        spec = _spec()
        t, yaw, cmd = act.decode_action(
            spec, jnp.array([1.0, -1.0, 0.5, 1.0, 0.0]), jnp.asarray(False)
        )
        # norm-clipped to max_translation (actuator.py:91-98)
        assert float(jnp.linalg.norm(t)) <= 0.03 + 1e-6
        assert float(yaw) == pytest.approx(0.15)
        assert int(cmd) == act.CMD_MOVE

    def test_continuous_open_close_latch(self):
        spec = _spec()
        # close request while open -> CLOSE
        _, _, cmd = act.decode_action(
            spec, jnp.array([0, 0, 0, 0, -1.0]), jnp.asarray(False)
        )
        assert int(cmd) == act.CMD_CLOSE
        # close request while closed -> MOVE (actuator.py:116-123)
        _, _, cmd = act.decode_action(
            spec, jnp.array([0, 0, 0, 0, -1.0]), jnp.asarray(True)
        )
        assert int(cmd) == act.CMD_MOVE
        # open request while closed -> OPEN
        _, _, cmd = act.decode_action(
            spec, jnp.array([0, 0, 0, 0, 1.0]), jnp.asarray(True)
        )
        assert int(cmd) == act.CMD_OPEN

    def test_full_discrete_table(self):
        spec = _spec(discrete=True)
        # action 1: +x by step_size (actuator.py:106-115)
        t, yaw, cmd = act.decode_action(spec, 1, jnp.asarray(False))
        np.testing.assert_allclose(np.asarray(t), [0.01, 0, 0], atol=1e-7)
        # action 8: -yaw
        t, yaw, cmd = act.decode_action(spec, 8, jnp.asarray(False))
        assert float(yaw) == pytest.approx(-0.1)
        # action 10: close
        _, _, cmd = act.decode_action(spec, 10, jnp.asarray(False))
        assert int(cmd) == act.CMD_CLOSE

    def test_simplified_discrete_bins(self):
        spec = _spec(simplified=True, discrete=True, pads=3)
        # branch 0 (x): bins 0,1,2 -> -mt, 0, +mt (actuator.py:126-147)
        for a, expect in [(0, -0.03), (1, 0.0), (2, 0.03)]:
            t, yaw, _ = act.decode_action(spec, a, jnp.asarray(False))
            assert float(t[0]) == pytest.approx(expect, abs=1e-6)
            assert float(t[2]) == pytest.approx(0.005)  # auto-descend
        # branch 2 (yaw): bin 5 -> 0 wait, action 8 = branch2 bin2 -> +max_yaw
        t, yaw, _ = act.decode_action(spec, 8, jnp.asarray(False))
        assert float(yaw) == pytest.approx(0.15, abs=1e-6)

    def test_branched_decoding(self):
        spec = _spec(simplified=True, pads=5)
        t, yaw, cmd = act.decode_branched_action(spec, jnp.array([0, 4, 2]))
        assert float(t[0]) == pytest.approx(-0.03)
        assert float(t[1]) == pytest.approx(0.03)
        assert float(yaw) == pytest.approx(0.0)
        assert float(t[2]) == pytest.approx(0.005)

    def test_actuator_obs_scaling(self):
        spec = _spec()
        obs = act.actuator_obs(spec, jnp.asarray(0.05), jnp.asarray(0.2))
        assert float(obs[0]) == pytest.approx(0.5)  # width/0.1


class TestRewards:
    SPEC = rew.RewardSpec(
        custom=False, shaped=True, terminal_reward=10.0, grasp_reward=1.0,
        delta_z_scale=1000.0, time_penalty=100.0, table_clearing=False,
        lift_success=10.0, stalled=True, max_delta_z=0.01,
    )

    def test_shaped_first_step_value(self):
        rs = rew.RewardState.init(0.2)
        r, status, rs2, _ = rew.shaped_reward(
            self.SPEC, rs, 0.2, jnp.asarray(False), 0.05
        )
        # -(grasp + dz_scale*max_dz) = -11 (test_sim.py:89 contract)
        assert float(r) == pytest.approx(-11.0)
        assert int(status) == rew.RUNNING

    def test_shaped_terminal_on_lift(self):
        rs = rew.RewardState(
            lifting=jnp.asarray(True),
            start_height=jnp.asarray(0.1),
            old_height=jnp.asarray(0.14),
        )
        r, status, _, _ = rew.shaped_reward(
            self.SPEC, rs, 0.16, jnp.asarray(True), 0.05
        )
        assert float(r) == pytest.approx(10.0)
        assert int(status) == rew.SUCCESS

    def test_shaped_intermediate_while_grasping(self):
        rs = rew.RewardState(
            lifting=jnp.asarray(True),
            start_height=jnp.asarray(0.1),
            old_height=jnp.asarray(0.10),
        )
        r, status, _, _ = rew.shaped_reward(
            self.SPEC, rs, 0.101, jnp.asarray(True), 0.05
        )
        # grasp 1 + 1000*0.001 - (1 + 1000*0.01) = 2 - 11 = -9
        assert float(r) == pytest.approx(-9.0, abs=1e-3)

    def test_unshaped_sparse_penalty(self):
        spec = self.SPEC.__class__(**{**self.SPEC.__dict__, "shaped": False})
        rs = rew.RewardState.init(0.2)
        r, _, _, _ = rew.shaped_reward(spec, rs, 0.2, jnp.asarray(False), 0.05)
        assert float(r) == pytest.approx(-0.01)

    def test_custom_time_penalty(self):
        spec = self.SPEC.__class__(**{**self.SPEC.__dict__, "custom": True})
        rs = rew.RewardState.init(0.2)
        r, _, _, _ = rew.shaped_reward(spec, rs, 0.2, jnp.asarray(False), 0.05)
        assert float(r) == pytest.approx(-100.0)

    def test_table_clearing_flow(self):
        spec = self.SPEC.__class__(
            **{**self.SPEC.__dict__, "custom": True, "table_clearing": True}
        )
        rs = rew.RewardState(
            lifting=jnp.asarray(True),
            start_height=jnp.asarray(0.1),
            old_height=jnp.asarray(0.14),
        )
        # lift with 3 objects alive -> lift_success, RUNNING, clear flag
        r, status, _, clear = rew.table_clearing_reward(
            spec, rs, 0.16, jnp.asarray(True), 0.05, jnp.asarray(3)
        )
        assert float(r) == pytest.approx(10.0)
        assert int(status) == rew.RUNNING
        assert bool(clear)
        # last object -> terminal + SUCCESS (rewards.py:122-124)
        r, status, _, clear = rew.table_clearing_reward(
            spec, rs, 0.16, jnp.asarray(True), 0.05, jnp.asarray(1)
        )
        assert float(r) == pytest.approx(10.0)
        assert int(status) == rew.SUCCESS

    def test_simplified_stall(self):
        rs = rew.RewardState.init(0.2)
        r, status, _ = rew.simplified_descend(self.SPEC, rs, 0.1995)
        assert int(status) == rew.FAIL
        r, status, rs2 = rew.simplified_descend(self.SPEC, rs, 0.19)
        assert int(status) == rew.RUNNING
        assert float(rs2.old_height) == pytest.approx(0.19)


class TestCurriculum:
    SPEC = curr.CurriculumSpec(
        n_steps=4, success_threshold=0.7, window_size=10, init_lambda=0.0,
        extent=(0.01, 0.1), robot_height=(0.15, 0.25),
        max_objects=(3, 5), min_objects=(1, 1), lift_dist=(0.015, 0.1),
    )

    def test_interpolation(self):
        p0 = curr.params_at(self.SPEC, jnp.asarray(0.0))
        p1 = curr.params_at(self.SPEC, jnp.asarray(1.0))
        assert float(p0["extent"]) == pytest.approx(0.01)
        assert float(p1["extent"]) == pytest.approx(0.1)
        assert int(p0["max_objects"]) == 3
        assert int(p1["max_objects"]) == 5
        assert float(p1["lift_dist"]) == pytest.approx(0.1)

    def test_advance_on_success(self):
        state = curr.CurriculumState.init(self.SPEC)
        # 9/10 successes fills the window above threshold -> lambda += 1/4
        done = jnp.ones(10, bool)
        succ = jnp.arange(10) < 9
        state = curr.update(self.SPEC, state, done, succ)
        assert float(state.lam) == pytest.approx(0.25)
        assert int(state.filled) == 0  # window cleared

    def test_no_advance_below_threshold(self):
        state = curr.CurriculumState.init(self.SPEC)
        done = jnp.ones(10, bool)
        succ = jnp.arange(10) < 3
        state = curr.update(self.SPEC, state, done, succ)
        assert float(state.lam) == pytest.approx(0.0)

    def test_window_slides_exactly(self):
        # deque(maxlen=W) semantics: a full window that misses the threshold
        # keeps sliding; old outcomes fall out as new ones arrive.
        state = curr.CurriculumState.init(self.SPEC)
        # Fill with 10 failures -> full window, rate 0.
        state = curr.update(self.SPEC, state, jnp.ones(10, bool), jnp.zeros(10, bool))
        assert float(state.lam) == 0.0 and int(state.filled) == 10
        # 7 successes: window now [3 fails, 7 succ] -> 0.7, not > 0.7.
        state = curr.update(self.SPEC, state, jnp.ones(7, bool), jnp.ones(7, bool))
        assert float(state.sr_mean) == pytest.approx(0.7)
        assert float(state.lam) == 0.0
        # One more success: [2 fails, 8 succ] -> 0.8 > 0.7 -> advance + clear.
        state = curr.update(self.SPEC, state, jnp.ones(1, bool), jnp.ones(1, bool))
        assert float(state.lam) == pytest.approx(0.25)
        assert int(state.filled) == 0

    def test_partial_batch_masks(self):
        # Only lanes with done=True contribute outcomes.
        state = curr.CurriculumState.init(self.SPEC)
        done = jnp.asarray([True, False, True, False])
        succ = jnp.asarray([True, True, False, False])
        state = curr.update(self.SPEC, state, done, succ)
        assert int(state.filled) == 2
        assert float(state.sr_mean) == pytest.approx(0.5)

    def test_eval_forces_lambda_one(self):
        state = curr.CurriculumState.init(self.SPEC, evaluate=True)
        assert float(state.lam) == 1.0


def test_curriculum_ring_overflow_keeps_last_window():
    """More episodes finishing in one update than window_size (possible with
    all-gathered sharded lanes): only the LAST W outcomes must land in the
    ring, not an unspecified-order overwrite."""
    spec = curr.CurriculumSpec(
        n_steps=4, success_threshold=0.7, window_size=8, init_lambda=0.0,
        extent=(0.01, 0.1), robot_height=(0.15, 0.25),
        max_objects=(3, 5), min_objects=(1, 1), lift_dist=(0.01, 0.1),
    )
    state = curr.CurriculumState.init(spec)
    # 12 episodes finish at once: first 4 successes, last 8 failures.
    done = jnp.ones((12,), bool)
    succ = jnp.asarray([True] * 4 + [False] * 8)
    state = curr.update(spec, state, done, succ)
    # Ring (size 8) must hold exactly the last 8 outcomes: all failures.
    assert float(state.ring.sum()) == 0.0
    assert int(state.filled) == 8
    # Inverse case: last 8 are successes -> rate 1.0, lambda advances.
    state2 = curr.CurriculumState.init(spec)
    succ2 = jnp.asarray([False] * 4 + [True] * 8)
    state2 = curr.update(spec, state2, done, succ2)
    assert float(state2.lam) > 0.0
