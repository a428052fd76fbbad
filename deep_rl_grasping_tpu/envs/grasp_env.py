"""The grasping task as pure, jit-compiled state transitions.

TPU-native re-design of RobotEnv (gripperEnv/robot.py:32-306). One env step
fuses: action decode -> servo-target update -> N physics substeps -> ray-cast
render -> reward/status -> curriculum-aware auto-reset, all inside one XLA
program, `vmap`ped over the env batch. Key mappings from the reference:

* step/run structure: a move executes run(0.1s)=24 substeps
  (robot.py:235-249), a gripper toggle run(0.2s)=48 (robot.py:264-278).
  Under vmap both control branches execute for every env, so the step is a
  single uniform 48-substep schedule where only the servo *targets* differ
  per env — moves simply hold their (already reached) target a little
  longer. The simplified env appends the SimplifiedReward grasp protocol
  (close + lift, rewards.py:71-80) as two more scheduled phases.
* relative_pose kinematics (robot.py:251-262): with the hand flipped
  (roll=pi), a local translation t maps to a world delta
  Rz(yaw) @ (tx, -ty, -tz) and commanded yaw accumulates in
  endEffectorAngle with the world yaw equal to its negative.
* auto-reset: the reference reloads URDFs in a reset-until-visible loop
  (robot.py:19-30). Here a fresh episode is sampled on-device (scene.py in
  this package); the FOV-retry is unnecessary because sampled objects lie
  well inside the camera frustum at every curriculum extent (<=0.1 m at
  >=0.3 m viewing distance vs a ~0.18 m half-footprint), so
  `skip_empty_initial_state` is honored trivially.
* grasp detection (robot.py:288-297): fingers commanded closed but stalled
  at width > 5 mm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from deep_rl_grasping_tpu.envs import actuator as act
from deep_rl_grasping_tpu.envs import curriculum as curr
from deep_rl_grasping_tpu.envs import rewards as rew
from deep_rl_grasping_tpu.envs import wrappers
from deep_rl_grasping_tpu.render import raycast
from deep_rl_grasping_tpu.sim import objects as objlib
from deep_rl_grasping_tpu.sim import physics, scene
from deep_rl_grasping_tpu.sim.types import (
    FINGER_CLOSED,
    FINGER_OPEN,
    SimState,
    make_sim_params,
)
from deep_rl_grasping_tpu.utils import config as cfg_util
from deep_rl_grasping_tpu.utils import io_utils, transforms

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


@struct.dataclass
class EnvState:
    sim: SimState
    key: jnp.ndarray
    episode_step: jnp.ndarray   # () int32
    episode_return: jnp.ndarray  # () f32
    status: jnp.ndarray         # () int32 (rewards.RUNNING/...)
    reward_state: rew.RewardState
    # Per-episode randomized camera (sensor.py:52-80)
    cam_t: jnp.ndarray          # (3,) robot->camera translation
    cam_R: jnp.ndarray          # (3,3) robot->camera rotation
    intrinsics: jnp.ndarray     # (4,) fx, fy, cx, cy
    lift_dist: jnp.ndarray      # () curriculum-interpolated at episode start


class GraspEnv:
    """Static task configuration + pure transition functions.

    Methods take/return pytrees only; instances are safe to close over in
    jit. Construct once per experiment from a config dict or YAML path.
    """

    def __init__(self, config, evaluate=False, test=False, validate=False,
                 encoder_fn=None):
        config = cfg_util.load_config(config)
        self.config = config
        self.evaluate = evaluate
        tpu = config["tpu"]

        self.simplified = bool(config["simplified"])
        self.depth_obs = bool(config.get("depth_observation", False))
        self.full_obs = bool(config.get("full_observation", False))
        self.time_horizon = int(config["time_horizon"])
        # TimeFeatureWrapper equivalent (training/wrapper.py:5-54, enabled by
        # the reference's --timefeature flag): append the remaining-time
        # fraction to flat (latent) observations. Image observations carry
        # no time feature, matching the reference (the wrapper was only used
        # with MLP-policy runs).
        self.time_feature = bool(config.get("time_feature", False)) and not (
            self.depth_obs or self.full_obs
        )

        self.actuator_spec = act.ActuatorSpec.from_config(config)
        self.reward_spec = rew.RewardSpec.from_config(config)
        self.curriculum_spec = curr.CurriculumSpec.from_config(config)

        scene_cfg = config["scene"]
        self.scene_type = scene_cfg.get("scene_type", "OnTable")
        if self.simplified and "scene_type" not in scene_cfg:
            self.scene_type = "OnFloor"
        self.max_slots = int(tpu["max_objects"])
        lib = objlib.get_library(
            int(tpu["spheres_per_object"]),
            oo_spheres=int(tpu.get("oo_spheres", 4)),
        )
        self.library = lib
        self.sim_params = make_sim_params(
            lib,
            scene_type=self.scene_type,
            solver_iterations=int(tpu.get("solver_iterations", 8)),
            pad_inner_iterations=int(tpu.get("pad_inner_iterations", 14)),
            dt=float(tpu.get("dt", 1.0 / 240.0)),
            # Object-object cost knobs (SimParams docstrings; expert-gated
            # before any config ships them).
            oo_point_mass_tangent=bool(tpu.get("oo_point_mass_tangent", False)),
            oo_pass_stride=int(tpu.get("oo_pass_stride", 1)),
            # Rolling resistance (SimParams.rolling_damping; round-5
            # fidelity fix — see sim/types.py). Override to 0 to reproduce
            # the pre-r5 rolling behavior.
            rolling_damping=float(tpu.get("rolling_damping", 0.1)),
            # In-hand spin resistance (default off; see SimParams).
            pinch_damping=float(tpu.get("pinch_damping", 0.0)),
        )
        if scene_cfg.get("data_set", "random_urdfs") == "wooden_blocks":
            ids = lib.wooden_block_ids()
        else:
            ids = lib.random_urdf_ids(test=test, validate=validate)
        self.type_ids = jnp.asarray(ids, jnp.int32)

        # Camera
        sensor_cfg = config["sensor"]
        cam_info = io_utils.load_yaml(cfg_util.resolve_path(sensor_cfg["camera_info"]))
        trans = io_utils.load_yaml(cfg_util.resolve_path(sensor_cfg["transform"]))
        K = np.reshape(np.asarray(cam_info["K"], np.float32), (3, 3))
        self.base_intrinsics = jnp.asarray(
            [K[0, 0], K[1, 1], K[0, 2], K[1, 2]], jnp.float32
        )
        self.im_h = int(cam_info["height"])
        self.im_w = int(cam_info["width"])
        self.near = float(cam_info.get("near", 0.02))
        self.far = float(cam_info.get("far", 2.0))
        q_rc = jnp.asarray(trans["rotation"], jnp.float32)
        self.base_cam_R = transforms.quat_to_matrix(transforms.quat_normalize(q_rc))
        self.base_cam_t = jnp.asarray(trans["translation"], jnp.float32)
        # Domain randomization is disabled for eval (sensor.py:22 randomize
        # flag; evaluation uses the nominal camera).
        self.randomize = sensor_cfg.get("randomize") if not evaluate else None
        # RGB channel scale for full_observation. Default 255 mirrors the
        # reference's uint8-range images (robot.py:199-205 dstack) and keeps
        # saved r4 checkpoints' obs contract; sensor.rgb_scale: 1.0 feeds
        # unit-range RGB so all five channels share the depth channel's
        # magnitude (the 0-255 x bf16 mismatch is a suspected contributor
        # to the r4 RGB-D instability, TRAINING_NOTES).
        self.rgb_scale = float(sensor_cfg.get("rgb_scale", 255.0))

        self.move_substeps = int(tpu.get("move_substeps", 24))
        self.gripper_substeps = int(tpu.get("gripper_substeps", 48))
        # Env-batch lane-block size for the fused solver kernel (tuned
        # on-chip via scripts_dev/kernel_bench.py; 128 = one vreg of lanes).
        self.block_e = int(tpu.get("block_e", 128))
        self.encoder_fn = encoder_fn  # depth image (H,W,1) -> latent (D,)
        self.encoding_dim = int(config.get("encoding_dim", 100))
        # BDQ composite actions: one discrete bin per action dimension
        # (set by the BDQ training path; see algos/bdq.py).
        self.branched_actions = False

    # ------------------------------------------------------------------ spaces

    @property
    def discrete(self):
        return self.actuator_spec.discrete

    @property
    def num_actions(self):
        return self.actuator_spec.num_discrete_actions

    @property
    def action_dim(self):
        return self.actuator_spec.action_dim

    @property
    def obs_shape(self):
        if self.depth_obs or self.full_obs:
            c = 5 if self.full_obs else 2
            return (self.im_h, self.im_w, c)
        d = self.encoding_dim
        d = d if self.simplified else d + 1
        return (d + 1,) if self.time_feature else (d,)

    # ------------------------------------------------------------------ reset

    def _randomized_camera(self, key):
        if self.randomize is None:
            return self.base_cam_t, self.base_cam_R, self.base_intrinsics
        kf, kc, kt, kd, kr, ka = jax.random.split(key, 6)
        f = float(self.randomize["focal_length"])
        c = float(self.randomize["optical_center"])
        t = float(self.randomize["translation"])
        r = float(self.randomize["rotation"])
        dfx, dfy = jax.random.uniform(kf, (2,), minval=-f, maxval=f)
        dcx, dcy = jax.random.uniform(kc, (2,), minval=-c, maxval=c)
        intr = self.base_intrinsics + jnp.stack([dfx, dfy, dcx, dcy])
        mag = jax.random.uniform(kt, (), minval=0.0, maxval=t)
        direction = transforms.random_unit_vector(
            jax.random.uniform(kd, (3,), minval=-1.0, maxval=1.0)
        )
        angle = jax.random.uniform(kr, (), minval=0.0, maxval=r)
        axis = transforms.random_unit_vector(
            jax.random.uniform(ka, (3,), minval=-1.0, maxval=1.0)
        )
        Rd = transforms.quat_to_matrix(transforms.quat_about_axis(angle, axis))
        # quaternion_matrix(q) @ transform rotates the whole 4x4 extrinsic
        # about the gripper origin (sensor.py:74-77).
        cam_R = _einsum("ij,jk->ik", Rd, self.base_cam_R)
        cam_t = _einsum("ij,j->i", Rd, self.base_cam_t + mag * direction)
        return cam_t, cam_R, intr

    def reset_env(self, key, lam, settle_substeps=0) -> EnvState:
        """Sample a fresh episode at curriculum difficulty `lam`."""
        k_scene, k_cam, k_next = jax.random.split(key, 3)
        cp = curr.params_at(self.curriculum_spec, lam)
        sim = scene.reset_scene(
            k_scene,
            self.sim_params,
            self.type_ids,
            self.max_slots,
            cp["min_objects"],
            cp["max_objects"],
            cp["extent"],
            cp["robot_height"],
            settle_substeps=settle_substeps,
        )
        cam_t, cam_R, intr = self._randomized_camera(k_cam)
        return EnvState(
            sim=sim,
            key=k_next,
            episode_step=jnp.asarray(0, jnp.int32),
            episode_return=jnp.asarray(0.0, jnp.float32),
            status=jnp.asarray(rew.RUNNING, jnp.int32),
            reward_state=rew.RewardState.init(cp["robot_height"]),
            cam_t=cam_t,
            cam_R=cam_R,
            intrinsics=intr,
            lift_dist=jnp.asarray(cp["lift_dist"], jnp.float32),
        )

    # ------------------------------------------------------------------ obs

    def render_raw(self, state: EnvState):
        cam_pos, cam_R = raycast.camera_pose_from_gripper(
            state.sim.gripper.q, state.cam_t, state.cam_R
        )
        return raycast.render(
            state.sim, self.sim_params, cam_pos, cam_R, state.intrinsics,
            self.im_h, self.im_w, self.near, self.far,
        )

    def observe(self, state: EnvState):
        """Assemble the observation (robot.py:183-205)."""
        rgb, depth, mask = self.render_raw(state)
        return self.assemble_obs(state, rgb, depth, mask)

    def assemble_obs(self, state: EnvState, rgb, depth, mask):
        """Observation assembly given rendered images; rgb may be None for
        depth/encoder modes (the fused Pallas raster renders depth+seg)."""
        if self.depth_obs or self.full_obs:
            pad = jnp.zeros((self.im_h, self.im_w), jnp.float32)
            if self.simplified:
                # padding channel workaround kept (FIXME robot.py:193-199)
                return jnp.stack([depth, pad], -1)
            width = physics.gripper_width(state.sim.gripper.q)
            a_obs = act.actuator_obs(
                self.actuator_spec, width, state.sim.gripper.q[2]
            )
            pad = pad.at[0, 0].set(a_obs[0])
            if self.full_obs:
                return jnp.concatenate(
                    [rgb * self.rgb_scale, depth[..., None], pad[..., None]],
                    -1,
                )
            return jnp.stack([depth, pad], -1)
        # Encoder observation (sensor.py:206-230): mask out static surfaces
        # and the gripper, encode to the latent space.
        img = depth
        img = jnp.where(mask == 0, 0.0, img)
        gripper_id = (self.max_slots + 3) if self.sim_params.has_tray else (self.max_slots + 1)
        img = jnp.where(mask == gripper_id, 0.0, img)
        if self.scene_type == "OnTable":
            img = jnp.where((mask == 1) | (mask == 2), 0.0, img)
        if self.encoder_fn is not None:
            enc = self.encoder_fn(img[..., None])
        else:
            # Until an autoencoder is attached, expose a deterministic
            # downsampled latent of the right dimension. Warn loudly: a
            # training run that silently falls through to this stand-in is
            # NOT the encoder-latent experiment (VERDICT r3 soft spot).
            import logging

            logging.getLogger(__name__).warning(
                "encoder-latent observation requested but no autoencoder "
                "is attached (sensor.encoder_dir missing or weights not "
                "found) — falling back to a downsampled-depth stand-in"
            )
            side = int(np.ceil(np.sqrt(self.encoding_dim)))
            small = jax.image.resize(img, (side, side), "linear").reshape(-1)
            enc = small[: self.encoding_dim]
        if not self.simplified:
            width = physics.gripper_width(state.sim.gripper.q)
            a_obs = act.actuator_obs(
                self.actuator_spec, width, state.sim.gripper.q[2]
            )
            enc = jnp.concatenate([enc, a_obs])
        if self.time_feature:
            enc = wrappers.append_time_feature(
                enc, state.episode_step, self.time_horizon
            )
        return enc

    # ------------------------------------------------------------------ step

    def _compose_move_target(self, g, translation, yaw_rotation):
        """relative_pose -> servo targets (robot.py:235-262)."""
        yaw_w = g.q[3]
        cy, sy = jnp.cos(yaw_w), jnp.sin(yaw_w)
        tx, ty, tz = translation[0], translation[1], translation[2]
        # Rz(yaw) @ Rx(pi) @ t
        lx, ly, lz = tx, -ty, -tz
        dpos = jnp.stack([cy * lx - sy * ly, sy * lx + cy * ly, lz])
        new_pos = g.q[:3] + dpos
        new_ee = g.ee_angle + yaw_rotation
        new_yaw = -new_ee
        target = jnp.concatenate([new_pos, new_yaw[None]])
        return target, new_ee

    def _apply_action(self, sim: SimState, action):
        """Decode an action and set servo targets; returns (sim, cmd)."""
        g = sim.gripper
        if self.branched_actions:
            translation, yaw_rot, cmd = act.decode_branched_action(
                self.actuator_spec, action
            )
        else:
            translation, yaw_rot, cmd = act.decode_action(
                self.actuator_spec, action, g.gripper_close
            )
        move_target, move_ee = self._compose_move_target(g, translation, yaw_rot)
        is_move = cmd == act.CMD_MOVE
        target = jnp.where(is_move, move_target, g.target)
        ee = jnp.where(is_move, move_ee, g.ee_angle)
        finger_target = jnp.where(
            cmd == act.CMD_OPEN,
            FINGER_OPEN,
            jnp.where(cmd == act.CMD_CLOSE, FINGER_CLOSED, g.finger_target),
        )
        closed = jnp.where(
            cmd == act.CMD_OPEN,
            False,
            jnp.where(cmd == act.CMD_CLOSE, True, g.gripper_close),
        )
        g = g.replace(
            target=target, ee_angle=ee,
            finger_target=finger_target, gripper_close=closed,
        )
        return sim.replace(gripper=g), cmd

    def object_detected(self, sim: SimState, tol=0.005):
        """Finger-stall grasp detection (robot.py:288-297)."""
        width = physics.gripper_width(sim.gripper.q)
        return (sim.gripper.finger_target == FINGER_CLOSED) & (width > tol)

    def _remove_highest(self, sim: SimState):
        """Table clearing: drop the highest alive object and reopen the
        gripper (rewards.py:113-121 + World.find_highest/remove_model)."""
        obj = sim.objects
        z = jnp.where(obj.alive, obj.pos[:, 2], -jnp.inf)
        hi = jnp.argmax(z)
        alive = obj.alive.at[hi].set(False)
        g = sim.gripper
        g = g.replace(
            q=g.q.at[4:6].set(FINGER_OPEN),
            finger_target=jnp.asarray(FINGER_OPEN, jnp.float32),
            gripper_close=jnp.asarray(False),
        )
        return sim.replace(objects=obj.replace(alive=alive), gripper=g)

    # The control step is split into per-env glue (action decode, triggers,
    # rewards) and pure physics phases, so BatchedGraspEnv can route the
    # physics through the fused Pallas kernel (ops/solver_pallas.py) while
    # vmapping only the cheap glue. _step_core composes the same pieces for
    # the single-env (vmapped XLA) path.

    def _simplified_trigger(self, sim: SimState):
        """Phase A->B glue (rewards.py:71-80): close at h < 0.07."""
        h = sim.gripper.q[2]
        trigger = h < 0.07
        g = sim.gripper
        g = g.replace(
            finger_target=jnp.where(trigger, FINGER_CLOSED, g.finger_target),
            gripper_close=g.gripper_close | trigger,
        )
        return sim.replace(gripper=g), trigger, h

    def _simplified_lift(self, sim: SimState, trigger):
        """Phase B->C glue: raise the z target 5 cm for triggered envs."""
        g = sim.gripper
        lift_target = g.target.at[2].add(jnp.where(trigger, 0.05, 0.0))
        return sim.replace(gripper=g.replace(target=lift_target))

    def _simplified_outcome_core(self, state, sim, trigger, h):
        detected = self.object_detected(sim)
        r_attempt, s_attempt = rew.simplified_outcome(detected)
        r_move, s_move, rs_move = rew.simplified_descend(
            self.reward_spec, state.reward_state, h
        )
        reward = jnp.where(trigger, r_attempt, r_move)
        status = jnp.where(trigger, s_attempt, s_move)
        return state.replace(sim=sim, reward_state=rs_move), reward, status

    def _full_outcome_core(self, state, sim):
        rs = state.reward_state
        h = sim.gripper.q[2]
        detected = self.object_detected(sim)
        if self.reward_spec.table_clearing:
            num_alive = jnp.sum(sim.objects.alive.astype(jnp.int32))
            reward, status, new_rs, clear = rew.table_clearing_reward(
                self.reward_spec, rs, h, detected, state.lift_dist, num_alive
            )
            sim = jax.tree.map(
                lambda a, b: jnp.where(clear, a, b), self._remove_highest(sim), sim
            )
        else:
            reward, status, new_rs, _ = rew.shaped_reward(
                self.reward_spec, rs, h, detected, state.lift_dist
            )
        return state.replace(sim=sim, reward_state=new_rs), reward, status

    def _step_core(self, state: EnvState, action):
        """One control step (pre-reset): physics + reward + status."""
        sim, cmd = self._apply_action(state.sim, action)

        if self.simplified:
            # Phase A: the commanded move (run(0.1), robot.py:248)
            sim = physics.run(sim, self.sim_params, self.move_substeps)
            # Phase B: SimplifiedReward grasp attempt; phase C: lift 5 cm.
            sim, trigger, h = self._simplified_trigger(sim)
            sim = physics.run(sim, self.sim_params, self.gripper_substeps)
            sim = self._simplified_lift(sim, trigger)
            sim = physics.run(sim, self.sim_params, 2 * self.move_substeps)
            return self._simplified_outcome_core(state, sim, trigger, h)

        # Full env: uniform schedule covering both run(0.1) moves and
        # run(0.2) gripper toggles.
        sim = physics.run(sim, self.sim_params, self.gripper_substeps)
        return self._full_outcome_core(state, sim)

    def _finalize_step(self, state: EnvState, stepped: EnvState, reward,
                       status, lam, with_obs=True):
        """Time-limit, episode accounting, auto-reset, observation."""
        time_limit = (status == rew.RUNNING) & (
            stepped.episode_step >= self.time_horizon - 1
        )
        status = jnp.where(time_limit, rew.TIME_LIMIT, status).astype(jnp.int32)
        done = status != rew.RUNNING

        ep_return = state.episode_return + reward
        ep_step = state.episode_step + 1
        stepped = stepped.replace(
            episode_step=ep_step, episode_return=ep_return, status=status
        )

        key, rk = jax.random.split(state.key)
        fresh = self.reset_env(rk, lam)
        fresh = fresh.replace(key=key)
        next_state = jax.tree.map(
            lambda a, b: jnp.where(_bcast(done, a), a, b), fresh, stepped
        )
        info = {
            "is_success": status == rew.SUCCESS,
            "episode_step": ep_step,
            "episode_return": ep_return,
            "status": status,
            # Post-step (pre-auto-reset) alive count: with table clearing,
            # episode_cleared = initial alive - this (the reference counts
            # cleared objects per episode in its table-clearing protocol,
            # rewards.py:99-143); constant in non-clearing tasks.
            "objects_alive": jnp.sum(
                stepped.sim.objects.alive.astype(jnp.int32)
            ),
        }
        if not with_obs:
            return next_state, reward, done, info
        obs = self.observe(next_state)
        return next_state, obs, reward, done, info

    def step(self, state: EnvState, action, lam):
        """Full step with auto-reset. Returns (state, obs, reward, done, info).

        Follows VecEnv semantics (the reference trains through DummyVecEnv):
        when an episode ends, the returned obs belongs to the *next* episode
        while reward/info describe the finished one.
        """
        stepped, reward, status = self._step_core(state, action)
        return self._finalize_step(state, stepped, reward, status, lam)

    def reset(self, key, lam, settle_substeps=48):
        state = self.reset_env(key, lam, settle_substeps=settle_substeps)
        return state, self.observe(state)


def _bcast(flag, ref):
    """Broadcast a scalar bool against an arbitrary-rank leaf."""
    return flag.reshape((1,) * ref.ndim) if ref.ndim else flag


class BatchedGraspEnv:
    """vmap wrapper + shared curriculum (replaces VecEnv, SURVEY.md §2.17)."""

    def __init__(self, env: GraspEnv, num_envs: int, pmean_axis=None,
                 use_pallas=None):
        self.env = env
        self.num_envs = num_envs
        self.curriculum_spec = env.curriculum_spec
        # Mesh axis for cross-device curriculum aggregation (the success
        # window is global, like the reference's single shared deque).
        self.pmean_axis = pmean_axis
        # Fused Pallas solver for the physics phases (ops/solver_pallas.py):
        # default on when running on TPU, off on CPU (where the Mosaic
        # kernel would run interpreted); config tpu.use_pallas_solver
        # overrides. The vmapped XLA path stays as the fallback/reference.
        if use_pallas is None:
            use_pallas = env.config.get("tpu", {}).get("use_pallas_solver")
        if use_pallas is None:
            import jax as _jax

            use_pallas = _jax.default_backend() == "tpu"
        self.use_pallas = bool(use_pallas)

    def init_curriculum(self):
        return curr.CurriculumState.init(self.curriculum_spec, self.env.evaluate)

    def reset(self, key, curriculum_state):
        keys = jax.random.split(key, self.num_envs)
        states = jax.vmap(
            lambda k: self.env.reset_env(
                k, curriculum_state.lam, settle_substeps=48
            )
        )(keys)
        return states, self.observe_batch(states)

    def observe_batch(self, states):
        """Batched observation through the fused Pallas raster on TPU:
        depth+seg for depth/encoder modes, +shade (RGB via id->color LUT)
        for full RGB-D obs. render/raycast.py remains the CPU/parity path."""
        env = self.env
        if not self.use_pallas:
            return jax.vmap(env.observe)(states)
        from deep_rl_grasping_tpu.ops import raster_pallas
        from deep_rl_grasping_tpu.render import raycast

        cam_pos, cam_R = jax.vmap(raycast.camera_pose_from_gripper)(
            states.sim.gripper.q, states.cam_t, states.cam_R
        )
        out = raster_pallas.render_batch_pallas(
            states.sim, env.sim_params, cam_pos, cam_R, states.intrinsics,
            H=env.im_h, W=env.im_w, near=env.near, far=env.far,
            with_rgb=env.full_obs,
        )
        if env.full_obs:
            rgb, depth, seg = out
            return jax.vmap(env.assemble_obs)(states, rgb, depth, seg)
        depth, seg = out
        return jax.vmap(
            lambda st, d, m: env.assemble_obs(st, None, d, m)
        )(states, depth, seg)

    def _step_envs_pallas(self, states, actions, lam):
        """Batched control step with physics through the fused kernel:
        vmapped glue around solver_pallas.run_batched_sim, same composition
        as GraspEnv._step_core + _finalize_step."""
        from deep_rl_grasping_tpu.ops import solver_pallas

        env = self.env
        params = env.sim_params
        sim, _cmd = jax.vmap(env._apply_action)(states.sim, actions)

        if env.simplified:
            sim = solver_pallas.run_batched_sim(
                sim, params, env.move_substeps, block_e=env.block_e
            )
            sim, trigger, h = jax.vmap(env._simplified_trigger)(sim)
            sim = solver_pallas.run_batched_sim(
                sim, params, env.gripper_substeps, block_e=env.block_e
            )
            sim = jax.vmap(env._simplified_lift)(sim, trigger)
            sim = solver_pallas.run_batched_sim(
                sim, params, 2 * env.move_substeps, block_e=env.block_e
            )
            stepped, reward, status = jax.vmap(env._simplified_outcome_core)(
                states, sim, trigger, h
            )
        else:
            sim = solver_pallas.run_batched_sim(
                sim, params, env.gripper_substeps, block_e=env.block_e
            )
            stepped, reward, status = jax.vmap(env._full_outcome_core)(
                states, sim
            )
        next_states, rewards, dones, infos = jax.vmap(
            lambda st, sp, r, su: env._finalize_step(
                st, sp, r, su, lam, with_obs=False
            )
        )(states, stepped, reward, status)
        obs = self.observe_batch(next_states)
        return next_states, obs, rewards, dones, infos

    def step(self, states, actions, curriculum_state):
        if self.use_pallas:
            states, obs, rewards, dones, infos = self._step_envs_pallas(
                states, actions, curriculum_state.lam
            )
        else:
            states, obs, rewards, dones, infos = jax.vmap(
                lambda s, a: self.env.step(s, a, curriculum_state.lam)
            )(states, actions)
        done_mask = dones
        succ_mask = dones & infos["is_success"]
        if self.pmean_axis is not None:
            # The success window is global (one shared deque in the
            # reference): gather every shard's outcomes so all replicas
            # fold the identical episode stream into their ring.
            done_mask = jax.lax.all_gather(done_mask, self.pmean_axis).reshape(-1)
            succ_mask = jax.lax.all_gather(succ_mask, self.pmean_axis).reshape(-1)
        curriculum_state = curr.update(
            self.curriculum_spec, curriculum_state, done_mask, succ_mask
        )
        return states, obs, rewards, dones, infos, curriculum_state
