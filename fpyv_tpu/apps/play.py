"""Policy playback: fly a trained checkpoint and (optionally) record video.

The deployment half of the train/serve loop the reference never had: load a
PPO/ES checkpoint (utils/checkpoint.py), roll the DETERMINISTIC policy
(actor mean) over vectorized envs in chunked device scans, report episode
statistics, and optionally encode the FPV depth view of env 0 — rendered at
full camera resolution through the analytic raycaster with the same HUD the
live window shows (viz/hud.py; reference simulator.py:158-166) — to a video
file via viz/video.VideoWriterSink.

    python -m fpyv_tpu.cli play --checkpoint-dir ckpts --env acro \
        --steps 600 --save-video flight.mp4
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fpyv_tpu.models.policy import ActorCritic, PixelActorCritic
from fpyv_tpu.utils.checkpoint import restore_checkpoint


def _detect_torso(params, fallback: str = "patch") -> str:
    """Infer the trained image torso from the checkpoint's param tree
    (PixelActorCritic names: 'patch_embed' for patch, 'conv0' for conv).
    Non-vision param trees just return the fallback (never consulted)."""
    inner = params.get("params", params) if hasattr(params, "get") else params
    try:
        keys = set(inner.keys())
    except AttributeError:
        return fallback
    if "patch_embed" in keys:
        return "patch"
    if "conv0" in keys:
        return "conv"
    return fallback


def _detect_patch_pool(params) -> int:
    """Infer patch_pool from the checkpoint's param tree: the 'patch_pool'
    Dense (if trained with pooling) has kernel (pool*embed, embed)."""
    inner = params.get("params", params) if hasattr(params, "get") else params
    try:
        wp = inner["patch_pool"]["kernel"]
    except (KeyError, TypeError):
        return 1
    return int(wp.shape[0]) // int(wp.shape[1])


def _detect_gru(params) -> int:
    """Infer the GRU width from the checkpoint's param tree (the 'gru'
    GRUCell's hidden-to-z kernel is (H, H)); 0 = feedforward checkpoint."""
    inner = params.get("params", params) if hasattr(params, "get") else params
    try:
        return int(inner["gru"]["hz"]["kernel"].shape[-1])
    except (KeyError, TypeError):
        return 0


def _video_rig(resolution: Tuple[int, int]):
    from fpyv_tpu.vision.camera import CameraRig

    return CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0),
                     fov_deg=120.0, resolution=tuple(resolution))


def play_policy(
    checkpoint_dir: str,
    env_name: str = "acro",  # 'acro' | 'vision' | 'race' | 'vision_race'
    steps: int = 600,
    num_envs: int = 16,  # eval bank; stats average over it, video shows env 0
    seed: int = 0,
    hidden=(128, 128),  # must match the training net (acro/race)
    n_agents: Optional[int] = None,  # drones per race: default 4 for
    #   'race', 1 for 'vision_race' (a blanket 4 silently evaluated
    #   single-drone pixel checkpoints in 4-agent scrums)
    randomize_worlds: bool = False,  # vision
    torso: Optional[str] = None,  # vision nets: None = detect from the
    #   checkpoint's param tree (patch_embed vs conv0 keys — ADVICE r3: a
    #   wrong torso surfaced only as an orbax shape-mismatch error)
    gate_onehot: bool = True,  # (vision_race) must match training: False
    #   evaluates the pure-pixels ablation (the onehot block stays zeroed)
    frame_stack: int = 1,  # (vision_race) must match training
    show_opponents: bool = True,  # (vision_race) in-frame opponent ablation
    gate_size: float = 5.0,  # (race/vision_race) must match the trained
    #   track (the gate-size curriculum evaluates at its phase's size)
    n_obstacles: int = 0,  # (vision_race) moving track obstacles
    permute_spawns: bool = False,  # (race/vision_race) per-episode random
    #   spawn-slot assignment. Default False: a fixed-slot eval of a
    #   permutation-trained policy measures slot ROBUSTNESS (agent i always
    #   in slot i), not statistical averaging over slots.
    save_video: Optional[str] = None,
    video_resolution: Tuple[int, int] = (640, 480),
    chunk: int = 120,  # steps per device call
    step_checkpoint: Optional[int] = None,  # None = latest
    params=None,  # bypass the checkpoint (tests / in-process handoff)
) -> dict:
    if params is None:
        raw = restore_checkpoint(checkpoint_dir, step_checkpoint)
        params = raw["params"]  # PpoState field (no shape template needed)
    if torso is None:
        torso = _detect_torso(params)

    key = jax.random.key(seed)
    k_env, k_world = jax.random.split(key)
    rig = _video_rig(video_resolution) if save_video else None

    # ---- env-specific policy/step/reset/frame plumbing ---------------------
    if env_name == "acro":
        from fpyv_tpu.envs.acro import AcroEnv
        from fpyv_tpu.physics.drone import DroneParams

        env = AcroEnv(params=DroneParams(att_mode="quat"))
        world = env.default_world()
        net = ActorCritic(action_dim=4, hidden=tuple(hidden))

        def reset_fn(keys):
            return jax.vmap(lambda k: env.reset(k, world))(keys)

        def step_fn(st, obs):
            mean, _, _ = net.apply(params, obs)
            st, obs, r, d, info = jax.vmap(
                lambda s, a: env.step(s, a, world))(st, mean)
            return st, obs, r, info["crashed"], {}

        def frame_state(st):  # env 0's drone + its world
            return jax.tree.map(lambda x: x[0], st.drone), world

    elif env_name == "vision":
        from fpyv_tpu.envs.vision_acro import VisionAcroEnv

        env = VisionAcroEnv(renderer="raycast", target_only=False)
        if randomize_worlds:
            worlds, bank = env.make_randomized_worlds(k_world, num_envs)
        else:
            world0, bank = env.make_world()
            worlds = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), world0)
        net = PixelActorCritic(action_dim=4, torso=torso,
                               patch_pool=_detect_patch_pool(params))

        def _proprio(obs):
            return jnp.concatenate(
                [obs["rates"], obs["accel_z"], obs["thrust"]], axis=-1)

        def reset_fn(keys):
            return jax.vmap(lambda k, w: env.reset(k, w, bank))(keys, worlds)

        def step_fn(st, obs):
            mean, _, _ = net.apply(params, obs["pixels"], _proprio(obs))
            st, obs, r, d, info = jax.vmap(
                lambda s, a, w: env.step(s, a, w, bank))(st, mean, worlds)
            return st, obs, r, info["crashed"], {}

        def frame_state(st):
            return (jax.tree.map(lambda x: x[0], st.drone),
                    jax.tree.map(lambda x: x[0], worlds))

    elif env_name == "vision_race":
        from fpyv_tpu.envs.multi_race import MultiRaceEnv
        from fpyv_tpu.envs.vision_race import VisionRaceEnv

        A = n_agents or 1
        env = VisionRaceEnv(
            race=MultiRaceEnv(n_agents=A, max_episode_steps=2000,
                              gate_size=gate_size, n_obstacles=n_obstacles,
                              permute_spawns=permute_spawns),
            gate_onehot=gate_onehot, frame_stack=frame_stack,
            show_opponents=show_opponents)
        world = env.default_world()
        gru = _detect_gru(params)
        net = PixelActorCritic(action_dim=4, torso=torso,
                               patch_pool=_detect_patch_pool(params),
                               gru=gru)

        def _vr_proprio(obs):
            return jnp.concatenate(
                [obs["rates"], obs["accel_z"], obs["thrust"],
                 obs["gate_onehot"]], axis=-1)

        def _extra(info):
            extra = {"gates_passed": info["gates_passed"]}
            if A > 1:  # per-agent eval table counters (VERDICT r3 #4)
                extra["agent_gates"] = info["gates_passed"].reshape(-1, A)
                extra["sum_contact_events"] = info["contact"]
                extra["sum_overtakes"] = info["overtakes"]
            return extra

        if gru:
            # recurrent checkpoint: the hidden rides the play carry and
            # zeroes on episode boundaries, exactly like training
            def reset_fn(keys):
                st, obs = env.reset_batched(keys, world)
                return (st, jnp.zeros((num_envs * A, gru), jnp.float32)), obs

            def step_fn(carry, obs):
                st, h = carry
                mean, _, _, h2 = net.apply(
                    params, obs["pixels"], _vr_proprio(obs), h)
                st, obs, r, d, info = env.step_batched(st, mean, world)
                h2 = jnp.where(info["crashed"][..., None], 0.0, h2)
                return (st, h2), obs, r, info["crashed"], _extra(info)

            def frame_state(carry):
                rs = getattr(carry[0], "race", carry[0])
                return jax.tree.map(lambda x: x[0, 0], rs.drones), world
        else:
            def reset_fn(keys):
                return env.reset_batched(keys, world)

            def step_fn(st, obs):
                mean, _, _ = net.apply(params, obs["pixels"],
                                       _vr_proprio(obs))
                st, obs, r, d, info = env.step_batched(st, mean, world)
                return st, obs, r, info["crashed"], _extra(info)

            def frame_state(st):
                rs = getattr(st, "race", st)
                return jax.tree.map(lambda x: x[0, 0], rs.drones), world

    elif env_name == "race":
        from fpyv_tpu.envs.multi_race import MultiRaceEnv

        A = n_agents or 4
        env = MultiRaceEnv(n_agents=A, gate_size=gate_size,
                           permute_spawns=permute_spawns)
        world = env.default_world()
        net = ActorCritic(action_dim=4, hidden=tuple(hidden))

        def reset_fn(keys):
            return jax.vmap(lambda k: env.reset(k, world))(keys)

        def step_fn(st, obs):
            mean, _, _ = net.apply(params, obs.reshape(num_envs * A, -1))
            st, obs, r, d, info = jax.vmap(
                lambda s, a: env.step(s, a, world))(
                    st, mean.reshape(num_envs, A, -1))
            return (st, obs, r.mean(axis=-1), info["crashed"].any(axis=-1),
                    {"gates_passed": info["gates_passed"].sum(axis=-1),
                     "agent_gates": info["gates_passed"],
                     "sum_contact_events": info["contact"],
                     "sum_overtakes": info["overtakes"]})

        def frame_state(st):
            # follow agent 0 of race 0
            return jax.tree.map(lambda x: x[0, 0], st.drones), world

    else:
        raise ValueError(f"unknown env {env_name!r}")

    with_frames = save_video is not None

    def render_frame(drone0, world0):
        from fpyv_tpu.physics.drone import _att_to_rotmat
        from fpyv_tpu.vision.camera import camera_pose
        from fpyv_tpu.vision.raycast import render_depth_raycast

        R = _att_to_rotmat(env.params, drone0.att)
        cam_pos, cam_R = camera_pose(rig, drone0.pos, R)
        return render_depth_raycast(rig, cam_pos, cam_R, world0,
                                    max_depth=25.0)

    @jax.jit
    def play_chunk(st, obs):
        def body(carry, _):
            st, obs = carry
            st, obs, r, crashed, extra = step_fn(st, obs)
            out = (r, crashed, extra)
            if with_frames:
                drone0, world0 = frame_state(st)
                out = out + ((render_frame(drone0, world0),
                              drone0.pos, drone0.vel),)
            return (st, obs), out

        return jax.lax.scan(body, (st, obs), None, length=chunk)

    env_keys = jax.random.split(k_env, num_envs)
    st, obs = reset_fn(env_keys)

    sink = None
    if save_video:
        from fpyv_tpu.viz.hud import hud_overlay
        from fpyv_tpu.viz.video import VideoWriterSink

        sink = VideoWriterSink(save_video, fps=60.0)

    total_r, crash_events, extra_sums = 0.0, 0, {}
    done_steps = 0
    try:
        # each device call runs a full fixed-size chunk (static scan length);
        # `steps` rounds up to a multiple of `chunk`
        while done_steps < steps:
            (st, obs), outs = play_chunk(st, obs)
            outs = jax.device_get(outs)
            r, crashed = outs[0], outs[1]
            total_r += float(np.sum(r)) / num_envs
            crash_events += int(np.sum(crashed))
            for k, v in outs[2].items():
                if k.startswith("sum_"):  # per-step event counters
                    extra_sums[k] = extra_sums.get(k, 0) + np.sum(
                        np.asarray(v, np.int64), axis=tuple(range(v.ndim - 1)))
                else:
                    extra_sums[k] = v[-1]  # running counters: keep the last
            if sink is not None:
                frames, poss, vels = outs[3]
                for i in range(chunk):
                    sink(hud_overlay(
                        frames[i],
                        speed_ms=float(np.linalg.norm(vels[i])),
                        height_m=float(poss[i][2])))
            done_steps += chunk
    finally:
        if sink is not None:
            sink.close()

    out = {
        "env": env_name,
        "steps": int(done_steps),
        "num_envs": int(num_envs),
        "mean_reward_per_step": total_r / done_steps,
        "crash_events": crash_events,
    }
    for k, v in extra_sums.items():
        if k == "agent_gates":
            # the per-agent deterministic eval table: mean gates per agent
            # slot (across races) at episode end + each event counter below
            out["agent_gates_mean"] = np.mean(np.asarray(v, np.float64),
                                              axis=0).tolist()
        elif k.startswith("sum_"):
            out[k[4:]] = np.asarray(v, np.int64).tolist()
        else:
            out[f"final_{k}_mean"] = float(np.mean(v))
    if sink is not None:
        out["video"] = sink.path
        out["video_frames"] = sink.frames_written
    return out
