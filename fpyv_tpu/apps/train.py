"""PPO training app: rollouts on the env bank, learner updates, checkpoints.

The greenfield trainer the BASELINE configs call for: vectorized acro (or
rotate / multi-race) envs feed the PPO learner; on multi-device meshes the
env bank shards over the 'env' axis and gradients all-reduce over ICI
(fpyv_tpu.parallel). Checkpoints (orbax) capture the FULL state — params,
optimizer, env bank, RNG keys — so runs resume deterministically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fpyv_tpu.envs.acro import AcroEnv
from fpyv_tpu.models.policy import ActorCritic
from fpyv_tpu.physics.drone import DroneParams
from fpyv_tpu.rl.ppo import PpoConfig, make_ppo, scan_train
from fpyv_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint, latest_step
from fpyv_tpu.utils.metrics import MetricsLogger
from fpyv_tpu.utils.profiling import Throughput


@dataclass
class TrainResult:
    iterations: int
    mean_reward_first: float
    mean_reward_last: float
    steps_per_second: float


def train_acro(
    num_envs: int = 4096,
    num_iterations: int = 100,
    num_steps: int = 32,
    seed: int = 0,
    distributed: bool = False,
    log_dir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 50,
    resume: bool = False,
    randomize: bool = False,
    hidden=(128, 128),
    learning_rate: float = 3e-4,
    print_every: int = 10,
    scan_chunk: int = 10,  # iterations per device call (amortizes dispatch)
) -> TrainResult:
    env = AcroEnv(params=DroneParams(att_mode="quat"), randomize=randomize)
    world = env.default_world()
    net = ActorCritic(action_dim=4, hidden=tuple(hidden))
    config = PpoConfig(num_envs=num_envs, num_steps=num_steps,
                       learning_rate=learning_rate)

    def env_step(env_state, action, key):
        st, obs, reward, done, info = jax.vmap(
            lambda s, a: env.step(s, a, world))(env_state, action)
        # hand the learner TERMINATIONS only: time-limit truncations must
        # bootstrap V(s') rather than zero it (done would bias values near
        # the horizon; the env still auto-resets on either)
        return st, obs, reward, info["crashed"]

    key = jax.random.key(seed)
    k_env, k_net, k_train = jax.random.split(key, 3)
    env_keys = jax.random.split(k_env, num_envs)
    env_state, obs = jax.vmap(lambda k: env.reset(k, world))(env_keys)
    params = net.init(k_net, obs[:1])

    if distributed:
        from fpyv_tpu.parallel.mesh import make_mesh
        from fpyv_tpu.parallel.train import make_distributed_ppo, shard_ppo_state

        mesh = make_mesh()
        init, train_iteration = make_distributed_ppo(
            net.apply, env_step, config, mesh)
        state = init(params, env_state, obs,
                     jax.random.split(k_train, mesh.size))
        state = shard_ppo_state(state, mesh)
    else:
        init, train_iteration = make_ppo(net.apply, env_step, config)
        state = init(params, env_state, obs, k_train)

    start_iter = 0
    if resume and checkpoint_dir and latest_step(checkpoint_dir) is not None:
        start_iter = latest_step(checkpoint_dir)
        state = restore_checkpoint(checkpoint_dir, start_iter, template=state)
        print(f"resumed from checkpoint at iteration {start_iter}")

    return _train_loop(
        state, train_iteration, num_envs=num_envs, num_steps=num_steps,
        num_iterations=num_iterations, start_iter=start_iter,
        scan_chunk=scan_chunk, log_dir=log_dir, print_every=print_every,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
    )


def _train_loop(state, train_iteration, *, num_envs, num_steps,
                num_iterations, start_iter, scan_chunk, log_dir, print_every,
                checkpoint_dir, checkpoint_every) -> TrainResult:
    """The chunked host loop shared by every trainer in this module."""
    logger = MetricsLogger(log_dir, print_every=print_every)
    meter = Throughput()
    first_reward = last_reward = float("nan")

    # chunked scan: scan_chunk iterations per device call — per-call dispatch
    # costs ~100 ms on this platform (BENCH.md), far more than the iterations
    jit_scan = jax.jit(scan_train, static_argnums=(0, 2))

    it = start_iter
    end = start_iter + num_iterations
    first_chunk = True
    while it < end:
        n = min(scan_chunk, end - it)
        state, infos = jit_scan(train_iteration, state, n)
        # ONE device->host transfer per chunk: per-scalar np.asarray() calls
        # each cost a full tunnel round trip and would dwarf device time
        infos = jax.device_get(infos)
        rewards = np.asarray(infos["mean_reward"], np.float64)
        if first_chunk:
            first_reward = float(rewards[0])
            meter.reset()  # exclude the compile chunk from throughput
            first_chunk = False
        else:
            meter.add(num_envs * num_steps * n)
        last_reward = float(rewards[-1])
        for i in range(n):
            logger.log(it + i, jax.tree.map(lambda x: x[i], infos))
        it += n
        if checkpoint_dir and (it % checkpoint_every == 0 or it == end):
            save_checkpoint(checkpoint_dir, it, state)

    logger.close()
    return TrainResult(
        iterations=num_iterations,
        mean_reward_first=first_reward,
        mean_reward_last=last_reward,
        steps_per_second=meter.rate(),
    )


def train_vision(
    num_envs: int = 1024,
    num_iterations: int = 100,
    num_steps: int = 32,
    seed: int = 0,
    log_dir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 50,
    resume: bool = False,
    randomize_worlds: bool = True,
    rig=None,
    learning_rate: float = 3e-4,
    print_every: int = 10,
    scan_chunk: int = 5,
    num_minibatches: int = 8,
    renderer: str = "raycast",
    target_only: bool = False,
) -> TrainResult:
    """Pixels-to-action PPO: VisionAcroEnv depth observations through the
    conv policy (PixelActorCritic), rendered inside the jitted rollout.

    With ``randomize_worlds`` every env trains in its OWN randomized world
    (one shared unit-geometry bank, per-env transforms from the batched
    World — world/render_bank.py) for sim-to-real-style visual diversity.

    The default observation is the FULL-world depth view through the
    analytic raycast renderer — the same view the reference's dim==2 loop
    shows the drone (render_depth_image(object_list),
    /root/reference/src/core/simulator.py:122, object_list = targets +
    obstacles + ground, :85) — at raycast speed (BENCH.md). Set
    ``renderer="splat"``/``target_only=True`` for the reference-parity
    point-splat of just the chased target (simulator.py:102/127's
    guidance view).
    """
    from fpyv_tpu.envs.vision_acro import VisionAcroEnv
    from fpyv_tpu.models.policy import PixelActorCritic

    env = VisionAcroEnv(renderer=renderer, target_only=target_only,
                        **({"rig": rig} if rig is not None else {}))
    key = jax.random.key(seed)
    k_world, k_env, k_net, k_train = jax.random.split(key, 4)
    if randomize_worlds:
        worlds, bank = env.make_randomized_worlds(k_world, num_envs)
    else:
        world, bank = env.make_world()
        worlds = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), world)

    net = PixelActorCritic(action_dim=4)
    config = PpoConfig(num_envs=num_envs, num_steps=num_steps,
                       learning_rate=learning_rate,
                       num_minibatches=num_minibatches)

    def apply_fn(params, obs):
        proprio = jnp.concatenate(
            [obs["rates"], obs["accel_z"], obs["thrust"]], axis=-1)
        return net.apply(params, obs["pixels"], proprio)

    def env_step(env_state, action, key):
        st, obs, reward, done, info = jax.vmap(
            lambda s, a, w: env.step(s, a, w, bank))(env_state, action, worlds)
        return st, obs, reward, info["crashed"]

    env_keys = jax.random.split(k_env, num_envs)
    env_state, obs = jax.vmap(
        lambda k, w: env.reset(k, w, bank))(env_keys, worlds)
    params = net.init(k_net, obs["pixels"][:1],
                      jnp.concatenate([obs["rates"][:1], obs["accel_z"][:1],
                                       obs["thrust"][:1]], axis=-1))

    init, train_iteration = make_ppo(apply_fn, env_step, config)
    state = init(params, env_state, obs, k_train)

    start_iter = 0
    if resume and checkpoint_dir and latest_step(checkpoint_dir) is not None:
        start_iter = latest_step(checkpoint_dir)
        state = restore_checkpoint(checkpoint_dir, start_iter, template=state)
        print(f"resumed from checkpoint at iteration {start_iter}")

    return _train_loop(
        state, train_iteration, num_envs=num_envs, num_steps=num_steps,
        num_iterations=num_iterations, start_iter=start_iter,
        scan_chunk=scan_chunk, log_dir=log_dir, print_every=print_every,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
    )
