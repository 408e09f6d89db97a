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
    scan_chunk: int = 25,  # iterations per device call (amortizes dispatch;
    #   25 vs 10 measured 18.6M vs 8M trained steps/s on the tunneled chip)
    shuffle_block: int = 64,  # PPO minibatch shuffle granularity (rl/ppo.py)
) -> TrainResult:
    env = AcroEnv(params=DroneParams(att_mode="quat"), randomize=randomize)
    world = env.default_world()
    net = ActorCritic(action_dim=4, hidden=tuple(hidden))
    config = PpoConfig(num_envs=num_envs, num_steps=num_steps,
                       learning_rate=learning_rate,
                       shuffle_block=shuffle_block)

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
                checkpoint_dir, checkpoint_every,
                chunk_hook=None) -> TrainResult:
    """The chunked host loop shared by every trainer in this module.

    ``chunk_hook(state, it) -> state`` (optional) runs before each device
    chunk — the curriculum's world-resample point (data swaps only; the
    compiled program is unchanged because worlds flow through the carry).
    """
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
        if chunk_hook is not None:
            state = chunk_hook(state, it)
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


def train_race(
    num_envs: int = 1024,  # race instances (agents = num_envs * n_agents)
    n_agents: int = 4,
    num_iterations: int = 300,
    num_steps: int = 32,
    seed: int = 0,
    distributed: bool = False,  # BASELINE config #5's "sharded across >=2
    #   hosts": race bank P('env') over the mesh (whole races stay on one
    #   device — the flat agent batch is race-major, so contiguous shards
    #   align), params replicated, grads pmean over ICI/DCN
    log_dir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 100,
    resume: bool = False,
    hidden=(128, 128),
    learning_rate: float = 3e-4,
    print_every: int = 10,
    scan_chunk: int = 25,
    gate_size: float = 5.0,  # gate curriculum lever: train big -> resume
    #   small (checkpoints carry only net/opt/env state, so a resumed run
    #   can shrink the gates the policy must thread)
    max_episode_steps: int = 2000,  # laps-per-episode ceiling
    agent_collision_radius: float = 0.35,  # curriculum lever like
    #   gate_size: train with contact off (0) -> resume at the standard
    #   radius (VERDICT r3 #4: collision pressure destabilizes late training)
    w_overtake: float = 0.0,  # opponent-conditioned reward (multi_race)
    others_in_obs: bool = True,  # False = opponent-relpos ablation
    permute_spawns: bool = False,  # per-episode random slot assignment
    #   (multi_race.permute_spawns — the VERDICT r4 #4 role-lock-in fix)
) -> TrainResult:
    """Shared-policy PPO on the multi-agent race env (BASELINE config #5).

    All agents share one ActorCritic; the learner sees a flat
    (num_envs * n_agents) batch through make_shared_policy_env_step. The
    logged info carries mean gates_passed and the per-step gate-passing
    rate so the learning signal the task is ABOUT (racing through gates,
    the scale-up of the reference's toy ma_com_simple_env) is measured,
    not just reward.
    """
    from fpyv_tpu.envs.multi_race import (
        MultiRaceEnv, make_shared_policy_env_step)

    env = MultiRaceEnv(n_agents=n_agents, gate_size=gate_size,
                       max_episode_steps=max_episode_steps,
                       agent_collision_radius=agent_collision_radius,
                       w_overtake=w_overtake, others_in_obs=others_in_obs,
                       permute_spawns=permute_spawns)
    world = env.default_world()
    env_step, reset_fn = make_shared_policy_env_step(env, world, n_envs=num_envs)
    net = ActorCritic(action_dim=4, hidden=tuple(hidden))
    config = PpoConfig(num_envs=num_envs * n_agents, num_steps=num_steps,
                       learning_rate=learning_rate)

    def race_metrics(env_state):
        gates = env_state.gates_passed.astype(jnp.float32)
        t = jnp.maximum(env_state.t, 1).astype(jnp.float32)[..., None]
        return {
            "mean_gates_passed": gates.mean(),
            # rolling per-step passing rate (x100): robust to auto-resets
            # zeroing the counters mid-stream
            "gates_per_100_steps": (gates / t).mean() * 100.0,
        }

    key = jax.random.key(seed)
    k_env, k_net, k_train = jax.random.split(key, 3)
    env_state, obs = reset_fn(k_env)
    params = net.init(k_net, obs[:1])

    if distributed:
        from fpyv_tpu.parallel.mesh import make_mesh
        from fpyv_tpu.parallel.train import (make_distributed_ppo,
                                             shard_ppo_state)

        mesh = make_mesh()
        if num_envs % mesh.size:
            raise ValueError(f"num_envs={num_envs} must divide the mesh "
                             f"size {mesh.size} (whole races per shard)")
        init, train_iteration = make_distributed_ppo(
            net.apply, env_step, config, mesh, metrics_fn=race_metrics)
        state = init(params, env_state, obs,
                     jax.random.split(k_train, mesh.size))
        state = shard_ppo_state(state, mesh)
    else:
        init, train_iteration = make_ppo(net.apply, env_step, config,
                                         metrics_fn=race_metrics)
        state = init(params, env_state, obs, k_train)

    start_iter = 0
    if resume and checkpoint_dir and latest_step(checkpoint_dir) is not None:
        start_iter = latest_step(checkpoint_dir)
        state = restore_checkpoint(checkpoint_dir, start_iter, template=state)
        print(f"resumed from checkpoint at iteration {start_iter}")

    return _train_loop(
        state, train_iteration, num_envs=num_envs * n_agents,
        num_steps=num_steps, num_iterations=num_iterations,
        start_iter=start_iter, scan_chunk=scan_chunk, log_dir=log_dir,
        print_every=print_every, checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
    )


def train_es(
    env_name: str = "acro",
    num_envs: int = 256,  # eval envs per candidate (fitness batch)
    num_iterations: int = 400,  # generations
    num_steps: int = 60,  # rollout horizon per fitness evaluation
    n_perturbations: int = 128,  # population = 2x this (antithetic pairs)
    fitness_tail: Optional[int] = None,  # mean reward over the last N steps
    #   (None = whole rollout; BENCH: terminal-error fitness learns the
    #    attitude task far faster than path-average)
    seed: int = 0,
    distributed: bool = False,
    randomize: bool = False,
    noise_std: float = 0.05,
    learning_rate: float = 0.02,
    sigma_decay: float = 1.0,
    hidden=(64, 64),
    log_dir: Optional[str] = None,
    print_every: int = 10,
    scan_chunk: int = 50,  # generations per device call
) -> TrainResult:
    """Evolutionary-strategies trainer: gradient-free NES on the policy.

    The reference's evolutionary-search sketch (tests/monte_carlo_search.py:
    8-29) scaled up: every generation evaluates 2*n_perturbations candidate
    policies, each on its own bank of ``num_envs`` vectorized envs — one
    device program per ``scan_chunk`` generations. With ``distributed`` the
    POPULATION axis shards over the device mesh (each chip rolls out its
    slice of the candidates; pure DP — see rl/es.py make_policy_es).

    The deterministic policy is tanh(actor mean) of the same ActorCritic
    net PPO uses, so ES and PPO are directly comparable on a task.
    """
    from fpyv_tpu.rl.es import make_policy_es

    if env_name == "acro":
        env = AcroEnv(params=DroneParams(att_mode="quat"), randomize=randomize)
        world = env.default_world()
        action_dim = 4

        def reset_fn(k):
            return env.reset(k, world)

        def step_fn(s, a):
            return env.step(s, a, world)

    elif env_name == "rotate":
        from fpyv_tpu.envs.rotate import RotateEnv

        env = RotateEnv()
        action_dim = 3
        reset_fn = env.reset
        step_fn = env.step
    else:
        raise ValueError(f"unknown env for ES: {env_name!r}")

    net = ActorCritic(action_dim=action_dim, hidden=tuple(hidden))
    key = jax.random.key(seed)
    k_net, k_train = jax.random.split(key)
    _, obs0 = reset_fn(jax.random.key(0))
    params = net.init(k_net, obs0.reshape(1, -1))

    tail = num_steps if fitness_tail is None else min(fitness_tail, num_steps)

    def fitness(p, k):
        env_state, obs = jax.vmap(reset_fn)(jax.random.split(k, num_envs))

        def body(carry, _):
            env_state, obs = carry
            mean, _, _ = net.apply(p, obs.reshape(obs.shape[0], -1))
            env_state, obs, r, d, _ = jax.vmap(step_fn)(
                env_state, jnp.tanh(mean))
            return (env_state, obs), r.mean()

        _, rs = jax.lax.scan(body, (env_state, obs), None, length=num_steps)
        return rs[-tail:].mean()

    mesh = None
    if distributed:
        from fpyv_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    init_state, run_chunk, unravel = make_policy_es(
        params, fitness, n_perturbations=n_perturbations,
        noise_std=noise_std, learning_rate=learning_rate, mesh=mesh,
        sigma_decay=sigma_decay)

    logger = MetricsLogger(log_dir, print_every=print_every)
    meter = Throughput()
    jit_chunk = jax.jit(run_chunk)
    es_state = init_state()
    steps_per_gen = 2 * n_perturbations * num_envs * num_steps

    it, first_fit, last_fit = 0, float("nan"), float("nan")
    first_chunk = True
    while it < num_iterations:
        n = min(scan_chunk, num_iterations - it)
        keys = jax.random.split(jax.random.fold_in(k_train, it), n)
        es_state, hist = jit_chunk(es_state, keys)
        hist = np.asarray(jax.device_get(hist), np.float64)
        if first_chunk:
            first_fit = float(hist[0])
            meter.reset()  # exclude the compile chunk from throughput
            first_chunk = False
        else:
            meter.add(steps_per_gen * n)
        last_fit = float(hist[-1])
        for i in range(n):
            logger.log(it + i, {"gen_best_fitness": hist[i]})
        it += n
    logger.close()

    return TrainResult(
        iterations=num_iterations,
        mean_reward_first=first_fit,
        mean_reward_last=last_fit,
        steps_per_second=meter.rate(),
    )


def train_sac(
    num_envs: int = 1024,
    num_iterations: int = 4000,  # env steps (each = num_envs transitions)
    warmup_steps: int = 50,  # uniform-random exploration steps
    seed: int = 0,
    randomize: bool = False,
    buffer_capacity: int = 500_000,
    batch_size: int = 2048,
    updates_per_step: int = 8,  # synchronized 1024-env collection is
    #   data-rich/update-poor: 1 update/step plateaus at reward -0.19 while
    #   8 updates reach +0.02 (PPO-level) — BENCH.md round 3
    hidden=(128, 128),
    log_dir: Optional[str] = None,
    print_every: int = 100,
    scan_chunk: int = 100,  # env steps per device call
) -> TrainResult:
    """Off-policy SAC on the acro env at PPO-comparable scale (the second
    learner family; VERDICT r2 weak #6: demonstrated, not demo-grade).

    One "iteration" = one synchronized env step across the bank (num_envs
    transitions into the HBM-resident replay) + ``updates_per_step``
    critic/actor/temperature updates on a sampled batch. The whole
    collect->store->sample->update loop scans on device in
    ``scan_chunk``-step programs, like every other trainer here.
    """
    from fpyv_tpu.models.policy import SquashedGaussianActor, TwinQNetwork
    from fpyv_tpu.rl.sac import SacConfig, make_sac

    env = AcroEnv(params=DroneParams(att_mode="quat"), randomize=randomize)
    world = env.default_world()
    actor = SquashedGaussianActor(action_dim=4, hidden=tuple(hidden))
    critic = TwinQNetwork(hidden=tuple(hidden))
    config = SacConfig(num_envs=num_envs, buffer_capacity=buffer_capacity,
                       batch_size=batch_size,
                       updates_per_step=updates_per_step)

    def env_step(env_state, action, key):
        st, obs, reward, done, info = jax.vmap(
            lambda s, a: env.step(s, a, world))(env_state, action)
        # done = terminations only (bootstrap at time limits); the replay
        # stores the PRE-reset successor at truncations so the Q target
        # bootstraps from the true next state, not the respawn (ADVICE r3)
        store_obs = jnp.where(info["truncated"][..., None],
                              info["final_obs"], obs)
        return st, obs, reward, info["crashed"], store_obs

    key = jax.random.key(seed)
    k_env, k_a, k_c, k_train = jax.random.split(key, 4)
    env_keys = jax.random.split(k_env, num_envs)
    env_state, obs = jax.vmap(lambda k: env.reset(k, world))(env_keys)
    a_params = actor.init(k_a, obs[:1])
    c_params = critic.init(k_c, obs[:1], jnp.zeros((1, 4), obs.dtype))
    init, train_step = make_sac(actor.apply, critic.apply, env_step, config,
                                obs_dim=obs.shape[-1], action_dim=4)
    state = init(a_params, c_params, env_state, obs, k_train)

    def scan_steps(state, n, random_actions):
        def body(st, _):
            return train_step(st, random_actions=random_actions)

        return jax.lax.scan(body, state, None, length=n)

    jit_scan = jax.jit(scan_steps, static_argnums=(1, 2))

    logger = MetricsLogger(log_dir, print_every=print_every)
    meter = Throughput()
    first_reward = last_reward = float("nan")
    state, _ = jit_scan(state, warmup_steps, True)

    it, first_chunk = 0, True
    while it < num_iterations:
        n = min(scan_chunk, num_iterations - it)
        state, infos = jit_scan(state, n, False)
        infos = jax.device_get(infos)
        rewards = np.asarray(infos["mean_reward"], np.float64)
        if first_chunk:
            first_reward = float(rewards[0])
            meter.reset()  # exclude the compile chunk from throughput
            first_chunk = False
        else:
            meter.add(num_envs * n)
        last_reward = float(rewards[-1])
        for i in range(n):
            if (it + i) % print_every == 0:
                logger.log(it + i, jax.tree.map(lambda x: x[i], infos))
        it += n
    logger.close()

    return TrainResult(
        iterations=num_iterations,
        mean_reward_first=first_reward,
        mean_reward_last=last_reward,
        steps_per_second=meter.rate(),
    )


def _train_vision_race_kernel(
    venv, keys, *, num_envs, num_iterations, num_steps, log_dir,
    checkpoint_dir, checkpoint_every, resume, learning_rate, print_every,
    scan_chunk, num_minibatches, update_epochs, ent_coef, compute_dtype,
    patch_pool=1, adam_mu_dtype=None, e_blk=32, exact_logprob=True,
) -> TrainResult:
    """train_vision_race's rollout='kernel' path: the race policy-in-kernel
    rollout (ops/pallas_race) feeding the unchanged XLA PPO learner.

    The PPO carry's env_state is ``(cols (N, RROWS), hist)``; checkpoints
    interoperate with the scan path at the PARAMS level (identical net
    parameter tree — a kernel-trained racer evaluates through
    apps/play.play_policy's scan env and vice versa), not at the env-state
    level."""
    from fpyv_tpu.models.policy import PixelActorCritic
    from fpyv_tpu.ops.pallas_race import make_kernel_race_ppo_parts

    k_env, k_net, k_train = keys
    world = venv.default_world()
    net = PixelActorCritic(action_dim=4, torso="patch", prepatched=True,
                           compute_dtype=compute_dtype,
                           patch_pool=patch_pool)
    config = PpoConfig(num_envs=num_envs, num_steps=num_steps,
                       learning_rate=learning_rate,
                       num_minibatches=num_minibatches,
                       update_epochs=update_epochs, ent_coef=ent_coef,
                       adam_mu_dtype=adam_mu_dtype)
    interpret = jax.default_backend() != "tpu"
    (apply_fn, make_rollout_fn, obs_from_carry, init_carry,
     race_metrics) = make_kernel_race_ppo_parts(
        venv, world, net, num_envs, e_blk=e_blk, interpret=interpret)

    carry = init_carry(jax.random.split(k_env, num_envs))
    obs0 = obs_from_carry(carry)
    params = net.init(
        k_net,
        obs0["pixels"][:1].reshape(1, -1, venv.frame_stack * 64),
        obs0["proprio"][:1])

    init, train_iteration = make_ppo(
        apply_fn, None, config,
        rollout_fn=make_rollout_fn(num_steps, compute_dtype=compute_dtype,
                                   exact_logprob=exact_logprob,
                                   patch_pool=patch_pool),
        metrics_fn=race_metrics)
    state = init(params, carry, obs0, k_train)

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


def train_vision_race(
    num_envs: int = 1024,  # race instances (learner batch = num_envs * A)
    n_agents: int = 1,  # >1 = multi-agent vision racing: every agent sees
    #   its own FPV view with the OTHERS rendered as spheres in it
    num_iterations: int = 300,
    num_steps: int = 32,
    seed: int = 0,
    distributed: bool = False,  # race bank + pixel-obs pytree P('env') over
    #   the mesh; same layout notes as train_race (whole races per shard)
    log_dir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 100,
    resume: bool = False,
    learning_rate: float = 3e-4,
    print_every: int = 10,
    scan_chunk: int = 20,
    num_minibatches: int = 8,
    update_epochs: int = 2,
    gate_size: float = 5.0,
    max_episode_steps: int = 2000,
    frame_width: float = 0.35,
    torso: str = "patch",
    compute_dtype="bf16",
    ent_coef: float = 0.01,  # pixels give a harder exploration problem
    #   than state obs: at PPO's default 0.001 the policy's entropy
    #   collapses (-3.5 nats) while still at ~1.5 gates/episode
    gate_onehot: bool = True,  # False = race from pixels + IMU alone
    frame_stack: int = 1,  # stack the last K depth frames as the pixel obs
    #   (temporal memory for the pure-pixels racer, VERDICT r3 #3)
    agent_collision_radius: float = 0.35,  # collision curriculum lever
    w_overtake: float = 0.0,  # opponent-conditioned reward term
    permute_spawns: bool = False,  # per-episode random spawn-slot
    #   assignment (multi_race.permute_spawns — the r4 role-lock-in fix)
    show_opponents: bool = True,  # False = in-frame opponent ablation
    n_obstacles: int = 0,  # moving obstacle spheres orbiting the track
    #   (rendered in the FPV frame; contact = crash)
    obstacle_period: int = 600,  # steps per obstacle revolution
    rollout: str = "auto",  # "kernel" = the race policy-in-kernel rollout
    #   (ops/pallas_race): render + K-frame stack + patch-embed actor +
    #   full race step (gate passing, obstacles, respawn) fused as ONE
    #   pallas launch, weights VMEM-resident. Requires n_agents == 1,
    #   torso='patch', no distributed/gru. "scan" = the XLA per-step
    #   rollout. "auto" picks the kernel exactly when supported (round-5
    #   receipts: 1.33x at the frame-stacked flagship recipe — 293K vs
    #   221K env-steps/s — and convergence within the seed-noise band on
    #   the 4-seed 600-iteration A/B, kernel medians AUC 3.07 / last50
    #   7.8 gates vs scan 1.93 / 4.3; runs/r5/race_kernel_ab*).
    patch_pool: int = 1,  # pooled-patch fc (models/policy.patch_pool)
    adam_mu_dtype: Optional[str] = None,  # "bf16" adam first moment
    e_blk: int = 32,  # (rollout='kernel') envs per kernel program
    kernel_exact_logprob: bool = False,  # see train_vision (round-5 A/B)
    gru: int = 0,  # recurrent temporal memory (VERDICT r4 #6): a GRU of
    #   this width between torso and heads (models/policy.PixelActorCritic
    #   .gru) trained with the sequence-minibatched recurrent PPO
    #   (rl/ppo.make_recurrent_ppo). The alternative to frame_stack — frame
    #   stacking measured NEGATIVE at 4 agents (runs/r4/ma4_fs4), so
    #   multi-agent racing needs a recurrent mechanism. Scan rollout only.
    rig=None,  # camera rig override (tests use a small one)
) -> TrainResult:
    """Gate racing from PIXELS (BASELINE config #4's "gate/track markers"
    clause): single-drone MultiRaceEnv whose observation is the rendered
    FPV depth view of the gate track (envs/vision_race.py), trained with
    the same patch-torso/u8/2-epoch PPO recipe as train_vision. Logs
    gates_passed so the racing signal is measured, not just reward."""
    from fpyv_tpu.envs.multi_race import MultiRaceEnv
    from fpyv_tpu.envs.vision_race import VisionRaceEnv
    from fpyv_tpu.models.policy import PixelActorCritic

    env = VisionRaceEnv(
        race=MultiRaceEnv(n_agents=n_agents, gate_size=gate_size,
                          max_episode_steps=max_episode_steps,
                          agent_collision_radius=agent_collision_radius,
                          w_overtake=w_overtake, n_obstacles=n_obstacles,
                          obstacle_period=obstacle_period,
                          permute_spawns=permute_spawns),
        frame_width=frame_width, gate_onehot=gate_onehot,
        frame_stack=frame_stack, show_opponents=show_opponents,
        **({"rig": rig} if rig is not None else {}))
    if rollout == "auto":
        supported = (n_agents == 1 and torso == "patch"
                     and not distributed and not gru)
        rollout = "kernel" if supported else "scan"
    if gru and rollout == "kernel":
        raise ValueError("gru runs on the scan rollout (the kernel's "
                         "temporal mechanism is the K-frame stack)")
    if gru and distributed:
        raise ValueError("gru + distributed is not wired yet")
    if rollout == "kernel":
        if n_agents != 1:
            raise ValueError("rollout='kernel' is single-agent (multi-agent "
                             "FPV views read cross-env opponent positions)")
        if torso != "patch" or distributed:
            raise ValueError("rollout='kernel' requires torso='patch' and "
                             "no distributed")
        key = jax.random.key(seed)
        k_env, k_net, k_train = jax.random.split(key, 3)
        return _train_vision_race_kernel(
            venv=env, keys=(k_env, k_net, k_train), num_envs=num_envs,
            num_iterations=num_iterations, num_steps=num_steps,
            log_dir=log_dir, checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every, resume=resume,
            learning_rate=learning_rate, print_every=print_every,
            scan_chunk=scan_chunk, num_minibatches=num_minibatches,
            update_epochs=update_epochs, ent_coef=ent_coef,
            compute_dtype=jnp.bfloat16 if compute_dtype == "bf16" else None,
            patch_pool=patch_pool, adam_mu_dtype=adam_mu_dtype, e_blk=e_blk,
            exact_logprob=kernel_exact_logprob)
    world = env.default_world()
    net = PixelActorCritic(
        action_dim=4, torso=torso, patch_pool=patch_pool, gru=gru,
        compute_dtype=jnp.bfloat16 if compute_dtype == "bf16" else None)
    config = PpoConfig(num_envs=num_envs * n_agents, num_steps=num_steps,
                       learning_rate=learning_rate,
                       num_minibatches=num_minibatches,
                       update_epochs=update_epochs, ent_coef=ent_coef,
                       adam_mu_dtype=adam_mu_dtype)

    def proprio(obs):
        return jnp.concatenate(
            [obs["rates"], obs["accel_z"], obs["thrust"],
             obs["gate_onehot"]], axis=-1)

    def apply_fn(params, obs):
        return net.apply(params, obs["pixels"], proprio(obs))

    def env_step(env_state, action, key):
        st, obs, reward, done, info = env.step_batched(env_state, action,
                                                       world)
        return st, obs, reward, info["crashed"]

    def race_metrics(env_state):
        rs = getattr(env_state, "race", env_state)  # frame-stacked carry
        gates = rs.gates_passed.astype(jnp.float32)
        t = jnp.maximum(rs.t, 1).astype(jnp.float32)[..., None]
        return {
            "mean_gates_passed": gates.mean(),
            "gates_per_100_steps": (gates / t).mean() * 100.0,
        }

    key = jax.random.key(seed)
    k_env, k_net, k_train = jax.random.split(key, 3)
    env_state, obs = env.reset_batched(jax.random.split(k_env, num_envs),
                                       world)
    if gru:
        from fpyv_tpu.rl.ppo import make_recurrent_ppo

        hidden0 = jnp.zeros((num_envs * n_agents, gru), jnp.float32)
        params = net.init(k_net, obs["pixels"][:1], proprio(obs)[:1],
                          hidden0[:1])

        def apply_fn_r(params, obs, hidden):
            return net.apply(params, obs["pixels"], proprio(obs), hidden)

        init, train_iteration = make_recurrent_ppo(
            apply_fn_r, env_step, config, metrics_fn=race_metrics)
        state = init(params, env_state, obs, hidden0, k_train)

        start_iter = 0
        if (resume and checkpoint_dir
                and latest_step(checkpoint_dir) is not None):
            start_iter = latest_step(checkpoint_dir)
            state = restore_checkpoint(checkpoint_dir, start_iter,
                                       template=state)
            print(f"resumed from checkpoint at iteration {start_iter}")

        return _train_loop(
            state, train_iteration, num_envs=num_envs * n_agents,
            num_steps=num_steps, num_iterations=num_iterations,
            start_iter=start_iter, scan_chunk=scan_chunk, log_dir=log_dir,
            print_every=print_every, checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
        )
    params = net.init(k_net, obs["pixels"][:1], proprio(obs)[:1])
    if distributed:
        from fpyv_tpu.parallel.mesh import make_mesh
        from fpyv_tpu.parallel.train import (make_distributed_ppo,
                                             shard_ppo_state)

        mesh = make_mesh()
        if num_envs % mesh.size:
            raise ValueError(f"num_envs={num_envs} must divide the mesh "
                             f"size {mesh.size} (whole races per shard)")
        init, train_iteration = make_distributed_ppo(
            apply_fn, env_step, config, mesh, metrics_fn=race_metrics)
        state = init(params, env_state, obs,
                     jax.random.split(k_train, mesh.size))
        state = shard_ppo_state(state, mesh)
    else:
        init, train_iteration = make_ppo(apply_fn, env_step, config,
                                         metrics_fn=race_metrics)
        state = init(params, env_state, obs, k_train)

    start_iter = 0
    if resume and checkpoint_dir and latest_step(checkpoint_dir) is not None:
        start_iter = latest_step(checkpoint_dir)
        state = restore_checkpoint(checkpoint_dir, start_iter, template=state)
        print(f"resumed from checkpoint at iteration {start_iter}")

    return _train_loop(
        state, train_iteration, num_envs=num_envs * n_agents,
        num_steps=num_steps,
        num_iterations=num_iterations, start_iter=start_iter,
        scan_chunk=scan_chunk, log_dir=log_dir, print_every=print_every,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
    )


def _train_vision_kernel(
    venv, worlds, bank, keys, *, num_envs, num_iterations, num_steps,
    log_dir, checkpoint_dir, checkpoint_every, resume, learning_rate,
    print_every, scan_chunk, num_minibatches, update_epochs, compute_dtype,
    exact_logprob=True, patch_pool=1, adam_mu_dtype=None, e_blk=32,
) -> TrainResult:
    """train_vision's rollout='kernel' path: the policy-in-kernel pallas
    rollout (ops/pallas_policy) feeding the unchanged XLA PPO learner.

    The PPO carry's env_state is the kernel's raw (N, ROWS) env-major state
    matrix; checkpoints therefore interoperate with the scan path at the
    params level (same net parameters) but not at the env-state level."""
    from fpyv_tpu.models.policy import PixelActorCritic
    from fpyv_tpu.ops.pallas_policy import (
        acro_state_to_cols, make_kernel_vision_ppo_parts)

    k_env, k_net, k_train = keys
    net = PixelActorCritic(action_dim=4, torso="patch", prepatched=True,
                           compute_dtype=compute_dtype,
                           patch_pool=patch_pool)
    config = PpoConfig(num_envs=num_envs, num_steps=num_steps,
                       learning_rate=learning_rate,
                       num_minibatches=num_minibatches,
                       update_epochs=update_epochs,
                       adam_mu_dtype=adam_mu_dtype)
    interpret = jax.default_backend() != "tpu"
    apply_fn, make_rollout_fn, obs_from_cols = make_kernel_vision_ppo_parts(
        venv, worlds, net, num_envs, e_blk=e_blk, interpret=interpret)

    env_keys = jax.random.split(k_env, num_envs)
    env_state, obs = venv.reset_batched(env_keys, worlds, bank)
    cols = acro_state_to_cols(env_state)
    obs0 = obs_from_cols(cols)
    params = net.init(
        k_net,
        obs0["pixels"][:1].reshape(1, -1, 64).astype(jnp.uint8),
        obs0["proprio"][:1])

    init, train_iteration = make_ppo(
        apply_fn, None, config,
        rollout_fn=make_rollout_fn(num_steps, compute_dtype=compute_dtype,
                                   exact_logprob=exact_logprob))
    state = init(params, cols, obs0, k_train)

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


def train_vision(
    num_envs: int = 1024,
    num_iterations: int = 100,
    num_steps: int = 32,
    seed: int = 0,
    distributed: bool = False,
    log_dir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 50,
    resume: bool = False,
    randomize_worlds: bool = True,
    rig=None,
    learning_rate: float = 3e-4,
    print_every: int = 10,
    scan_chunk: int = 20,
    num_minibatches: int = 8,
    update_epochs: int = 2,
    renderer: str = "raycast",
    target_only: bool = False,
    compute_dtype="bf16",  # image-torso compute: 'bf16' (default) | 'f32'
    torso: str = "patch",  # image torso: 'patch' | 'conv' (models/policy.py)
    pixel_store: str = "u8",  # rollout pixel storage: 'u8' | 'f32' (u8 is
    #   numerically exact and 4x less HBM through the shuffle/minibatch path)
    # Defaults = the measured round-3 winner (BENCH.md): patch torso + u8
    # storage + 2 epochs trains at 436K env-steps/s (2.58x the round-2
    # conv/f32/4-epoch default) and converges BETTER on the 400-iteration
    # seed-matched A/B (last-50 reward -0.0115 vs -0.0212, crash rate 3x
    # lower). torso="conv", pixel_store="f32", update_epochs=4 restores the
    # old path exactly.
    curriculum_iters: Optional[int] = None,  # ramp world difficulty 0 -> 1
    #   over this many iterations (obstacle count/size; requires
    #   randomize_worlds); worlds resample every chunk at the ramped level
    patch_pool: int = 1,  # pooled-patch fc (models/policy.patch_pool):
    #   groups of N consecutive patch embeddings mix through one
    #   Dense(embed) before the fc, shrinking the learner's biggest matmul
    #   contraction N-fold (VERDICT r4 #1). 1 = original architecture.
    adam_mu_dtype: Optional[str] = None,  # "bf16" stores adam's first
    #   moment in bfloat16 (rl/ppo.PpoConfig.adam_mu_dtype)
    e_blk: int = 32,  # (rollout='kernel') envs per kernel program instance.
    #   e_blk=64 compiles with patch_pool=4 (runs/r5/kernel_eblk2) but buys
    #   only 1.07x rollout — the render bounds the kernel, not the fc — so
    #   32 stays default with the unchanged architecture
    kernel_exact_logprob: bool = False,  # (rollout='kernel') True recomputes
    #   log_prob/value with the XLA forward over stored obs (epoch-0 ratio
    #   exactly 1); False (default since round 5) trusts the kernel's own
    #   bf16 emissions — 1.12x end-to-end (545K vs 488K env-steps/s) with
    #   convergence within noise on the 3-seed 400-iteration A/B
    #   (runs/r5/learner_ab: AUC -0.0545 vs -0.0533, last50 -0.0259 vs
    #   -0.0263). The 1.45x fastlp+mu+e1 arm LOST convergence on all 3
    #   seeds (AUC -0.0855) and stays opt-in.
    rollout: str = "auto",  # "kernel" = the policy-IN-KERNEL rollout
    #   (ops/pallas_policy): render + patch-embed actor + sample + env step
    #   fused as ONE pallas launch per rollout, weights VMEM-resident,
    #   frames streamed out as uint8 levels; log_prob/value recomputed in
    #   one batched (T*N) forward. Requires torso='patch',
    #   renderer='raycast', no distributed/curriculum (worlds bake into the
    #   kernel's world columns). "scan" = the XLA per-step rollout.
    #   "auto" (default) picks the kernel exactly when supported — the
    #   400-iteration seed-matched A/B measured it 1.12x the scan rollout
    #   at the same 2-epoch recipe WITH equal-or-better convergence
    #   (BENCH.md round 4) — and silently falls back to scan otherwise.
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

    from fpyv_tpu.world.randomize import curriculum_worlds

    env = VisionAcroEnv(renderer=renderer, target_only=target_only,
                        pixel_dtype=pixel_store,
                        **({"rig": rig} if rig is not None else {}))
    key = jax.random.key(seed)
    k_world, k_env, k_net, k_train = jax.random.split(key, 4)
    if curriculum_iters and not randomize_worlds:
        raise ValueError("curriculum_iters requires randomize_worlds=True")
    jit_curriculum = jax.jit(
        lambda k, d: curriculum_worlds(k, num_envs, d))
    if randomize_worlds:
        worlds, bank = env.make_randomized_worlds(k_world, num_envs)
        if curriculum_iters:
            worlds = jit_curriculum(k_world, 0.0)
    else:
        world, bank = env.make_world()
        worlds = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), world)

    cdt = jnp.bfloat16 if compute_dtype == "bf16" else None
    if rollout == "auto":
        supported = (torso == "patch" and renderer == "raycast"
                     and not target_only and not distributed
                     and not curriculum_iters)
        rollout = "kernel" if supported else "scan"
    if rollout == "kernel":
        if torso != "patch" or renderer != "raycast":
            raise ValueError("rollout='kernel' requires torso='patch' and "
                             "renderer='raycast'")
        if distributed or curriculum_iters:
            raise ValueError("rollout='kernel' does not compose with "
                             "distributed/curriculum yet (worlds bake into "
                             "the kernel's world columns)")
        import dataclasses

        # the kernel integrates attitude as a quaternion (same R
        # trajectories — physics parity tests); obs carries no attitude,
        # so the trained task is identical to the rotmat scan path
        env = dataclasses.replace(
            env, acro=dataclasses.replace(
                env.acro, params=DroneParams(att_mode="quat")))
        return _train_vision_kernel(
            venv=env, worlds=worlds, bank=bank, keys=(k_env, k_net, k_train),
            num_envs=num_envs, num_iterations=num_iterations,
            num_steps=num_steps, log_dir=log_dir,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
            resume=resume, learning_rate=learning_rate,
            print_every=print_every, scan_chunk=scan_chunk,
            num_minibatches=num_minibatches, update_epochs=update_epochs,
            compute_dtype=cdt, exact_logprob=kernel_exact_logprob,
            patch_pool=patch_pool, adam_mu_dtype=adam_mu_dtype, e_blk=e_blk)
    net = PixelActorCritic(
        action_dim=4, torso=torso,
        compute_dtype=cdt, patch_pool=patch_pool)
    config = PpoConfig(num_envs=num_envs, num_steps=num_steps,
                       learning_rate=learning_rate,
                       num_minibatches=num_minibatches,
                       update_epochs=update_epochs,
                       adam_mu_dtype=adam_mu_dtype)

    def apply_fn(params, obs):
        proprio = jnp.concatenate(
            [obs["rates"], obs["accel_z"], obs["thrust"]], axis=-1)
        return net.apply(params, obs["pixels"], proprio)

    # worlds ride the PPO carry: the curriculum hook swaps them between
    # chunks as DATA (a closure capture would bake them into the compiled
    # program as constants -> recompile on every swap)
    def env_step(carry, action, key):
        env_state, w = carry
        st, obs, reward, done, info = env.step_batched(
            env_state, action, w, bank)
        return (st, w), obs, reward, info["crashed"]

    env_keys = jax.random.split(k_env, num_envs)
    env_state, obs = env.reset_batched(env_keys, worlds, bank)
    params = net.init(k_net, obs["pixels"][:1],
                      jnp.concatenate([obs["rates"][:1], obs["accel_z"][:1],
                                       obs["thrust"][:1]], axis=-1))

    mesh = None
    if distributed:
        # same layout as train_acro's distributed path: env bank (and the
        # per-env worlds riding the carry) sharded P('env'), params
        # replicated, grads pmean over ICI. The obs pytree ({pixels, rates,
        # accel_z, thrust}) and the (env_state, worlds) carry shard by
        # pytree-prefix specs — BASELINE config #4's "sharded across hosts"
        # clause for the pixel-observation trainer.
        from fpyv_tpu.parallel.mesh import make_mesh
        from fpyv_tpu.parallel.train import (make_distributed_ppo,
                                             shard_ppo_state)

        mesh = make_mesh()
        init, train_iteration = make_distributed_ppo(
            apply_fn, env_step, config, mesh)
        state = init(params, (env_state, worlds), obs,
                     jax.random.split(k_train, mesh.size))
        state = shard_ppo_state(state, mesh)
    else:
        init, train_iteration = make_ppo(apply_fn, env_step, config)
        state = init(params, (env_state, worlds), obs, k_train)

    start_iter = 0
    if resume and checkpoint_dir and latest_step(checkpoint_dir) is not None:
        start_iter = latest_step(checkpoint_dir)
        state = restore_checkpoint(checkpoint_dir, start_iter, template=state)
        print(f"resumed from checkpoint at iteration {start_iter}")

    chunk_hook = None
    if curriculum_iters:
        def chunk_hook(state, it):
            d = min(1.0, it / curriculum_iters)
            new_worlds = jit_curriculum(jax.random.fold_in(k_world, it),
                                        jnp.float32(d))
            if mesh is not None:
                # resample composes with distributed (VERDICT r3 #5): the
                # freshly built worlds re-place onto the carry's env-axis
                # sharding before riding into the next sharded chunk
                from jax.sharding import NamedSharding, PartitionSpec as P

                from fpyv_tpu.parallel.mesh import ENV_AXIS

                new_worlds = jax.device_put(
                    new_worlds, NamedSharding(mesh, P(ENV_AXIS)))
            env_state, _ = state.env_state
            return state.replace(env_state=(env_state, new_worlds))

    return _train_loop(
        state, train_iteration, num_envs=num_envs, num_steps=num_steps,
        num_iterations=num_iterations, start_iter=start_iter,
        scan_chunk=scan_chunk, log_dir=log_dir, print_every=print_every,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        chunk_hook=chunk_hook,
    )
