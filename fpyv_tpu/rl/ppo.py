"""PPO: clipped-surrogate actor-critic over vectorized env rollouts.

One ``ppo.train_iteration`` = T-step scan rollout over N envs + E epochs of
minibatched updates — a single jitted program. When run under ``shard_map``
over a mesh axis (fpyv_tpu.parallel), gradients are averaged across devices
with ``jax.lax.pmean`` (axis_name passed via config), which XLA lowers to an
all-reduce over ICI; everything else is local to the shard.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fpyv_tpu.rl.gae import compute_gae


@dataclass(frozen=True)
class PpoConfig:
    num_envs: int = 4096
    num_steps: int = 32  # T per rollout
    update_epochs: int = 4
    num_minibatches: int = 8
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    ent_coef: float = 0.001
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    learning_rate: float = 3e-4
    axis_name: Optional[str] = None  # mesh axis for cross-device grad pmean
    # Adam first-moment accumulator dtype: "bf16" halves the optimizer's
    # largest HBM-resident buffer and its per-minibatch read+write traffic
    # (optax's sanctioned mu_dtype knob; the second moment stays f32 — its
    # sqrt is precision-sensitive). None = f32 (exact round-3 optimizer).
    adam_mu_dtype: Optional[str] = None
    # Shuffle granularity in rows of the flattened (T*N) batch. Row gathers
    # serialize on TPU (~1 element/cycle — the same bound as the vision
    # scatter, BENCH.md), so exact per-row shuffling (=1) costs more than the
    # whole backward pass. Blocks of consecutive rows move contiguously; the
    # flattened layout is T-major, so one block = the SAME timestep across
    # `shuffle_block` independent envs — statistically benign mixing.
    shuffle_block: int = 64


@struct.dataclass
class PpoState:
    params: Any
    opt_state: Any
    env_state: Any
    last_obs: jnp.ndarray
    key: jnp.ndarray
    update_count: jnp.ndarray


@struct.dataclass
class Transition:
    obs: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


def gaussian_log_prob(mean, log_std, action):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(
        -0.5 * z**2 - log_std - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1
    )


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)


def make_ppo(
    apply_fn: Callable,  # apply_fn(params, obs) -> (mean, log_std, value)
    env_step: Callable,  # env_step(env_state, action, key) -> (env_state, obs, reward, done)
    config: PpoConfig,
    metrics_fn: Optional[Callable] = None,  # metrics_fn(env_state) -> dict
    rollout_fn: Optional[Callable] = None,  # replaces the default scan
    #   rollout: rollout_fn(state) -> (env_state, last_obs, key, traj)
    #   with traj a (T, N, ...) Transition.  The in-kernel vision rollout
    #   (ops/pallas_policy) collects the trajectory in ONE pallas launch
    #   and recomputes log_prob/value in a single batched forward; the
    #   learner half of the iteration is unchanged.
):
    """Build (init, train_iteration) for a vectorized env.

    ``env_step`` is the vectorized step over the local env bank: actions
    (N, A) in, obs (N, O) / reward (N,) / done (N,) out. Auto-reset must be
    inside it (fpyv_tpu.envs do this). ``metrics_fn`` (optional) maps the
    post-rollout env state to extra scalar metrics merged into the
    iteration info (e.g. the race env's mean gates_passed).
    """
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.learning_rate, eps=1e-5,
                   mu_dtype=(jnp.bfloat16 if config.adam_mu_dtype == "bf16"
                             else None)),
    )

    def init(params, env_state, obs0, key) -> PpoState:
        return PpoState(
            params=params,
            opt_state=tx.init(params),
            env_state=env_state,
            last_obs=obs0,
            key=key,
            update_count=jnp.zeros((), jnp.int32),
        )

    def _policy_sample(params, obs, key):
        mean, log_std, value = apply_fn(params, obs)
        noise = jax.random.normal(key, mean.shape, mean.dtype)
        action = mean + jnp.exp(log_std) * noise
        log_prob = gaussian_log_prob(mean, log_std, action)
        return action, log_prob, value

    def _rollout(state: PpoState):
        def body(carry, _):
            env_state, obs, key = carry
            key, ka, ks = jax.random.split(key, 3)
            action, log_prob, value = _policy_sample(state.params, obs, ka)
            env_state, next_obs, reward, done = env_step(env_state, action, ks)
            t = Transition(
                obs=obs, action=action, log_prob=log_prob,
                value=value, reward=reward, done=done,
            )
            return (env_state, next_obs, key), t

        (env_state, last_obs, key), traj = jax.lax.scan(
            body, (state.env_state, state.last_obs, state.key),
            None, length=config.num_steps,
        )
        return env_state, last_obs, key, traj

    def _loss(params, batch: Transition, advantages, targets):
        mean, log_std, value = apply_fn(params, batch.obs)
        log_prob = gaussian_log_prob(mean, log_std, batch.action)
        ratio = jnp.exp(log_prob - batch.log_prob)
        adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        pg1 = ratio * adv
        pg2 = jnp.clip(ratio, 1.0 - config.clip_eps, 1.0 + config.clip_eps) * adv
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))
        v_clipped = batch.value + jnp.clip(
            value - batch.value, -config.clip_eps, config.clip_eps
        )
        v_loss = 0.5 * jnp.mean(
            jnp.maximum((value - targets) ** 2, (v_clipped - targets) ** 2)
        )
        ent = jnp.mean(gaussian_entropy(log_std))
        total = pg_loss + config.vf_coef * v_loss - config.ent_coef * ent
        return total, {
            "pg_loss": pg_loss, "v_loss": v_loss, "entropy": ent,
            "approx_kl": jnp.mean(batch.log_prob - log_prob),
        }

    def train_iteration(state: PpoState):
        env_state, last_obs, key, traj = (
            _rollout(state) if rollout_fn is None else rollout_fn(state))
        _, _, last_value = apply_fn(state.params, last_obs)
        advantages, targets = compute_gae(
            traj.reward, traj.value, traj.done, last_value,
            config.gamma, config.gae_lambda,
        )

        # flatten (T, N, ...) -> (T*N, ...)
        def flat(x):
            return x.reshape((-1,) + x.shape[2:])

        batch = jax.tree.map(flat, traj)
        advantages, targets = flat(advantages), flat(targets)
        # obs may be a pytree (e.g. {pixels, proprio} in the vision envs)
        batch_size = config.num_steps * jax.tree.leaves(last_obs)[0].shape[0]
        mb_size = batch_size // config.num_minibatches
        block = max(1, config.shuffle_block)
        if batch_size % (block * config.num_minibatches) != 0:
            block = 1  # fall back to exact row shuffle for odd shapes
        n_blocks = batch_size // block

        def epoch(carry, _):
            params, opt_state, key = carry
            key, kp = jax.random.split(key)
            perm = jax.random.permutation(kp, n_blocks)

            def shuffle(x):
                xb = x.reshape((n_blocks, block) + x.shape[1:])
                return xb[perm].reshape((batch_size,) + x.shape[1:])

            shuffled = jax.tree.map(shuffle, batch)
            adv_sh, tgt_sh = shuffle(advantages), shuffle(targets)

            def minibatch(carry, idx):
                params, opt_state = carry
                sl = lambda x: jax.lax.dynamic_slice_in_dim(
                    x, idx * mb_size, mb_size)
                mb = jax.tree.map(sl, shuffled)
                mb_adv, mb_tgt = sl(adv_sh), sl(tgt_sh)
                (loss, metrics), grads = jax.value_and_grad(
                    _loss, has_aux=True)(params, mb, mb_adv, mb_tgt)
                if config.axis_name is not None:
                    grads = jax.lax.pmean(grads, config.axis_name)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, metrics)

            (params, opt_state), (losses, metrics) = jax.lax.scan(
                minibatch, (params, opt_state),
                jnp.arange(config.num_minibatches),
            )
            return (params, opt_state, key), (losses, metrics)

        (params, opt_state, key), (losses, metrics) = jax.lax.scan(
            epoch, (state.params, state.opt_state, key),
            None, length=config.update_epochs,
        )

        new_state = PpoState(
            params=params, opt_state=opt_state, env_state=env_state,
            last_obs=last_obs, key=key,
            update_count=state.update_count + 1,
        )
        info = {
            "loss": losses.mean(),
            "mean_reward": traj.reward.mean(),
            "mean_episode_done": traj.done.mean(),
            **{k: v.mean() for k, v in metrics.items()},
        }
        if metrics_fn is not None:
            info.update(metrics_fn(env_state))
        return new_state, info

    return init, train_iteration


def make_recurrent_ppo(
    apply_fn: Callable,  # apply_fn(params, obs, hidden) ->
    #   (mean, log_std, value, hidden')
    env_step: Callable,  # env_step(env_state, action, key) ->
    #   (env_state, obs, reward, done)
    config: PpoConfig,
    metrics_fn: Optional[Callable] = None,
):
    """Recurrent PPO (VERDICT r4 #6): a GRU policy over vectorized envs.

    Differences from ``make_ppo``:

    - ``apply_fn`` threads a hidden state; the rollout carries it per env
      and zeroes it where ``done`` fires (``done`` doubles as the hidden
      reset mask, so pass EPISODE BOUNDARIES — the vision race env's
      flattened ``crashed`` already includes whole-race resets).
    - The hidden rides ``PpoState.env_state`` as ``(env_state, hidden)``;
      checkpoints capture it like any other carry leaf.
    - The learner is SEQUENCE-minibatched: minibatches are subsets of envs
      with their full T-step sequences (the flattened-row shuffle of the
      feedforward learner would detach steps from the hidden chain). Each
      epoch re-scans every sequence from the iteration's initial hidden,
      replaying the rollout's resets from ``batch.done`` — truncated BPTT
      with the rollout length T as the window.
    """
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.learning_rate, eps=1e-5,
                   mu_dtype=(jnp.bfloat16 if config.adam_mu_dtype == "bf16"
                             else None)),
    )

    def init(params, env_state, obs0, hidden0, key) -> PpoState:
        return PpoState(
            params=params,
            opt_state=tx.init(params),
            env_state=(env_state, hidden0),
            last_obs=obs0,
            key=key,
            update_count=jnp.zeros((), jnp.int32),
        )

    def _rollout(state: PpoState):
        def body(carry, _):
            (env_state, hidden), obs, key = carry
            key, ka, ks = jax.random.split(key, 3)
            mean, log_std, value, h2 = apply_fn(state.params, obs, hidden)
            noise = jax.random.normal(ka, mean.shape, mean.dtype)
            action = mean + jnp.exp(log_std) * noise
            log_prob = gaussian_log_prob(mean, log_std, action)
            env_state, next_obs, reward, done = env_step(env_state, action, ks)
            h2 = jnp.where(done[..., None], 0.0, h2)
            t = Transition(
                obs=obs, action=action, log_prob=log_prob,
                value=value, reward=reward, done=done,
            )
            return ((env_state, h2), next_obs, key), t

        (carry_env, last_obs, key), traj = jax.lax.scan(
            body, (state.env_state, state.last_obs, state.key),
            None, length=config.num_steps,
        )
        return carry_env, last_obs, key, traj

    def _seq_loss(params, batch: Transition, h0, advantages, targets):
        """batch leaves (T, M, ...); h0 (M, H); adv/targets (T, M)."""

        def step(h, inp):
            obs_t, action_t, done_t = inp
            mean, log_std, value, h2 = apply_fn(params, obs_t, h)
            lp = gaussian_log_prob(mean, log_std, action_t)
            h2 = jnp.where(done_t[..., None], 0.0, h2)
            return h2, (lp, value, log_std)

        _, (log_prob, value, log_std) = jax.lax.scan(
            step, h0, (batch.obs, batch.action, batch.done))
        ratio = jnp.exp(log_prob - batch.log_prob)
        adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        pg1 = ratio * adv
        pg2 = jnp.clip(ratio, 1.0 - config.clip_eps, 1.0 + config.clip_eps) * adv
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))
        v_clipped = batch.value + jnp.clip(
            value - batch.value, -config.clip_eps, config.clip_eps
        )
        v_loss = 0.5 * jnp.mean(
            jnp.maximum((value - targets) ** 2, (v_clipped - targets) ** 2)
        )
        ent = jnp.mean(gaussian_entropy(log_std[0]))
        total = pg_loss + config.vf_coef * v_loss - config.ent_coef * ent
        return total, {
            "pg_loss": pg_loss, "v_loss": v_loss, "entropy": ent,
            "approx_kl": jnp.mean(batch.log_prob - log_prob),
        }

    def train_iteration(state: PpoState):
        _, h0 = state.env_state  # hidden at the rollout's first step
        (env_state, hidden), last_obs, key, traj = _rollout(state)
        _, _, last_value, _ = apply_fn(state.params, last_obs, hidden)
        advantages, targets = compute_gae(
            traj.reward, traj.value, traj.done, last_value,
            config.gamma, config.gae_lambda,
        )

        num_envs = traj.reward.shape[1]
        mb_envs = num_envs // config.num_minibatches
        # Shuffle in BLOCKS of consecutive envs (same rationale as
        # PpoConfig.shuffle_block: row gathers serialize on TPU at ~1
        # element/cycle — gathering pixel sequences per-env would dwarf the
        # backward pass; a block gather moves large contiguous runs).
        block = max(1, min(config.shuffle_block, mb_envs))
        if num_envs % block or mb_envs % block:
            block = 1
        n_blocks = num_envs // block
        blocks_per_mb = mb_envs // block

        def blockify(x):
            return x.reshape((x.shape[0], n_blocks, block) + x.shape[2:])

        traj_b = jax.tree.map(blockify, traj)
        adv_b, tgt_b = blockify(advantages), blockify(targets)
        h0_b = h0.reshape((n_blocks, block) + h0.shape[1:])

        def epoch(carry, _):
            params, opt_state, key = carry
            key, kp = jax.random.split(key)
            perm = jax.random.permutation(kp, n_blocks)

            def minibatch(carry, idx):
                params, opt_state = carry
                bidx = jax.lax.dynamic_slice_in_dim(
                    perm, idx * blocks_per_mb, blocks_per_mb)
                take = lambda xb: jnp.take(xb, bidx, axis=1).reshape(
                    (xb.shape[0], mb_envs) + xb.shape[3:])
                mb = jax.tree.map(take, traj_b)
                h0_mb = jnp.take(h0_b, bidx, axis=0).reshape(
                    (mb_envs,) + h0.shape[1:])
                (loss, metrics), grads = jax.value_and_grad(
                    _seq_loss, has_aux=True)(
                        params, mb, h0_mb, take(adv_b), take(tgt_b))
                if config.axis_name is not None:
                    grads = jax.lax.pmean(grads, config.axis_name)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, metrics)

            (params, opt_state), (losses, metrics) = jax.lax.scan(
                minibatch, (params, opt_state),
                jnp.arange(config.num_minibatches),
            )
            return (params, opt_state, key), (losses, metrics)

        (params, opt_state, key), (losses, metrics) = jax.lax.scan(
            epoch, (state.params, state.opt_state, key),
            None, length=config.update_epochs,
        )

        new_state = PpoState(
            params=params, opt_state=opt_state,
            env_state=(env_state, hidden),
            last_obs=last_obs, key=key,
            update_count=state.update_count + 1,
        )
        info = {
            "loss": losses.mean(),
            "mean_reward": traj.reward.mean(),
            "mean_episode_done": traj.done.mean(),
            **{k: v.mean() for k, v in metrics.items()},
        }
        if metrics_fn is not None:
            info.update(metrics_fn(env_state))
        return new_state, info

    return init, train_iteration


def scan_train(train_iteration, state, num_iterations: int):
    """Run many train iterations as ONE device program (lax.scan).

    Per-call dispatch on this platform costs ~100 ms (BENCH.md) — orders of
    magnitude more than a train iteration's device time — so hosts should
    call chunked scans, not per-iteration jits. Returns (state, stacked
    info) where each info leaf gains a leading (num_iterations,) axis.
    """

    def body(st, _):
        return train_iteration(st)

    return jax.lax.scan(body, state, None, length=num_iterations)
