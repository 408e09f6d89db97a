"""Soft Actor-Critic: off-policy learner with on-device replay.

The second learner family (PPO being the first): twin Q critics with a
target network, tanh-squashed Gaussian actor with the change-of-variables
log-prob correction, and automatic temperature tuning toward a target
entropy. The collect -> store -> sample -> update loop is one jitted
function over the vectorized envs and the HBM-resident replay buffer —
no host round-trips (fpyv_tpu.rl.replay).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fpyv_tpu.rl.replay import ReplayBuffer, replay_add_batch, replay_init, replay_sample


@dataclass(frozen=True)
class SacConfig:
    num_envs: int = 128
    buffer_capacity: int = 200_000
    batch_size: int = 256
    gamma: float = 0.99
    tau: float = 0.005  # target soft-update rate
    actor_lr: float = 3e-4
    critic_lr: float = 3e-4
    alpha_lr: float = 3e-4
    target_entropy: Optional[float] = None  # default: -action_dim
    updates_per_step: int = 1


@struct.dataclass
class SacState:
    actor_params: Any
    critic_params: Any
    target_critic_params: Any
    log_alpha: jnp.ndarray
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    buffer: ReplayBuffer
    env_state: Any
    last_obs: jnp.ndarray
    key: jnp.ndarray
    step: jnp.ndarray


LOG_2 = 0.6931471805599453


def _squashed_sample(actor_apply, params, obs, key):
    """Sample a = tanh(u), u ~ N(mean, std); return (a, log_prob(a))."""
    mean, log_std = actor_apply(params, obs)
    std = jnp.exp(log_std)
    u = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    a = jnp.tanh(u)
    # log N(u) - sum log(1 - tanh(u)^2), numerically stable form
    log_prob = jnp.sum(
        -0.5 * ((u - mean) / std) ** 2 - log_std
        - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1)
    log_prob = log_prob - jnp.sum(
        2.0 * (LOG_2 - u - jax.nn.softplus(-2.0 * u)), axis=-1)
    return a, log_prob


def make_sac(
    actor_apply: Callable,  # (params, obs) -> (mean, log_std)
    critic_apply: Callable,  # (params, obs, action) -> (q1, q2)
    env_step: Callable,  # (env_state, action, key) -> (env_state, obs, r, d)
    #   or -> (..., d, store_next_obs): an optional 5th return is the
    #   successor observation to STORE in the replay — at time-limit
    #   truncations the auto-reset makes the carried obs the respawn state,
    #   and bootstrapping the Q target from the respawn instead of the true
    #   successor is a systematic bias (ADVICE r3); pass the env's
    #   info["final_obs"] there to store the pre-reset successor
    config: SacConfig,
    obs_dim: int,
    action_dim: int,
):
    target_entropy = (
        config.target_entropy
        if config.target_entropy is not None else -float(action_dim))
    actor_tx = optax.adam(config.actor_lr)
    critic_tx = optax.adam(config.critic_lr)
    alpha_tx = optax.adam(config.alpha_lr)

    def init(actor_params, critic_params, env_state, obs0, key) -> SacState:
        return SacState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=jax.tree.map(lambda x: x, critic_params),
            log_alpha=jnp.zeros((), jnp.float32),
            actor_opt=actor_tx.init(actor_params),
            critic_opt=critic_tx.init(critic_params),
            alpha_opt=alpha_tx.init(jnp.zeros((), jnp.float32)),
            buffer=replay_init(config.buffer_capacity, obs_dim, action_dim),
            env_state=env_state,
            last_obs=obs0,
            key=key,
            step=jnp.zeros((), jnp.int32),
        )

    def _update(state: SacState, key):
        ks, ka, kn = jax.random.split(key, 3)
        obs, action, reward, next_obs, done = replay_sample(
            state.buffer, ks, config.batch_size)
        alpha = jnp.exp(state.log_alpha)

        # --- critic: TD target with entropy bonus
        next_a, next_logp = _squashed_sample(
            actor_apply, state.actor_params, next_obs, kn)
        tq1, tq2 = critic_apply(state.target_critic_params, next_obs, next_a)
        target_v = jnp.minimum(tq1, tq2) - alpha * next_logp
        target_q = reward + config.gamma * (1.0 - done) * target_v
        target_q = jax.lax.stop_gradient(target_q)

        def critic_loss(params):
            q1, q2 = critic_apply(params, obs, action)
            return jnp.mean((q1 - target_q) ** 2 + (q2 - target_q) ** 2)

        c_loss, c_grads = jax.value_and_grad(critic_loss)(state.critic_params)
        c_updates, critic_opt = critic_tx.update(
            c_grads, state.critic_opt, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_updates)

        # --- actor
        def actor_loss(params):
            a, logp = _squashed_sample(actor_apply, params, obs, ka)
            q1, q2 = critic_apply(critic_params, obs, a)
            return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

        (a_loss, logp), a_grads = jax.value_and_grad(
            actor_loss, has_aux=True)(state.actor_params)
        a_updates, actor_opt = actor_tx.update(
            a_grads, state.actor_opt, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        # --- temperature
        def alpha_loss(log_alpha):
            return -jnp.mean(
                jnp.exp(log_alpha)
                * jax.lax.stop_gradient(logp + target_entropy))

        al_loss, al_grad = jax.value_and_grad(alpha_loss)(state.log_alpha)
        al_updates, alpha_opt = alpha_tx.update(
            al_grad, state.alpha_opt, state.log_alpha)
        log_alpha = optax.apply_updates(state.log_alpha, al_updates)

        # --- target soft update
        target_critic_params = jax.tree.map(
            lambda t, s: (1.0 - config.tau) * t + config.tau * s,
            state.target_critic_params, critic_params)

        metrics = {"critic_loss": c_loss, "actor_loss": a_loss,
                   "alpha": jnp.exp(log_alpha),
                   "entropy": -jnp.mean(logp)}
        return state.replace(
            actor_params=actor_params, critic_params=critic_params,
            target_critic_params=target_critic_params, log_alpha=log_alpha,
            actor_opt=actor_opt, critic_opt=critic_opt, alpha_opt=alpha_opt,
        ), metrics

    def train_step(state: SacState, random_actions: bool = False):
        """One env step on all envs + `updates_per_step` gradient updates."""
        key, kact, kenv, kupd = jax.random.split(state.key, 4)
        if random_actions:  # warmup exploration
            action = jax.random.uniform(
                kact, state.last_obs.shape[:-1] + (action_dim,),
                state.last_obs.dtype, minval=-1.0, maxval=1.0)
        else:
            action, _ = _squashed_sample(
                actor_apply, state.actor_params, state.last_obs, kact)
        out = env_step(state.env_state, action, kenv)
        if len(out) == 5:  # (st, obs, r, d, store_next_obs)
            env_state, next_obs, reward, done, store_obs = out
        else:
            env_state, next_obs, reward, done = out
            store_obs = next_obs
        buffer = replay_add_batch(
            state.buffer, state.last_obs, action, reward, store_obs, done)
        state = state.replace(
            buffer=buffer, env_state=env_state, last_obs=next_obs,
            key=key, step=state.step + 1)

        metrics = {}
        for i in range(config.updates_per_step):
            kupd, ki = jax.random.split(kupd)
            state, metrics = _update(state, ki)
        metrics["mean_reward"] = reward.mean()
        return state, metrics

    return init, train_step
