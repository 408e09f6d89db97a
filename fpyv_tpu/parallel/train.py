"""Distributed PPO: shard_map the whole train iteration over the env mesh.

Layout:
- env_state / last_obs: sharded P("env") on the leading (env) axis — each
  device steps its local bank, zero communication in the rollout;
- params / opt_state: replicated; gradients pmean over "env" (one ICI
  all-reduce per minibatch);
- the per-device program is exactly the single-chip PPO (fpyv_tpu.rl.ppo)
  with ``axis_name="env"`` — determinism across shard layouts comes from
  per-env RNG keys living in the env state, not from the data split.
"""

from __future__ import annotations

from dataclasses import replace as dc_replace
from functools import partial
from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from fpyv_tpu.parallel.mesh import ENV_AXIS
from fpyv_tpu.rl.ppo import PpoConfig, PpoState, make_ppo


def make_distributed_ppo(
    apply_fn: Callable,
    env_step: Callable,
    config: PpoConfig,
    mesh: Mesh,
    metrics_fn: Callable = None,
):
    """Returns (init, train_iteration) where train_iteration is shard_map'd.

    ``config.num_envs`` is the GLOBAL env count; each device runs
    num_envs // mesh.size locally. init() takes already-sharded inputs
    (see fpyv_tpu.parallel.mesh helpers). ``metrics_fn`` (optional, as in
    make_ppo) runs on each shard's local env state; its scalars are pmean'd
    with the rest of the info dict, so counters must be shard-local means.
    """
    n_local = config.num_envs // mesh.size
    local_config = dc_replace(config, num_envs=n_local, axis_name=ENV_AXIS)
    init, local_iteration = make_ppo(apply_fn, env_step, local_config,
                                     metrics_fn=metrics_fn)

    state_spec = PpoState(
        params=P(),
        opt_state=P(),
        env_state=P(ENV_AXIS),
        last_obs=P(ENV_AXIS),
        key=P(ENV_AXIS),  # (mesh.size,) key array: one key per device
        update_count=P(),
    )

    def local_fn(state: PpoState):
        # each shard sees a (1,)-shaped slice of the key array
        state, info = local_iteration(state.replace(key=state.key[0]))
        # metrics are per-shard (local envs/minibatches); reduce so the
        # P() out_spec really is replicated and reports GLOBAL means
        info = jax.lax.pmean(info, ENV_AXIS)
        return state.replace(key=state.key[None]), info

    sharded_iteration = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(state_spec,),
        out_specs=(state_spec, P()),
        check_vma=False,
    )

    return init, jax.jit(sharded_iteration)


def shard_ppo_state(state: PpoState, mesh: Mesh) -> PpoState:
    """Place a host-built PpoState onto the mesh with the training layout."""
    from jax.sharding import NamedSharding

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return PpoState(
        params=jax.tree.map(lambda x: put(x, P()), state.params),
        opt_state=jax.tree.map(lambda x: put(x, P()), state.opt_state),
        env_state=jax.tree.map(lambda x: put(x, P(ENV_AXIS)), state.env_state),
        last_obs=put(state.last_obs, P(ENV_AXIS)),
        key=put(state.key, P(ENV_AXIS)),
        update_count=put(state.update_count, P()),
    )
