"""Two-process DCN worker: exercises make_hybrid_mesh's multi-process branch.

SURVEY §2.4 / VERDICT #6: the BASELINE's ">=2 host" scaling path (DCN between
hosts, ICI within) had only ever executed in its single-process fallback.
This worker is launched twice by tests/test_parallel.py (slow marker) with a
shared coordinator address; each process owns 4 virtual CPU devices, the
global mesh is 8, and one distributed PPO iteration runs over it —
multi-controller SPMD exactly as on a 2-host v5e slice, with gRPC standing
in for DCN.

Usage: python tools/dcn_worker.py <process_id> <num_processes> <coord_addr> \
           [rotate|race]

The optional 4th arg picks the workload: "rotate" (default, the original
attitude env) or "race" — the shared-policy multi-agent race layout
(BASELINE config #5's "sharded across >=2 hosts" clause: MultiRaceState
carry P('env') on the race axis, flat race-major agent batch) under true
multi-process SPMD.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    proc_id, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    workload = sys.argv[4] if len(sys.argv) > 4 else "rotate"

    import jax

    jax.config.update("jax_platforms", "cpu")  # env vars lose to sitecustomize
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=proc_id)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fpyv_tpu.envs.rotate import RotateEnv
    from fpyv_tpu.models.policy import ActorCritic
    from fpyv_tpu.parallel.mesh import ENV_AXIS, make_hybrid_mesh
    from fpyv_tpu.parallel.train import make_distributed_ppo
    from fpyv_tpu.rl.ppo import PpoConfig, PpoState

    assert jax.process_count() == nproc, jax.process_count()
    mesh = make_hybrid_mesh()
    assert mesh.size == nproc * 4, mesh.devices
    # the hybrid branch must keep each process's devices contiguous on the
    # flattened env axis (host-local env banks; inter-host traffic = learner
    # all-reduce only)
    flat = mesh.devices.reshape(-1)
    owners = [d.process_index for d in flat]
    assert owners == sorted(owners), owners

    T = 8
    if workload == "race":
        from fpyv_tpu.envs.multi_race import (MultiRaceEnv,
                                              make_shared_policy_env_step)

        A, n_races = 2, 32
        renv = MultiRaceEnv(n_agents=A, max_episode_steps=64)
        env_step, reset_fn = make_shared_policy_env_step(
            renv, renv.default_world(), n_envs=n_races)
        net = ActorCritic(action_dim=4, hidden=(16,))
        num_envs = n_races * A  # flat race-major agent batch
        config = PpoConfig(num_envs=num_envs, num_steps=T, update_epochs=1,
                           num_minibatches=2, shuffle_block=1)
        apply_fn = net.apply

        def build_env():
            return reset_fn(jax.random.key(0))

    else:
        num_envs = 32
        env = RotateEnv()
        net = ActorCritic(action_dim=3, hidden=(16,))
        config = PpoConfig(num_envs=num_envs, num_steps=T, update_epochs=1,
                           num_minibatches=2, shuffle_block=1)

        def env_step(env_state, action, key):
            st, obs, r, d, _ = jax.vmap(env.step)(env_state, action)
            return st, obs.reshape(obs.shape[0], -1), r, d

        def apply_fn(params, obs):  # obs arrives flattened (N, 18)
            return net.apply(params, obs)

        def build_env():
            env_state, obs = jax.vmap(env.reset)(
                jax.random.split(jax.random.key(0), num_envs))
            return env_state, obs.reshape(num_envs, -1)

    init, train_iteration = make_distributed_ppo(
        apply_fn, env_step, config, mesh)

    # multi-controller: every process runs the SAME global program; build
    # the sharded state inside jit so no host->global transfers are needed
    def build():
        env_state, obs = build_env()
        params = net.init(jax.random.key(1), obs[:1])
        return init(params, env_state, obs,
                    jax.random.split(jax.random.key(2), mesh.size))

    shardings = PpoState(
        params=NamedSharding(mesh, P()),
        opt_state=NamedSharding(mesh, P()),
        env_state=NamedSharding(mesh, P(ENV_AXIS)),
        last_obs=NamedSharding(mesh, P(ENV_AXIS)),
        key=NamedSharding(mesh, P(ENV_AXIS)),
        update_count=NamedSharding(mesh, P()),
    )
    state = jax.jit(build, out_shardings=shardings)()

    losses = []
    for _ in range(2):
        state, info = train_iteration(state)
        # info is fully replicated -> addressable on every process
        losses.append(float(jax.device_get(info["loss"])))

    print(json.dumps({
        "ok": all(jnp.isfinite(jnp.asarray(losses)).tolist()),
        "workload": workload,
        "process_id": proc_id,
        "process_count": jax.process_count(),
        "mesh_size": int(mesh.size),
        "losses": losses,
    }))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
