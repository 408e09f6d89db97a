"""Distributed execution: device mesh, env-bank sharding, collectives.

The reference is one Python process stepping one drone (SURVEY.md §2.4:
no parallelism of any kind exists there). The TPU equivalents here are
greenfield by design:

- data parallelism over *environments*: the env bank's leading axis is
  sharded over a 1-D ``Mesh(("env",))`` spanning all chips (ICI within a
  host/slice, DCN across hosts — jax routes both transparently);
- the rollout is embarrassingly parallel (zero cross-chip traffic);
- the PPO learner is data-parallel: each shard computes gradients on its
  local minibatch and ``jax.lax.pmean`` all-reduces them over ICI;
- TP/PP/SP/EP are deliberately absent — the policy nets are tiny MLPs and
  there is no sequence dimension to shard (SURVEY.md §2.4).
"""

from fpyv_tpu.parallel.mesh import ENV_AXIS, make_mesh, shard_leading_axis  # noqa: F401
from fpyv_tpu.parallel.train import make_distributed_ppo  # noqa: F401
