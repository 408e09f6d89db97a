"""Neural nets: minimal module system (nn.py successor), terrain nets,
and flax actor-critic networks for the PPO learner."""

from fpyv_tpu.models import nn  # noqa: F401
from fpyv_tpu.models.terrain import TerrainNet, terrain_heightmap  # noqa: F401
from fpyv_tpu.models.policy import ActorCritic  # noqa: F401
