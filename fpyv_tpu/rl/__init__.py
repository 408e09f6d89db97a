"""RL: PPO learner (GAE, clipped objective) over scan rollouts.

Greenfield for the TPU rebuild (the reference has no RL training loop; its
README positions the sim "for RL training"). Design follows the BASELINE
north star: batched rollouts on sharded env banks feed a data-parallel
learner whose gradients sync with ``psum`` over the mesh's env axis.
"""

from fpyv_tpu.rl.ppo import PpoConfig, PpoState, make_ppo, scan_train  # noqa: F401
from fpyv_tpu.rl.gae import compute_gae  # noqa: F401
from fpyv_tpu.rl.sac import SacConfig, SacState, make_sac  # noqa: F401
from fpyv_tpu.rl.replay import ReplayBuffer, replay_init  # noqa: F401
from fpyv_tpu.rl.es import make_policy_es, monte_carlo_search, policy_es  # noqa: F401
