"""Functional RL environments, vmap/scan-native.

The reference realizes a gym API only in experiment scripts
(tests/rotation_pid.py Rotate env, tests/find_by_distance.py BallEnv,
tests/ma_com_simple_env.py gridworld) plus the implicit env of
src/core/simulator.py's main loop. Here every env is functional:

    state, obs = env.reset(key)
    state, obs, reward, done, info = env.step(key, state, action)

with auto-reset folded into ``step`` (per-env reset on done, no host round
trips — the vectorized equivalent of the reference's crash-then-break loop,
SURVEY.md §5 "failure detection").
"""

from fpyv_tpu.envs.base import tree_where  # noqa: F401
from fpyv_tpu.envs.rotate import RotateEnv  # noqa: F401
from fpyv_tpu.envs.acro import AcroEnv  # noqa: F401
from fpyv_tpu.envs.ball import BallEnv  # noqa: F401
from fpyv_tpu.envs.gridworld import MaComGridEnv  # noqa: F401
from fpyv_tpu.envs.vision_acro import VisionAcroEnv  # noqa: F401
from fpyv_tpu.envs.sensor_acro import SensorAcroEnv  # noqa: F401
from fpyv_tpu.envs.hover import HoverEnv, HoverPilot  # noqa: F401
from fpyv_tpu.envs.multi_race import MultiRaceEnv  # noqa: F401
from fpyv_tpu.envs.vision_race import VisionRaceEnv  # noqa: F401
from fpyv_tpu.envs.gym_adapter import GymAdapter  # noqa: F401
