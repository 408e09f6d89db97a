"""Physics: rigid-body dynamics, motor model, collisions, world SDFs.

The reference's L1 physics layer (src/utils/components.py + kinematics.py)
rebuilt as pure batched functions over static-shape pytrees.
"""

from fpyv_tpu.physics.motor import ThrustCurve, fit_thrust_curve  # noqa: F401
from fpyv_tpu.physics.drone import DroneParams, DroneState, drone_step, drone_reset  # noqa: F401
from fpyv_tpu.physics.world import World  # noqa: F401
from fpyv_tpu.physics.racer import RacerParams, RacerState, racer_reset, racer_step  # noqa: F401
