"""NumPy oracle: a faithful, bug-for-bug re-implementation of the reference
FpyV step semantics (float64, single drone) used as the golden-trajectory
authority for parity tests. Written from scratch against the documented
semantics of /root/reference/src — NOT a copy of its code.

Includes every known quirk:
- double attitude rotation per step (kinematics.py:23 + components.py:218)
- position-first semi-implicit Euler (kinematics.py:21-22)
- negated action->rates mapping (components.py:185)
- low-pass memories for rates/thrust (components.py:187-194)
- thrust polynomial with origin sample (flight_time_calculator.py:43-52)
- gyro observation E(rates) with deg/s read as radians (components.py:247)
- crash on SDF<0 at motor points or motor z<0 (components.py:207,239-240)
"""

from tools.oracle.sim import (  # noqa: F401
    OracleCamera,
    OracleCylinder,
    OracleDrone,
    OracleGround,
    OraclePid,
    OracleTarget,
    euler_to_R,
)
