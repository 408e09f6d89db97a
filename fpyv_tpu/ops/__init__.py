"""Math kernels: rotations, quaternions, camera geometry, polynomials.

These are the leaf ops of the framework (the reference's L0 layer:
``src/utils/helper_functions.py`` + ``src/utils/kinematics.py``), rewritten
as pure, batched jnp functions. Every function accepts arbitrary leading
batch dimensions so the same code serves one drone or a 4096-env bank.
"""

from fpyv_tpu.ops import camera_ops, poly, rotations  # noqa: F401
