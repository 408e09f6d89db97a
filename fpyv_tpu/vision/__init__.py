"""Vision: pinhole camera rig + TPU depth renderer (scatter-min z-buffer).

The reference's Camera (components.py:449-629) projects object point clouds
through K @ inv([R|t]) and splats nearest-z depth in a Python loop. Here the
pose math is batched jnp and the z-buffer is a vectorized scatter-min over
linearized pixel ids — the whole observation path runs inside the jitted
env step (SURVEY.md §3.3's identified hot loop).
"""

from fpyv_tpu.vision.camera import CameraRig, camera_pose  # noqa: F401
from fpyv_tpu.vision.renderer import (  # noqa: F401
    prune_objects,
    render_binary_image,
    render_depth_image,
)
