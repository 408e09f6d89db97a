"""World construction: generators (tracks/targets/cylinders/ground/terrain),
icosphere meshes, and render point banks.

The reference's world layer is src/utils/generators.py (randomized object
lists) + the per-class point-cloud constructors in components.py. Here world
SoA (fpyv_tpu.physics.world.World) carries the collision geometry, and a
static RenderBank carries the vertex clouds the camera renders.
"""

from fpyv_tpu.world.icosphere import icosphere  # noqa: F401
from fpyv_tpu.world.generators import (  # noqa: F401
    WorldSpec,
    build_world,
    cylinder_points,
    gate_corners,
    ground_points,
)
from fpyv_tpu.world.render_bank import (  # noqa: F401
    RenderBank,
    build_dynamic_render_bank,
    build_render_bank,
)
from fpyv_tpu.world.randomize import WorldRanges, sample_worlds  # noqa: F401
