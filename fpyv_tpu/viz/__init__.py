"""Host-side debug visualization (NOT the TPU observation path).

The TPU renderer (fpyv_tpu.vision) produces observation arrays; this
package is the human-facing debug layer: matplotlib 3D world views
(render3d parity) and OpenCV HUD overlays (simulator.py:158-163 parity).
Matplotlib/cv2 imports are deferred so headless training never pays for
them.
"""

from fpyv_tpu.viz import render3d  # noqa: F401
