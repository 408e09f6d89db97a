"""Actor-critic MLP for the PPO learner (flax.linen).

The reference has no policy networks (its nn.py is used only for terrain);
these are the greenfield networks the BASELINE's "PPO learner" configs call
for. Small MLPs: the TPU cost is dominated by env batch size, so widths are
chosen to keep the MXU busy at 4096+ envs (batched matmuls (N, H) @ (H, H)).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as fnn


class ActorCritic(fnn.Module):
    """Gaussian policy + value head over a shared or separate torso."""

    action_dim: int
    hidden: Sequence[int] = (128, 128)
    activation: str = "tanh"
    shared_torso: bool = False
    log_std_init: float = -0.5

    def _act(self, x):
        return fnn.tanh(x) if self.activation == "tanh" else fnn.relu(x)

    def _torso(self, x, name):
        for i, h in enumerate(self.hidden):
            x = fnn.Dense(
                h,
                name=f"{name}_dense{i}",
                kernel_init=fnn.initializers.orthogonal(jnp.sqrt(2.0)),
                bias_init=fnn.initializers.zeros,
            )(x)
            x = self._act(x)
        return x

    @fnn.compact
    def __call__(self, obs) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """obs (..., O) -> (mean (..., A), log_std (A,), value (...,))."""
        pi_x = self._torso(obs, "pi")
        mean = fnn.Dense(
            self.action_dim, name="pi_mean",
            kernel_init=fnn.initializers.orthogonal(0.01),
            bias_init=fnn.initializers.zeros,
        )(pi_x)
        log_std = self.param(
            "log_std", fnn.initializers.constant(self.log_std_init),
            (self.action_dim,), jnp.float32,  # explicit: raw init_fns default
        )                                     # to f64 under jax_enable_x64
        v_x = pi_x if self.shared_torso else self._torso(obs, "v")
        value = fnn.Dense(
            1, name="v_out",
            kernel_init=fnn.initializers.orthogonal(1.0),
            bias_init=fnn.initializers.zeros,
        )(v_x)[..., 0]
        return mean, log_std, value
