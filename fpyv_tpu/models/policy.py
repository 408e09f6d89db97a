"""Actor-critic MLP for the PPO learner (flax.linen).

The reference has no policy networks (its nn.py is used only for terrain);
these are the greenfield networks the BASELINE's "PPO learner" configs call
for. Small MLPs: the TPU cost is dominated by env batch size, so widths are
chosen to keep the MXU busy at 4096+ envs (batched matmuls (N, H) @ (H, H)).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as fnn


class ActorCritic(fnn.Module):
    """Gaussian policy + value head over a shared or separate torso."""

    action_dim: int
    hidden: Sequence[int] = (128, 128)
    activation: str = "tanh"
    shared_torso: bool = False
    log_std_init: float = -0.5
    # Clamp applied to the free log_std parameter at use. Unbounded
    # log_std is a measured failure mode: PPO's entropy bonus (and late-run
    # value blowups) can inflate sigma until exp()/the importance ratio
    # overflow and the run NaNs (BENCH.md round 3 — the conv seed-1
    # divergence and the ent_coef=0.01 pixel-racer both died this way).
    log_std_min: float = -5.0
    log_std_max: float = 1.5

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
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        v_x = pi_x if self.shared_torso else self._torso(obs, "v")
        value = fnn.Dense(
            1, name="v_out",
            kernel_init=fnn.initializers.orthogonal(1.0),
            bias_init=fnn.initializers.zeros,
        )(v_x)[..., 0]
        return mean, log_std, value


class PixelActorCritic(fnn.Module):
    """Image torso for depth-image observations + MLP heads.

    For the vision envs (fpyv_tpu.envs.vision_acro): the depth image passes
    through an image torso, concatenates with the proprioceptive vector,
    then splits into Gaussian policy and value heads. Two torsos:

    - "conv": small 3x3/stride-2 conv stack (NHWC). Convs over a 1-channel
      96x72 image contract over only 9-144 elements — a poor fit for the
      128x128 MXU, which wants large matmul contractions.
    - "patch": ViT-style patchify-dense — the image splits into
      ``patch x patch`` tiles, each embeds through one Dense, and the
      flattened embeddings feed the fc stack. Every op is a large dense
      matmul (contraction >= patch^2, then n_patches*embed), which is what
      the MXU runs at full rate; there is no conv lowering at all.
    """

    action_dim: int
    channels: Sequence[int] = (16, 32, 32)
    hidden: Sequence[int] = (256,)
    log_std_init: float = -0.5
    # conv/fc torso compute dtype. bf16 keeps params/heads in f32 (mixed
    # precision: the MXU runs bf16 at a multiple of f32 throughput and the
    # depth-image torso is where the learner's FLOPs are); None = f32.
    compute_dtype: Optional[type] = jnp.bfloat16
    torso: str = "conv"  # "conv" | "patch"
    patch: int = 8
    embed: int = 128  # per-patch embedding width (patch torso)
    # pixels arrive already space-to-depth'd as (..., n_patches, patch^2)
    # (the in-kernel rollout renders frames in patch-major order,
    # ops/pallas_policy); parameters and outputs are identical to the
    # (..., H, W) path — the embed sees the same 64 pixels either way
    prepatched: bool = False
    # Pooled-patch fc (VERDICT r4 #1): mix groups of `patch_pool`
    # CONSECUTIVE patch embeddings (patch-major order) through one learned
    # Dense(embed) before the fc stack. The fc contraction — the learner's
    # single biggest matmul (n_patches*embed+proprio = 13952 wide at 96x72)
    # — shrinks by the pool factor; the pool layer itself is a good MXU
    # shape (contraction patch_pool*embed). 1 = off (original parameters).
    patch_pool: int = 1
    # Recurrent temporal memory (VERDICT r4 #6): a GRU cell between the
    # torso and the heads. Frame stacking measured NEGATIVE at 4 agents
    # (runs/r4/ma4_fs4) so multi-agent racing had no working temporal
    # mechanism; the GRU is the untaken branch of r3 #3 ("frame stack
    # and/or GRU"). When > 0, __call__ takes (pixels, proprio, hidden) and
    # returns (mean, log_std, value, hidden'); training goes through
    # rl/ppo.make_recurrent_ppo (sequence-minibatched learner). 0 = off
    # (exact feedforward parameters and signature).
    gru: int = 0
    log_std_min: float = -5.0  # see ActorCritic.log_std_min
    log_std_max: float = 1.5

    def _pool(self, x, dt):
        """(..., NP, embed) -> (..., NP/pool, embed) learned group mixing."""
        if self.patch_pool <= 1:
            return x
        NP = x.shape[-2]
        if NP % self.patch_pool:
            raise ValueError(
                f"patch_pool={self.patch_pool} must divide n_patches={NP}")
        x = x.reshape(x.shape[:-2] + (NP // self.patch_pool,
                                      self.patch_pool * self.embed))
        return fnn.relu(fnn.Dense(self.embed, name="patch_pool", dtype=dt)(x))

    def _heads(self, x, hidden):
        """Shared head block: optional GRU (f32 — tiny vs the torso) then
        Gaussian policy + value. Returns 3-tuple (feedforward) or 4-tuple
        with the new hidden (gru > 0)."""
        x = x.astype(jnp.float32)
        if self.gru:
            hidden, x = fnn.GRUCell(features=self.gru, name="gru")(hidden, x)
        mean = fnn.Dense(
            self.action_dim, name="pi_mean",
            kernel_init=fnn.initializers.orthogonal(0.01),
        )(x)
        log_std = self.param(
            "log_std", fnn.initializers.constant(self.log_std_init),
            (self.action_dim,), jnp.float32,
        )
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        value = fnn.Dense(1, name="v_out")(x)[..., 0]
        if self.gru:
            return mean, log_std, value, hidden
        return mean, log_std, value

    @fnn.compact
    def __call__(self, pixels, proprio, hidden=None):
        """pixels (..., H, W) — or (..., K, H, W) for a K-frame stack
        (newest-last temporal memory, VERDICT r3 #3) — in [0,1] f32/bf16 OR
        uint8 levels (converted here — storing rollout pixels as uint8
        quarters the learner's HBM traffic and is numerically exact:
        levels/255 is reapplied on use); proprio (..., P).

        Frame stacks fold into the existing torsos without new machinery:
        the patch torso patchifies each frame and embeds the CONCATENATED
        per-patch stack (contraction K*patch^2 — an even better MXU shape
        than a single frame), the conv torso treats K as input channels.
        A single frame is exactly the K == 1 case (same params/outputs)."""
        dt = self.compute_dtype
        if pixels.dtype == jnp.uint8:
            # via f32 so values are bit-identical to the f32-storage path
            # (u8 -> bf16 -> /255 would round differently)
            pixels = pixels.astype(jnp.float32) / 255.0
        if self.prepatched:
            if self.torso != "patch":
                raise ValueError("prepatched pixels require torso='patch'")
            x = pixels  # (..., NP, patch^2)
            if dt is not None:
                x = x.astype(dt)
            x = fnn.relu(fnn.Dense(self.embed, name="patch_embed",
                                   dtype=dt)(x))
            x = self._pool(x, dt)
            x = x.reshape(pixels.shape[:-2] + (-1,))
            x = jnp.concatenate([x, proprio.astype(x.dtype)], axis=-1)
            for i, h in enumerate(self.hidden):
                x = fnn.relu(fnn.Dense(h, name=f"fc{i}", dtype=dt)(x))
            return self._heads(x, hidden)
        stacked = pixels.ndim >= 3 and proprio.ndim + 1 < pixels.ndim
        K = pixels.shape[-3] if stacked else 1
        if not stacked:
            pixels = pixels[..., None, :, :]  # -> (..., 1, H, W)
        if self.torso == "patch":
            p = self.patch
            H, W = pixels.shape[-2], pixels.shape[-1]
            if H % p or W % p:
                raise ValueError(
                    f"patch torso needs H and W divisible by patch={p}, "
                    f"got {H}x{W} — use torso='conv' or a smaller patch")
            lead = pixels.shape[:-3]
            # per-frame space-to-depth: (..., K, H, W) -> (..., K, NP, p*p),
            # then frames concat per patch -> (..., NP, K*p*p)
            x = pixels.reshape(lead + (K, H // p, p, W // p, p))
            x = jnp.moveaxis(x, -3, -2).reshape(lead + (K, -1, p * p))
            x = jnp.moveaxis(x, -3, -2).reshape(lead + ((H // p) * (W // p),
                                                        K * p * p))
            if dt is not None:
                x = x.astype(dt)
            x = fnn.relu(fnn.Dense(self.embed, name="patch_embed", dtype=dt)(x))
            x = self._pool(x, dt)
            x = x.reshape(lead + (-1,))
        else:
            x = jnp.moveaxis(pixels, -3, -1)  # -> NHWC with K channels
            if dt is not None:
                x = x.astype(dt)
            for i, ch in enumerate(self.channels):
                x = fnn.Conv(ch, (3, 3), strides=(2, 2), name=f"conv{i}",
                             dtype=dt)(x)
                x = fnn.relu(x)
            x = x.reshape(x.shape[: pixels.ndim - 3] + (-1,))
        x = jnp.concatenate(
            [x, proprio.astype(x.dtype)], axis=-1)
        for i, h in enumerate(self.hidden):
            x = fnn.relu(fnn.Dense(h, name=f"fc{i}", dtype=dt)(x))
        # heads in f32: log_prob/value numerics
        return self._heads(x, hidden)


class SquashedGaussianActor(fnn.Module):
    """tanh-squashed Gaussian policy (SAC actor)."""

    action_dim: int
    hidden: Sequence[int] = (128, 128)
    log_std_min: float = -10.0
    log_std_max: float = 2.0

    @fnn.compact
    def __call__(self, obs):
        x = obs
        for i, h in enumerate(self.hidden):
            x = fnn.relu(fnn.Dense(h, name=f"dense{i}")(x))
        mean = fnn.Dense(self.action_dim, name="mean")(x)
        log_std = fnn.Dense(self.action_dim, name="log_std")(x)
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        return mean, log_std


class TwinQNetwork(fnn.Module):
    """Two independent Q heads (SAC critic); returns (q1, q2)."""

    hidden: Sequence[int] = (128, 128)

    @fnn.compact
    def __call__(self, obs, action):
        x0 = jnp.concatenate([obs, action], axis=-1)

        def q(name):
            x = x0
            for i, h in enumerate(self.hidden):
                x = fnn.relu(fnn.Dense(h, name=f"{name}_dense{i}")(x))
            return fnn.Dense(1, name=f"{name}_out")(x)[..., 0]

        return q("q1"), q("q2")
