"""fpyv_tpu — a TPU-native vectorized FPV drone simulation & RL framework.

A from-scratch rebuild of the capabilities of the FpyV reference simulator
(an FPV acro-mode drone sim for RL training and RC-transmitter flying),
re-designed TPU-first:

- every per-step computation is a pure function over pytrees,
- drones are batched with ``vmap`` (thousands of envs in lockstep),
- the step is compiled with ``jit`` and rolled out with ``lax.scan``,
- env banks shard over a ``jax.sharding.Mesh`` via ``shard_map`` with
  XLA collectives (``psum``) syncing the PPO learner over ICI.

Package map (each module's docstring cites the reference behavior it covers):

- :mod:`fpyv_tpu.ops`       — rotation/quaternion/camera/polynomial math kernels
- :mod:`fpyv_tpu.physics`   — rigid-body step, motor/thrust model, collisions, world SDFs
- :mod:`fpyv_tpu.envs`      — functional RL environments (acro racer, rotate, hover, ...)
- :mod:`fpyv_tpu.control`   — PID, rates controller, pixel-guidance autopilots
- :mod:`fpyv_tpu.sensors`   — gyro/baro/IMU/UWB sensor models
- :mod:`fpyv_tpu.vision`    — pinhole camera, depth renderer (scatter-min z-buffer)
- :mod:`fpyv_tpu.world`     — world generators (tracks/targets/cylinders/ground/terrain)
- :mod:`fpyv_tpu.models`    — NN modules (MLP policy/value, attention) and terrain nets
- :mod:`fpyv_tpu.rl`        — PPO learner (GAE, clipped objective), rollouts
- :mod:`fpyv_tpu.parallel`  — device mesh setup, env-bank sharding, collectives
- :mod:`fpyv_tpu.io`        — params.yaml / calibration.json / motor-CSV / blackbox IO
- :mod:`fpyv_tpu.inputs`    — RC transmitter (joystick) input: native Linux adapter + calib
- :mod:`fpyv_tpu.utils`     — profiling, checkpointing, metrics
"""

__version__ = "0.1.0"
