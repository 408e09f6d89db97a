"""Vision-path TPU benchmark: pallas kernel renderer vs XLA raycast.

VERDICT r2 action #1: slope-measure (device time per iteration, K-sweep —
the tunneled platform charges ~100 ms per call, BENCH.md) the three vision
programs on the REAL chip:

1. training shape: 96x72 depth frames at 1024 envs over per-env randomized
   worlds (train_vision's randomize_worlds=True path) — XLA raycast vs
   pallas_render_depth;
2. display shape: the reference's 640x480 (config/params.yaml:64-68) over
   the reference-shaped params.yaml world (targets + cylinders + gate track
   + ground);
3. the in-kernel FPV chase megaloop (pallas_vision_env_rollout) end-to-end
   env-steps/s vs the XLA-composed vision env step
   (VisionAcroEnv.step_batched scanned).

Prints one JSON line per measurement plus a summary.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_TRAIN = 1024
N_DISPLAY = 128


def timed(fn, *args, reps=3):
    fn(*args)  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def slope_per_iter(make_run, k1, k2):
    """Device time per iteration via the K-sweep slope (cancels dispatch)."""
    t1 = timed(make_run(k1))
    t2 = timed(make_run(k2))
    return (t2 - t1) / (k2 - k1), (t1, t2)


def render_scan(render_fn, pos0, K):
    @jax.jit
    def run():
        def body(p, _):
            img = render_fn(p)
            return p + 0.01, img.astype(jnp.float32).sum()

        _, sums = jax.lax.scan(body, pos0, None, length=K)
        return sums.sum()

    return run


def bench_renderers(tag, rig, cam_pos, cam_R, world, include, ground_extent,
                    n_envs, k1=50, k2=200):
    from fpyv_tpu.ops.pallas_vision import pallas_render_depth
    from fpyv_tpu.vision.raycast import render_depth_raycast

    out = {}
    for name, fn in (
        ("raycast_xla", lambda p: render_depth_raycast(
            rig, p, cam_R, world, max_depth=25.0, include=include,
            ground_extent=ground_extent)),
        ("raycast_pallas", lambda p: pallas_render_depth(
            rig, p, cam_R, world, max_depth=25.0, include=include,
            ground_extent=ground_extent)),
    ):
        per_iter, (t1, t2) = slope_per_iter(
            lambda K, fn=fn: render_scan(fn, cam_pos, K), k1, k2)
        fps = n_envs / per_iter
        out[name] = fps
        print(json.dumps({
            "bench": f"render/{tag}", "renderer": name,
            "us_per_batch_iter": round(per_iter * 1e6, 2),
            "frames_per_s": round(fps),
            "t_k1": round(t1, 3), "t_k2": round(t2, 3)}))
    print(json.dumps({
        "bench": f"render/{tag}",
        "pallas_speedup": round(out["raycast_pallas"] / out["raycast_xla"], 3)}))
    return out


def main():
    from fpyv_tpu.config import FpyvConfig
    from fpyv_tpu.envs.acro import AcroEnv
    from fpyv_tpu.envs.vision_acro import VisionAcroEnv, default_vision_rig
    from fpyv_tpu.physics.drone import DroneParams, _att_to_rotmat
    from fpyv_tpu.vision.camera import CameraRig, camera_pose
    from fpyv_tpu.world.generators import WorldSpec, build_world
    from fpyv_tpu.world.randomize import sample_worlds

    print("devices:", jax.devices())
    rig_train = default_vision_rig()

    # -- camera poses from real env states (typical flight attitudes)
    env = AcroEnv(params=DroneParams(att_mode="quat"))
    keys = jax.random.split(jax.random.key(0), N_TRAIN)

    # 1) training shape over per-env randomized worlds
    worlds = sample_worlds(jax.random.key(1), N_TRAIN, n_spheres=1,
                           n_cylinders=4, dtype=jnp.float32)
    state, _ = jax.vmap(env.reset)(keys, worlds)
    R = _att_to_rotmat(env.params, state.drone.att)
    cam_pos, cam_R = camera_pose(rig_train, state.drone.pos, R)
    bench_renderers("train_96x72_n1024", rig_train, cam_pos, cam_R, worlds,
                    ("spheres", "cylinders", "ground"), None, N_TRAIN)

    # 2) display shape over the reference-shaped shared world
    rig_disp = CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0),
                         fov_deg=120.0, resolution=(640, 480))
    spec = WorldSpec.from_config(FpyvConfig().simulator, seed=2)
    world_ref = build_world(spec, dtype=jnp.float32)
    bench_renderers("display_640x480_n128", rig_disp, cam_pos[:N_DISPLAY],
                    cam_R[:N_DISPLAY], world_ref,
                    ("spheres", "cylinders", "ground", "gates"),
                    float(spec.ground["size"]), N_DISPLAY, k1=10, k2=40)

    # 3) chase megaloop end-to-end vs the XLA-composed vision env scan
    from fpyv_tpu.ops.pallas_vision import pallas_vision_env_rollout

    world = env.default_world()
    state0, _ = jax.vmap(lambda k: env.reset(k, world))(keys)

    def chase_run(K):
        def run():
            st, w, rsum, crashes, contacts = pallas_vision_env_rollout(
                env, state0, world, K, seed=0)
            return rsum.sum()

        return run

    per_iter, (t1, t2) = slope_per_iter(chase_run, 512, 2048)
    chase_sps = N_TRAIN / per_iter
    print(json.dumps({
        "bench": "chase_megaloop_n1024", "us_per_iter": round(per_iter * 1e6, 2),
        "env_steps_per_s": round(chase_sps), "t_k1": round(t1, 3),
        "t_k2": round(t2, 3)}))

    # XLA-composed vision env (raycast renderer, zero-action scan) at the
    # same shapes for the end-to-end comparison
    venv = VisionAcroEnv(renderer="raycast", target_only=True)
    vworld, bank = venv.make_world()
    vstate, _ = venv.reset_batched(keys, vworld, bank)
    action = jnp.zeros((N_TRAIN, 4), jnp.float32).at[:, 3].set(-0.6)

    def venv_run(K):
        @jax.jit
        def run():
            def body(carry, _):
                st, w = carry
                st, obs, r, d, info = venv.step_batched(st, action, w, bank)
                return (st, w), r.sum() + obs["pixels"].sum()

            (_, _), outs = jax.lax.scan(body, (vstate, vworld), None, length=K)
            return outs.sum()

        return run

    per_iter_x, (t1, t2) = slope_per_iter(venv_run, 64, 256)
    xla_sps = N_TRAIN / per_iter_x
    print(json.dumps({
        "bench": "xla_vision_env_n1024", "us_per_iter": round(per_iter_x * 1e6, 2),
        "env_steps_per_s": round(xla_sps), "t_k1": round(t1, 3),
        "t_k2": round(t2, 3)}))
    print(json.dumps({
        "bench": "summary", "chase_vs_xla_env": round(chase_sps / xla_sps, 2)}))


if __name__ == "__main__":
    main()
