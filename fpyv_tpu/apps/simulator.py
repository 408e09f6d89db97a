"""The interactive simulator app — the rebuild of src/core/simulator.py.

Same loop shape (simulator.py:83-177): world build -> per-step target
update -> render the chased target's depth image -> extract its pixel
centroid -> pixel-guidance override -> physics step -> render. Differences
by design: the physics+render step is one jitted function, and — unlike the
reference's per-step Python loop — steps run in CHUNKED ``lax.scan``
device programs (per-call dispatch costs ~100 ms on a tunneled platform,
BENCH.md; a per-step host loop never amortizes it).  Each chunk advances
``chunk`` steps and returns stacked per-step state (plus the FPV frames in
'2d' mode, rendered inside the scan); the host only inspects crash flags
and feeds displays between chunks.  The joystick path stays per-step — a
human in the loop needs per-step host reads at 60 FPS, which direct-attached
hardware sustains easily.

Rendering modes are 'none' (headless), '2d' (FPV depth + HUD via cv2 when
available, else saved frames), '3d' (matplotlib world view); input is the
native Linux joystick when present, else a scripted action (the reference's
hard-coded ``[-0.1, 0, 0, 0]``, simulator.py:89).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fpyv_tpu.config import FpyvConfig
from fpyv_tpu.control.guidance import (
    GuidanceParams,
    guidance_init,
    needed_force_orientation,
)
from fpyv_tpu.physics.drone import DroneParams, _att_to_rotmat, drone_reset, drone_step
from fpyv_tpu.physics.world import update_targets
from fpyv_tpu.vision.camera import CameraRig, camera_pose
from fpyv_tpu.vision.renderer import render_depth_image, target_pixel_centroid
from fpyv_tpu.world.generators import WorldSpec, build_world
from fpyv_tpu.world.render_bank import bank_subset, build_render_bank


def run_simulator(
    cfg: Optional[FpyvConfig] = None,
    steps: int = 10000,
    render: str = "none",  # 'none' | '2d' | '3d'
    guided: bool = True,
    use_joystick: bool = False,
    seed: int = 0,
    max_depth: float = 25.0,
    frame_sink=None,  # callable(np.uint8 frame) for testing/recording
    chunk: Optional[int] = None,  # steps per device call; None = auto
    virtual_target: bool = False,  # mouse-drag target (simulator.py:15-31):
    #   the guidance pixel is the user-dragged VirtualTarget instead of the
    #   rendered centroid; with a cv2 window the mouse drives it, headless a
    #   scripted stream can via target_events
    target_events=None,  # callable(t) -> iterable of (event, x, y) tuples
    #   fed to the VirtualTarget at step t (the headless scripted-pixel path)
) -> dict:
    cfg = cfg or FpyvConfig()
    params = DroneParams.from_config(cfg)
    rig = CameraRig.from_config(cfg.camera)
    g = GuidanceParams.from_config(cfg, params)

    spec = WorldSpec.from_config(cfg.simulator, seed=seed)
    world = build_world(spec)
    bank = build_render_bank(spec, rng=np.random.default_rng(seed))
    target_idx = 0  # simulator.py:55 target_chase_idx
    target_bank = bank_subset(bank, [target_idx]) if spec.targets else None

    state = drone_reset(
        params,
        jnp.asarray(cfg.drone.initial_position, jnp.float32),
        jnp.asarray(cfg.drone.initial_velocity, jnp.float32),
        jnp.asarray(cfg.drone.initial_orientation, jnp.float32),
    )
    gs = guidance_init((), jnp.float32)
    wind = jnp.zeros(3, jnp.float32)

    joystick = None
    if use_joystick:
        from fpyv_tpu.inputs.rc import Joystick

        joystick = Joystick()
        if joystick.status and cfg.drone.joystick_calib_path:
            joystick.calibrate(cfg.drone.joystick_calib_path, True)
        elif not joystick.status:
            print("Joystick device was not found")  # components.py:80
            joystick = None

    def sim_step(state, gs, world, action):
        world = update_targets(world)
        R = _att_to_rotmat(params, state.att)
        cam_pos, cam_R = camera_pose(rig, state.pos, R)
        if target_bank is not None and guided:
            timg = render_depth_image(rig, cam_pos, cam_R, target_bank,
                                      world=world, max_depth=max_depth)
            pixel, found = target_pixel_centroid(timg)
            dist = (jnp.linalg.norm(world.sphere_center[target_idx] - state.pos)
                    - world.sphere_radius[target_idx])
            gs2, R_des, f_des = needed_force_orientation(
                g, gs, rig, cam_R, pixel, state.pos, state.vel, dist, params.mass)
            # guidance only when the target is visible (simulator.py:104-110)
            state_g, _ = drone_step(params, state, action, world, wind,
                                    att_override=R_des, thrust_override=f_des)
            state_f, _ = drone_step(params, state, action, world, wind)
            from fpyv_tpu.envs.base import tree_where

            state = tree_where(found, state_g, state_f)
            gs = jax.tree.map(lambda a, b: jnp.where(found, a, b), gs2, gs)
        else:
            state, _ = drone_step(params, state, action, world, wind)
        return state, gs, world

    def sim_step_virtual(state, gs, world, action, pixel):
        """One step steered at a user-supplied pixel: the reference's
        mouse-target path (target_pixels = [ix, iy], simulator.py:131)
        replaces the rendered centroid.  Guidance needs a range to the
        chased target, so the mode requires a world WITH targets (guarded
        in run_simulator) and — like the centroid path — only overrides
        when guidance is enabled."""
        world = update_targets(world)
        if not (guided and spec.targets):  # respect the guided flag
            state, _ = drone_step(params, state, action, world, wind)
            return state, gs, world
        R = _att_to_rotmat(params, state.att)
        cam_pos, cam_R = camera_pose(rig, state.pos, R)
        dist = (jnp.linalg.norm(world.sphere_center[target_idx] - state.pos)
                - world.sphere_radius[target_idx])
        gs, R_des, f_des = needed_force_orientation(
            g, gs, rig, cam_R, pixel, state.pos, state.vel, dist, params.mass)
        state, _ = drone_step(params, state, action, world, wind,
                              att_override=R_des, thrust_override=f_des)
        return state, gs, world

    def render_frame_fn(state, world):
        R = _att_to_rotmat(params, state.att)
        cam_pos, cam_R = camera_pose(rig, state.pos, R)
        return render_depth_image(rig, cam_pos, cam_R, bank, world=world,
                                  max_depth=max_depth)

    with_frames = render == "2d"

    @functools.partial(jax.jit, static_argnums=(3,))
    def sim_chunk(state, gs, world, n, action):
        """n sim steps as ONE device program; stacks per-step outputs."""

        def body(carry, _):
            state, gs, world = carry
            state, gs, world = sim_step(state, gs, world, action)
            out = (state.pos, state.vel, state.done)
            if with_frames:  # FPV full-world depth view (simulator.py:122)
                out = out + (render_frame_fn(state, world),)
            return (state, gs, world), out

        return jax.lax.scan(body, (state, gs, world), None, length=n)

    jit_step = jax.jit(sim_step)
    jit_step_virtual = jax.jit(sim_step_virtual)

    vt = None
    if virtual_target:
        if not spec.targets:
            # the guidance law keeps distance to the chased target; with no
            # targets the range gather would silently read a clamped index
            # of an empty array under jit (ADVICE r3)
            raise ValueError("virtual_target requires a world with targets "
                             "(simulator.targets in params.yaml)")
        from fpyv_tpu.inputs.mouse import VirtualTarget

        vt = VirtualTarget(rig.resolution)

    cv2 = None
    if render == "2d":
        import os

        # cv2.namedWindow ABORTS (uncatchable) without a display server;
        # only attempt the GUI when one exists, else frames go to frame_sink.
        if os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY"):
            try:
                import cv2 as _cv2

                _cv2.namedWindow("img")
                cv2 = _cv2
                if vt is not None:  # the reference's setMouseCallback wiring
                    _cv2.setMouseCallback("img", vt.cv2_callback)
            except Exception:
                cv2 = None
    ax = fig = None
    if render == "3d":
        from fpyv_tpu.viz.render3d import init_3d_axis

        ax, fig = init_3d_axis()

    def show_2d(frame_u8, pos, vel):
        from fpyv_tpu.viz.hud import hud_overlay

        dist = float(np.linalg.norm(
            np.asarray(world.sphere_center[target_idx]) - pos))
        frame = hud_overlay(frame_u8, dist_to_target=dist,
                            speed_ms=float(np.linalg.norm(vel)),
                            height_m=float(pos[2]))
        if frame_sink is not None:
            frame_sink(frame)
        if cv2 is not None:
            cv2.imshow("img", frame)
            return cv2.waitKey(1) & 0xFF == ord("q")
        return False

    default_action = jnp.asarray([-0.1, 0.0, 0.0, 0.0], jnp.float32)  # :89

    done_steps = 0
    crashed = False
    final_pos = np.asarray(state.pos)
    final_vel = np.asarray(state.vel)

    if joystick is not None or vt is not None:
        # interactive: per-step host loop (stick reads and mouse state
        # can't be scanned)
        for t in range(steps):
            action = (jnp.asarray(joystick.read_action(), jnp.float32)
                      if joystick is not None else default_action)
            if vt is not None:
                if target_events is not None:
                    for ev in (target_events(t) or ()):
                        vt.on_event(*ev)
                pixel = jnp.asarray(vt.pixel(), jnp.float32)
                state, gs, world = jit_step_virtual(state, gs, world, action,
                                                    pixel)
            else:
                state, gs, world = jit_step(state, gs, world, action)
            done_steps = t + 1
            if bool(state.done):
                crashed = True
                print("Crashed")  # simulator.py:92
                break
            if render == "2d" and t % 2 == 0:  # :164
                frame = np.asarray(render_frame_fn(state, world))
                if show_2d(frame, np.asarray(state.pos), np.asarray(state.vel)):
                    break
            elif render == "3d" and t % 3 == 0:  # :113
                from fpyv_tpu.viz.render3d import render_drone, show_plot

                ax.clear()
                render_drone(ax, state, params)
                show_plot(ax, fig, middle=np.asarray(state.pos), edge=5)
        final_pos = np.asarray(state.pos)
        final_vel = np.asarray(state.vel)
    else:
        # scripted: chunked scans — ~1 dispatch per `chunk` steps
        if chunk is None:
            chunk = 60 if render != "none" else 512
        t0 = 0
        while t0 < steps and not crashed:
            n = min(chunk, steps - t0)
            (state, gs, world), outs = sim_chunk(state, gs, world, n,
                                                 default_action)
            outs = jax.device_get(outs)  # one host transfer per chunk
            pos_h, vel_h, done_h = outs[0], outs[1], outs[2]
            frames_h = outs[3] if with_frames else None
            idx = int(np.argmax(done_h)) if bool(done_h.any()) else n - 1
            if bool(done_h[idx]):
                crashed = True
                print("Crashed")  # simulator.py:92
            done_steps = t0 + idx + 1
            final_pos, final_vel = pos_h[idx], vel_h[idx]
            for i in range(0, idx + 1):
                t = t0 + i
                if render == "2d" and t % 2 == 0:  # :164
                    if show_2d(frames_h[i], pos_h[i], vel_h[i]):
                        t0 = steps
                        break
                elif render == "3d" and t % 3 == 0:  # :113
                    from fpyv_tpu.viz.render3d import plot_3d_points, show_plot

                    # chunked mode draws the position trail per displayed
                    # step (full drone triads need per-step attitude, which
                    # the chunk doesn't stack — use joystick mode for that)
                    ax.clear()
                    plot_3d_points(ax, pos_h[: i + 1])
                    show_plot(ax, fig, middle=pos_h[i], edge=5)
            t0 += n

    return {
        "steps": done_steps,
        "crashed": crashed,
        "final_position": final_pos,
        "final_velocity": final_vel,
    }
