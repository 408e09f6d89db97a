"""Racer model parity, motor-CSV cross-validation, CLI e2e, bank downsample."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpyv_tpu.physics.racer import RacerParams, racer_reset, racer_step

REPO = Path(__file__).resolve().parents[1]
REFERENCE_CSV = Path("/root/reference/config/t_motos_f80_motor_test.csv")


def oracle_racer_steps(params, actions):
    """Float64 oracle of racer_drone_test.py:85-103 (scipy-free)."""

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    gains = np.array([params.pid_roll, params.pid_pitch, params.pid_yaw])
    pos = np.zeros(3)
    vel = np.zeros(3)
    R = np.eye(3)
    omega = np.zeros(3)
    i_err = np.zeros(3)
    last = np.zeros(3)
    first = True
    traj = []
    for a in actions:
        err = a[:3] - omega
        i_err = i_err + err * params.dt
        d = np.zeros(3) if first else (err - last) / params.dt
        first = False
        last = err.copy()
        torque = gains[:, 0] * err + gains[:, 1] * i_err + gains[:, 2] * d
        omega = omega + torque * params.dt / params.inertia
        R = R @ (rx(omega[0]) @ ry(omega[1]) @ rz(omega[2]))
        accel = a[3] * R[:, 2] / params.mass
        vel = params.velocity_damping * vel + accel * params.dt
        pos = pos + vel * params.dt
        traj.append((pos.copy(), R.copy(), omega.copy()))
    return traj


class TestRacer:
    def test_matches_oracle(self):
        params = RacerParams()
        rng = np.random.default_rng(0)
        T = 200
        actions = rng.uniform(-1, 1, (T, 4)) * np.array([50, 50, 5, 2.0])
        ref = oracle_racer_steps(params, actions)

        state = racer_reset((), jnp.float64)

        def body(st, a):
            st = racer_step(params, st, a)
            return st, (st.pos, st.R, st.omega)

        _, (pos, R, omega) = jax.lax.scan(
            body, state, jnp.asarray(actions, jnp.float64))
        for t in [0, 1, 50, 199]:
            np.testing.assert_allclose(np.asarray(pos[t]), ref[t][0],
                                       atol=1e-10, err_msg=f"t={t}")
            np.testing.assert_allclose(np.asarray(R[t]), ref[t][1], atol=1e-10)
            np.testing.assert_allclose(np.asarray(omega[t]), ref[t][2],
                                       atol=1e-10)

    def test_rate_tracking(self):
        """The torque PIDs should track a rate setpoint (the reference's
        demo behavior: step commands converge)."""
        params = RacerParams()
        state = racer_reset((), jnp.float64)
        cmd = jnp.asarray([80.0, 10.0, 0.0, 0.0], jnp.float64)
        for _ in range(1500):
            state = racer_step(params, state, cmd)
        np.testing.assert_allclose(np.asarray(state.omega[:2]), [80.0, 10.0],
                                   rtol=0.05)

    def test_batched(self):
        params = RacerParams()
        state = racer_reset((16,), jnp.float32)
        a = jnp.zeros((16, 4)).at[:, 3].set(1.0)
        state = racer_step(params, state, a)
        assert state.pos.shape == (16, 3)
        # thrust along +z lifts all
        assert (np.asarray(state.vel[:, 2]) > 0).all()


@pytest.mark.skipif(not REFERENCE_CSV.exists(),
                    reason="reference CSV not mounted")
class TestMotorCsvCrossValidation:
    def test_baked_tables_match_reference_csv(self):
        """The baked F80 tables must reproduce the thrust curve fitted from
        the actual reference CSV file."""
        from fpyv_tpu.physics.motor import (
            default_thrust_curve, thrust_curve_from_csv)

        for idx in range(5):
            baked = default_thrust_curve(idx)
            from_csv = thrust_curve_from_csv(REFERENCE_CSV, idx)
            np.testing.assert_allclose(baked.throttle2thrust_coeffs,
                                       from_csv.throttle2thrust_coeffs,
                                       rtol=1e-12)
            np.testing.assert_allclose(baked.thrust2throttle_coeffs,
                                       from_csv.thrust2throttle_coeffs,
                                       rtol=1e-12)


@pytest.mark.slow
class TestCliE2e:
    def _run(self, *args):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
        return subprocess.run(
            [sys.executable, "-m", "fpyv_tpu.cli", *args],
            capture_output=True, text=True, timeout=420, env=env, cwd=REPO)

    def test_parity_command(self):
        r = self._run("parity", "--steps", "60")
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["pass"] is True
        assert out["max_position_error"] < 1e-8

    def test_hover_time_command(self):
        if not REFERENCE_CSV.exists():
            pytest.skip("reference CSV not mounted")
        r = self._run("hover-time", "--csv", str(REFERENCE_CSV),
                      "--idx", "0", "--dry-mass", "100")
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["detected_cells"] == 6  # block 0 is the 6S bench run
        assert 0 < out["max_hover_time_minutes"] < 120


class TestBankDownsample:
    def test_downsample_preserves_objects(self):
        from fpyv_tpu.world.generators import WorldSpec
        from fpyv_tpu.world.render_bank import bank_downsample, build_render_bank
        from fpyv_tpu.config import FpyvConfig

        spec = WorldSpec.from_config(FpyvConfig().simulator, seed=0)
        bank = build_render_bank(spec)
        small = bank_downsample(bank, 4)
        assert small.num_points <= bank.num_points // 3
        assert small.num_objects == bank.num_objects
        # every object still has at least one point
        assert set(np.unique(small.point_obj)) == set(range(bank.num_objects))


@pytest.mark.slow
class TestSimCli:
    def test_sim_command_headless(self):
        r = TestCliE2e()._run("sim", "--steps", "40", "--render", "none",
                              "--seed", "0")
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["steps"] >= 1
        assert len(out["final_position"]) == 3
