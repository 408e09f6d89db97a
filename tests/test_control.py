"""PID + rates-controller parity tests vs the float64 oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from fpyv_tpu.control import (
    PidParams, pid_init, pid_step,
    RatesControllerParams, rates_controller_init, rates_controller_step,
)
from fpyv_tpu.ops import rotations as rot
from tools.oracle.sim import OraclePid, OracleRatesController, euler_to_R


class TestPidParity:
    def test_sequence_matches_oracle(self):
        p = PidParams(kP=0.1, kI=2.0, kD=0.05, dt=1 / 60, integral_clip=100.0,
                      min_output=0.05, max_output=40.0,
                      derivative_transition_rate=0.2)
        oracle = OraclePid(kP=0.1, kI=2.0, kD=0.05, dt=1 / 60,
                           integral_clip=100.0, min_output=0.05, max_output=40.0,
                           derivative_transition_rate=0.2)
        rng = np.random.default_rng(0)
        st = pid_init((), jnp.float64)
        for _ in range(200):
            cur, tgt = rng.normal(), rng.normal()
            st, out = pid_step(p, st, cur, tgt)
            ref = oracle(cur, tgt)
            np.testing.assert_allclose(float(out), ref, atol=1e-12)

    def test_batched(self):
        p = PidParams(kP=1.0, kI=0.5, kD=0.1, dt=0.01)
        st = pid_init((16,), jnp.float64)
        rng = np.random.default_rng(1)
        cur = jnp.asarray(rng.normal(size=(16,)))
        tgt = jnp.asarray(rng.normal(size=(16,)))
        st, out = pid_step(p, st, cur, tgt)
        assert out.shape == (16,)
        # each lane equals its scalar run
        for i in range(16):
            sti = pid_init((), jnp.float64)
            _, oi = pid_step(p, sti, cur[i], tgt[i])
            np.testing.assert_allclose(float(out[i]), float(oi), atol=1e-15)


class TestRatesControllerParity:
    def test_sequence_matches_oracle(self):
        params = RatesControllerParams(gain=30.0, max_rates=480.0,
                                       state_transition_coef=0.75,
                                       goal_transition_coef=0.9,
                                       error_transition_coef=0.9)
        oracle = OracleRatesController(30.0, 480.0, 0.75, 0.9, 0.9)
        rng = np.random.default_rng(2)
        st = rates_controller_init((), jnp.float64)
        for _ in range(100):
            ec = rng.uniform(-1, 1, 3)
            eg = rng.uniform(-1, 1, 3)
            Rc, Rg = euler_to_R(*ec), euler_to_R(*eg)
            st, rates, _ = rates_controller_step(
                params, st, jnp.asarray(Rc), jnp.asarray(Rg))
            ref = oracle.get_rates(Rc, Rg)
            np.testing.assert_allclose(np.asarray(rates), ref, atol=1e-10)

    def test_converges_in_rotate_loop(self):
        """Closed loop: controller + rotate_body_by_rates drives error down
        (the reference's rotation_pid.py main-loop behavior, minus noise)."""
        params = RatesControllerParams(gain=30.0, max_rates=480.0)
        dt = 1 / 60
        rng = np.random.default_rng(3)
        goal = rot.euler_to_rotmat(jnp.asarray(rng.uniform(-0.8, 0.8, 3)))
        cur = rot.euler_to_rotmat(jnp.asarray(rng.uniform(-0.8, 0.8, 3)))
        st = rates_controller_init((), jnp.float64)

        def err(c):
            rel = jnp.einsum("ji,jk->ik", goal, c, precision="highest")
            return float(jnp.sum((rel - jnp.eye(3)) ** 2))

        e0 = err(cur)
        for _ in range(300):
            st, rates, _ = rates_controller_step(params, st, cur, goal)
            cur = rot.rotate_body_by_rates(cur, rates, dt)
        assert err(cur) < 1e-4 * max(e0, 1.0), (e0, err(cur))
