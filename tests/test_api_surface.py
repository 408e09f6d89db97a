"""API surface: every module imports; public symbols resolve; train CLI runs."""

import importlib
import json
import pkgutil

import numpy as np
import pytest

import fpyv_tpu


def test_every_module_imports():
    """Walk the whole package: no module may fail to import (gated hardware
    deps must degrade, not explode)."""
    failures = []
    for info in pkgutil.walk_packages(fpyv_tpu.__path__, "fpyv_tpu."):
        try:
            importlib.import_module(info.name)
        except Exception as e:  # noqa: BLE001
            failures.append((info.name, repr(e)))
    assert not failures, failures


def test_top_level_exports():
    from fpyv_tpu import config, envs, ops, physics, rl, parallel  # noqa: F401
    from fpyv_tpu.envs import (  # noqa: F401
        AcroEnv, BallEnv, GymAdapter, HoverEnv, MaComGridEnv, MultiRaceEnv,
        RotateEnv, SensorAcroEnv, VisionAcroEnv)
    from fpyv_tpu.physics import (  # noqa: F401
        DroneParams, DroneState, RacerParams, ThrustCurve, World,
        drone_reset, drone_step)
    from fpyv_tpu.rl import (  # noqa: F401
        PpoConfig, ReplayBuffer, SacConfig, compute_gae, make_ppo, make_sac)
    from fpyv_tpu.world import (  # noqa: F401
        RenderBank, WorldRanges, WorldSpec, build_world, icosphere,
        sample_worlds)
    from fpyv_tpu.utils import (  # noqa: F401
        MetricsLogger, Throughput, assert_finite, finite_mask,
        restore_checkpoint, save_checkpoint, timeit)


@pytest.mark.slow
class TestTrainCli:
    def test_train_command_smoke(self, tmp_path):
        """Tiny end-to-end train run through the CLI (CPU)."""
        from tests.test_racer_and_io import TestCliE2e

        r = TestCliE2e()._run(
            "train", "--num-envs", "32", "--iterations", "2",
            "--num-steps", "4", "--log-dir", str(tmp_path / "logs"),
            "--checkpoint-dir", str(tmp_path / "ckpt"))
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["iterations"] == 2
        assert np.isfinite(out["mean_reward_last"])
        # checkpoint written
        assert (tmp_path / "ckpt").exists()
        assert (tmp_path / "logs" / "metrics.jsonl").exists()


@pytest.mark.slow
class TestTrainVision:
    def test_train_vision_smoke(self, tmp_path):
        """Pixels-to-action PPO: tiny run on per-env randomized worlds."""
        from fpyv_tpu.apps.train import train_vision
        from fpyv_tpu.vision.camera import CameraRig

        rig = CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0),
                        fov_deg=120.0, resolution=(32, 24))
        res = train_vision(num_envs=8, num_iterations=2, num_steps=4,
                           rig=rig, num_minibatches=2, scan_chunk=2,
                           log_dir=str(tmp_path / "logs"))
        assert res.iterations == 2
        assert np.isfinite(res.mean_reward_last)
        assert (tmp_path / "logs" / "metrics.jsonl").exists()


class TestPlayPolicy:
    def test_train_checkpoint_play_roundtrip(self, tmp_path):
        """The full loop: train acro briefly with checkpointing, then fly
        the checkpoint deterministically via play_policy, recording video."""
        pytest.importorskip("cv2")
        from fpyv_tpu.apps.play import play_policy
        from fpyv_tpu.apps.train import train_acro

        ckpt = str(tmp_path / "ckpt")
        train_acro(num_envs=8, num_iterations=2, num_steps=4, seed=0,
                   scan_chunk=2, hidden=(16,), checkpoint_dir=ckpt,
                   checkpoint_every=2, print_every=100)
        video = str(tmp_path / "flight.mp4")
        out = play_policy(checkpoint_dir=ckpt, env_name="acro", steps=12,
                          num_envs=4, hidden=(16,), chunk=6,
                          save_video=video)
        assert out["steps"] == 12
        assert np.isfinite(out["mean_reward_per_step"])
        assert out["video_frames"] == 12
        import os

        assert os.path.getsize(video) > 1000

    def test_play_race_stats(self, tmp_path):
        """play_policy on the race env reports gates_passed without a
        checkpoint (params handoff)."""
        import jax
        from fpyv_tpu.apps.play import play_policy
        from fpyv_tpu.envs.multi_race import MultiRaceEnv
        from fpyv_tpu.models.policy import ActorCritic

        env = MultiRaceEnv(n_agents=2)
        _, obs = env.reset(jax.random.key(0))
        net = ActorCritic(action_dim=4, hidden=(16,))
        params = net.init(jax.random.key(1), obs.reshape(2, -1)[:1])
        out = play_policy(checkpoint_dir=None, env_name="race", steps=8,
                          num_envs=4, n_agents=2, hidden=(16,), chunk=4,
                          params=params)
        assert "final_gates_passed_mean" in out
        assert np.isfinite(out["mean_reward_per_step"])


class TestCliSurface:
    """The round-3 CLI additions parse (help text smoke — no training)."""

    def test_train_help_lists_new_flags(self):
        from tests.test_racer_and_io import TestCliE2e

        r = TestCliE2e()._run("train", "--help")
        assert r.returncode == 0
        for flag in ("--torso", "--pixel-store", "--update-epochs",
                     "--gate-size", "--max-episode-steps",
                     "--warmup-steps", "--updates-per-step", "sac"):
            assert flag in r.stdout, flag

    def test_play_help_lists_vision_race(self):
        from tests.test_racer_and_io import TestCliE2e

        r = TestCliE2e()._run("play", "--help")
        assert r.returncode == 0
        assert "vision_race" in r.stdout
        assert "--torso" in r.stdout
