"""Runnable applications: the interactive simulator, PPO training, parity checks."""
