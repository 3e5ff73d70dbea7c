"""Offline replay harness, sensor simulation, evaluation (reference app/ role)."""
