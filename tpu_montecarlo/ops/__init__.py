"""Compute ops: XLA sweeps (portable) and Pallas kernels (TPU hot path)."""
