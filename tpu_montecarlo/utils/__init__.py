"""Utilities: workload planning, profiling helpers."""
