#!/usr/bin/env python3
"""Benchmark: TPU-fused integrate vs pure-Python loop vs NumPy.

Capability parity with reference examples/benchmark.py (same integrand,
same sample-size sweep, same three-way comparison and log-log plot; the
plot is saved to a file rather than shown since TPU hosts are headless).
"""

import time

import numpy as np
from numpy import cos, exp, sin

import tpu_montecarlo as tmc


def f1(x):
    b = exp(sin(x)) + cos(exp(x))
    return x / b


SAMPLE_SIZES = [1000, 5000, 10000, 50000, 100000, 500000, 1000000, 5000000, 10000000]

functions = [f1]

tpu_times = []
manual_times = []
numpy_times = []

integrator = tmc.MonteCarloIntegrator()

# Warm up / compile
integrator.integrate(functions, tmc.Distribution.normal(0.0, 1.0), n_samples=1000)

for N_SAMPLES in SAMPLE_SIZES:
    print(f"\n{'=' * 60}")
    print(f"Testing with {N_SAMPLES:,} samples")
    print(f"{'=' * 60}")

    start = time.time()
    result = integrator.integrate(
        functions, tmc.Distribution.normal(0.0, 1.0), n_samples=N_SAMPLES
    )
    tpu_time = time.time() - start
    tpu_times.append(tpu_time)
    print(f"TPU Monte Carlo results: {result.values}")
    print(f"TPU execution time: {tpu_time:.6f} seconds")

    start = time.time()
    manual_sums = [0.0 for _ in functions]
    for _ in range(N_SAMPLES):
        x = np.random.normal(0.0, 1.0)
        for j, func in enumerate(functions):
            manual_sums[j] += func(x)
    manual_means = [s / N_SAMPLES for s in manual_sums]
    manual_time = time.time() - start
    manual_times.append(manual_time)
    print(f"Manual Monte Carlo results: {manual_means}")
    print(f"Manual execution time: {manual_time:.6f} seconds")

    start = time.time()
    x_samples = np.random.normal(0.0, 1.0, N_SAMPLES)
    numpy_means = [float(np.mean(func(x_samples))) for func in functions]
    numpy_time = time.time() - start
    numpy_times.append(numpy_time)
    print(f"NumPy Monte Carlo results: {numpy_means}")
    print(f"NumPy execution time: {numpy_time:.6f} seconds")

    print(f"\nSpeedup (TPU vs Manual): {manual_time / tpu_time:.2f}x")
    print(f"Speedup (TPU vs NumPy): {numpy_time / tpu_time:.2f}x")

try:
    from matplotlib import pyplot as plt

    plt.figure(figsize=(8, 6), dpi=100, layout="constrained")
    plt.loglog(SAMPLE_SIZES, tpu_times, "o-", label="TPU", linewidth=2, markersize=8)
    plt.loglog(
        SAMPLE_SIZES, manual_times, "s-",
        label="Manual (for loop)", linewidth=2, markersize=8,
    )
    plt.loglog(SAMPLE_SIZES, numpy_times, "^-", label="NumPy", linewidth=2, markersize=8)
    plt.xlabel("Number of Samples", fontsize=12)
    plt.ylabel("Execution Time (seconds)", fontsize=12)
    plt.title("Monte Carlo Integration Performance Comparison", fontsize=14)
    plt.legend(fontsize=11)
    plt.savefig("benchmark.png")
    print("\nSaved plot to benchmark.png")
except ImportError:
    print("\nmatplotlib not available; skipping plot")
