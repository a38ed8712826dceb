#!/usr/bin/env python3
"""Quasi-Monte Carlo demo: convergence of MC vs QMC on smooth integrands.

``method="qmc"`` swaps the PRNG uniforms for a seed-rotated radical
inverse of the global sample index (a capability beyond the plain-MC
reference): the same kernels, the same sampling semantics, but the
integration error on smooth integrands shrinks like ~log(N)/N instead
of 1/sqrt(N).  This demo measures both at several sample counts and
prints the error table (and a log-log plot when matplotlib is around).

Run: python examples/qmc_demo.py
"""

import numpy as np

from tpu_montecarlo import Distribution, MonteCarloIntegrator

integrator = MonteCarloIntegrator()
dist = Distribution.normal(mean=0.0, std=1.0)

# E[X^2] = 1 and E[sin(X)] = 0 for N(0, 1).
funcs = [lambda x: x * x, lambda x: np.sin(x)]
expected = np.array([1.0, 0.0])

sample_counts = [10**k for k in range(4, 8)]
seeds = [1, 2, 3, 4, 5]

print(f"{'N':>12} {'MC max err':>14} {'QMC max err':>14} {'gain':>8}")
errors = {"mc": [], "qmc": []}
for n in sample_counts:
    for method in ("mc", "qmc"):
        err = max(
            np.abs(
                np.asarray(
                    integrator.integrate(
                        funcs, dist, n_samples=n, seed=s, method=method
                    ).values
                )
                - expected
            ).max()
            for s in seeds
        )
        errors[method].append(err)
    gain = errors["mc"][-1] / max(errors["qmc"][-1], 1e-12)
    print(
        f"{n:>12,} {errors['mc'][-1]:>14.3e} "
        f"{errors['qmc'][-1]:>14.3e} {gain:>7.1f}x"
    )

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    ax.loglog(sample_counts, errors["mc"], "o-", label="MC")
    ax.loglog(sample_counts, errors["qmc"], "s-", label="QMC")
    ax.loglog(
        sample_counts,
        [errors["mc"][0] * (sample_counts[0] / n) ** 0.5 for n in sample_counts],
        "k:", label=r"$N^{-1/2}$",
    )
    ax.loglog(
        sample_counts,
        [errors["qmc"][0] * (sample_counts[0] / n) for n in sample_counts],
        "k--", label=r"$N^{-1}$",
    )
    ax.set_xlabel("samples")
    ax.set_ylabel("max |error| over 5 seeds")
    ax.set_title("MC vs QMC convergence, E[X^2] and E[sin X] for N(0,1)")
    ax.legend()
    ax.grid(True, which="both", alpha=0.3)
    fig.savefig("qmc_convergence.png", dpi=120, bbox_inches="tight")
    print("\nwrote qmc_convergence.png")
except ImportError:
    print("\n(matplotlib not available; skipped the plot)")
