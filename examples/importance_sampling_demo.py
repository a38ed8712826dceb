#!/usr/bin/env python3
"""Importance sampling demo: estimate E_p[f(X)] sampling from proposal q.

Capability parity with reference examples/importance_sampling_demo.py.
"""

from tpu_montecarlo import Distribution, MonteCarloIntegrator

integrator = MonteCarloIntegrator()

target = Distribution.normal(0.0, 1.0)
proposal = Distribution.normal(0.5, 1.5)

result = integrator.integrate_importance_sampling(
    [lambda x: x, lambda x: x**2],
    target,
    proposal,
    n_samples=10_000_000,
)

print(f"E_p[X]   = {result.values[0]:+.6f}  (expected: 0.0)")
print(f"E_p[X^2] = {result.values[1]:.6f}  (expected: 1.0)")
