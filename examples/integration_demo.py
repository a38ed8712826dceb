#!/usr/bin/env python3
"""Monte Carlo integration demo: variance of a standard normal.

Variance = E[X^2] - E[X]^2, estimated with three fused integrands over
shared samples (capability parity with reference
examples/integration_demo.py; runs on TPU when available, CPU otherwise).
"""

from tpu_montecarlo import Distribution, MonteCarloIntegrator

coeff_a = 1.0
coeff_b = 0.0

integrator = MonteCarloIntegrator()
dist = Distribution.normal(mean=0.0, std=1.0)

funcs = [
    lambda x: x,
    lambda x: x**2,
    lambda x: coeff_a * x**2 + coeff_b * x,
]
result = integrator.integrate(funcs, dist, n_samples=100_000_000)

mean = result.values[0]
variance = result.values[1] - mean**2

print(f"E[X]       = {result.values[0]:.6f}     (expected: 0.0)")
print(f"E[X^2]     = {result.values[1]:.6f}  (expected: 1.0)")
print(f"Variance   = {variance:.6f}  (expected: 1.0)")
print(f"E[aX^2+bX] = {result.values[2]:.6f}  (expected: 1.0, a={coeff_a}, b={coeff_b})")
