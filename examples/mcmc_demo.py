#!/usr/bin/env python3
"""MCMC (Metropolis-Hastings) demo: 4096 parallel chains, one per lane.

Capability parity with reference examples/mcmc_demo.py, plus the
acceptance-rate observability this framework adds.
"""

from tpu_montecarlo import Distribution, MonteCarloIntegrator

integrator = MonteCarloIntegrator()

target = Distribution.normal(0.0, 1.0)
proposal = Distribution.normal(0.0, 2.0)

result = integrator.integrate_mcmc(
    [lambda x: x, lambda x: x**2],
    target,
    proposal,
    n_steps=10_000,
    n_chains=4096,
    n_burnin=1_000,
)

print(f"E[X]   = {result.values[0]:+.6f}  (expected: 0.0)")
print(f"E[X^2] = {result.values[1]:.6f}  (expected: 1.0)")
print(f"acceptance rate = {result.acceptance_rate:.3f}")
