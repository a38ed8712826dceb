#!/usr/bin/env python3
"""Variance-reduction toolkit: antithetic variates, control variates,
and honest error bars — capabilities beyond the plain-MC reference.

Scenario: pricing a (unitless) European call payoff E[max(S - K, 0)]
under a lognormal terminal price S = exp(mu + sigma Z), plus raw-draw
extraction from an MCMC posterior.  Every estimator reports its own
error bar, so the reductions are visible as tighter intervals at the
SAME sample budget.
"""

import math

import numpy as np

from tpu_montecarlo import (
    Distribution,
    MonteCarloIntegrator,
    RandomWalk,
)

MU, SIGMA, STRIKE = 0.05, 0.35, 1.1
N = 4_000_000


def payoff(z):
    s = 2.718281828459045 ** (MU + SIGMA * z)
    return (s - STRIKE) * (s > STRIKE)


def closed_form():
    """Black-Scholes-style closed form for E[max(e^{mu+sigma Z}-K,0)]."""
    d1 = (MU + SIGMA * SIGMA - math.log(STRIKE)) / SIGMA
    d2 = d1 - SIGMA

    def phi(x):
        return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))

    return math.exp(MU + 0.5 * SIGMA * SIGMA) * phi(d1) - STRIKE * phi(d2)


def main():
    integ = MonteCarloIntegrator()
    d = Distribution.normal(0.0, 1.0)
    true = closed_form()
    print(f"target E[max(S-K,0)] = {true:.6f}  (closed form)\n")

    rows = []

    r = integ.integrate([payoff], d, n_samples=N, seed=7,
                        return_stderr=True)
    rows.append(("plain MC", r))

    r = integ.integrate([payoff], d, n_samples=N, seed=7,
                        method="antithetic", return_stderr=True)
    rows.append(("antithetic", r))

    # The payoff is monotone in S: S itself (known mean) and the
    # in-the-money indicator-free moments make strong controls.
    e_s = math.exp(MU + 0.5 * SIGMA * SIGMA)
    r = integ.integrate(
        [payoff], d, n_samples=N, seed=7, return_stderr=True,
        control_variates=[
            (lambda z: 2.718281828459045 ** (MU + SIGMA * z), e_s),
            (lambda z: z, 0.0),
        ],
    )
    rows.append(("control variates", r))

    r = integ.integrate([payoff], d, n_samples=N, seed=7,
                        method="qmc", return_stderr=True)
    rows.append(("randomized QMC", r))

    base = rows[0][1].stderr[0]
    for name, rr in rows:
        se = rr.stderr[0]
        print(f"{name:>18}: {rr.values[0]:.6f} +/- {se:.2e}"
              f"   (err {rr.values[0] - true:+.2e},"
              f" {base / max(se, 1e-30):5.1f}x tighter)")

    # Raw thinned draws from an MCMC run: the posterior itself, not
    # just expectations — e.g. a credible interval for S.
    post = integ.integrate_mcmc(
        [lambda z: z], d, RandomWalk(step_size=2.4, adapt=True),
        n_steps=4000, n_chains=2048, n_burnin=500, seed=7,
        return_samples=50,
    )
    s_draws = np.exp(MU + SIGMA * post.samples)
    lo, hi = np.percentile(s_draws, [5, 95])
    print(f"\nposterior S draws: {post.samples.shape} thinned states; "
          f"90% interval [{lo:.3f}, {hi:.3f}] "
          f"(exact [{math.exp(MU - 1.645 * SIGMA):.3f}, "
          f"{math.exp(MU + 1.645 * SIGMA):.3f}])")


if __name__ == "__main__":
    main()
