#!/usr/bin/env python3
"""Fused multi-integrand integration: pricing a European call by Monte Carlo.

One compiled pass estimates the option price, its second moment, and the
in-the-money probability on SHARED normal samples, with error bars from the
in-kernel sum-of-squares accumulators (``return_stderr=True``).  The
Black-Scholes closed form provides the ground truth.
"""

import math

from tpu_montecarlo import Distribution, MonteCarloIntegrator

S0, STRIKE, RATE, VOL, T = 100.0, 105.0, 0.03, 0.2, 1.0

DRIFT = (RATE - 0.5 * VOL * VOL) * T
SIGT = VOL * math.sqrt(T)
DISCOUNT = math.exp(-RATE * T)


def terminal_price(z):
    return S0 * math.exp(DRIFT + SIGT * z)


def discounted_payoff(z):
    s = terminal_price(z)
    return DISCOUNT * (s - STRIKE) * (s > STRIKE)


def payoff_sq(z):
    p = discounted_payoff(z)
    return p * p


def in_the_money(z):
    return terminal_price(z) > STRIKE


def black_scholes_call():
    d1 = (math.log(S0 / STRIKE) + (RATE + 0.5 * VOL**2) * T) / SIGT
    d2 = d1 - SIGT
    phi = lambda v: 0.5 * (1.0 + math.erf(v / math.sqrt(2.0)))  # noqa: E731
    return S0 * phi(d1) - STRIKE * DISCOUNT * phi(d2), phi(d2)


mc = MonteCarloIntegrator()
result = mc.integrate(
    [discounted_payoff, payoff_sq, in_the_money],
    Distribution.normal(0.0, 1.0),
    n_samples=50_000_000,
    return_stderr=True,
)

price, second_moment, p_itm = result.values
bs_price, bs_p_itm = black_scholes_call()
payoff_std = math.sqrt(max(second_moment - price**2, 0.0))

print("European call, S0=100 K=105 r=3% vol=20% T=1y, 5e7 paths")
print(f"  MC price        {price:9.4f} +/- {result.stderr[0]:.4f}")
print(f"  Black-Scholes   {bs_price:9.4f}")
print(f"  payoff stdev    {payoff_std:9.4f}")
print(f"  P(in the money) {p_itm:9.4f} +/- {result.stderr[2]:.4f}"
      f"   (closed form {bs_p_itm:.4f})")
assert abs(price - bs_price) < 4 * result.stderr[0] + 1e-3
