"""Property-style cross-backend agreement: for a deterministic family of
randomly-shaped table distributions, the Pallas kernels (interpreter) and
the XLA sweep must agree statistically on integrate, IS, and MCMC.

The backends share no sampling code beyond the host table builders, so
agreement across varied shapes (smooth, peaked, multi-modal, gapped,
edge-heavy) guards the whole in-kernel table machinery — stratified
sampling, gap-respecting tables, downsampled log tables, weight lookups —
against silent distribution-shape-dependent bias.
"""

import numpy as np
import pytest

from tpu_montecarlo import Distribution, MonteCarloIntegrator


def _random_table_dist(rng: np.random.RandomState):
    """A random piecewise-linear pdf on a random support: mixture of
    1-3 bumps, optional hard gap, optional edge spike."""
    lo = rng.uniform(-3.0, 0.0)
    hi = lo + rng.uniform(1.0, 5.0)
    x = np.linspace(lo, hi, 2048)
    p = np.zeros_like(x)
    for _ in range(rng.randint(1, 4)):
        c = rng.uniform(lo, hi)
        w = rng.uniform(0.05, 0.5) * (hi - lo)
        a = rng.uniform(0.3, 2.0)
        p += a * np.exp(-0.5 * ((x - c) / w) ** 2)
    if rng.rand() < 0.4:  # hard zero-density gap
        gl = rng.uniform(lo + 0.2 * (hi - lo), hi - 0.3 * (hi - lo))
        gw = rng.uniform(0.05, 0.15) * (hi - lo)
        p[(x > gl) & (x < gl + gw)] = 0.0
    if rng.rand() < 0.3:  # edge spike (steep log-cliff)
        p += np.where(x < lo + 0.02 * (hi - lo), 3.0, 0.0)
    return Distribution.from_pdf_table(x, p), (lo, hi)


FNS = [lambda v: v, lambda v: v * v]


@pytest.mark.parametrize("case_seed", [0, 1, 2, 3, 4, 5])
def test_integrate_agreement(case_seed):
    rng = np.random.RandomState(1000 + case_seed)
    dist, _ = _random_table_dist(rng)
    rp = MonteCarloIntegrator(backend="pallas").integrate(
        FNS, dist, n_samples=300_000, seed=7
    )
    rx = MonteCarloIntegrator(backend="xla").integrate(
        FNS, dist, n_samples=300_000, seed=7
    )
    scale = max(1.0, abs(rx.values[1]))
    np.testing.assert_allclose(rp.values, rx.values, atol=0.02 * scale)


@pytest.mark.parametrize("case_seed", [0, 1, 2])
def test_is_agreement(case_seed):
    rng = np.random.RandomState(2000 + case_seed)
    proposal, (lo, hi) = _random_table_dist(rng)
    target = Distribution.uniform(lo, hi)
    rp = MonteCarloIntegrator(backend="pallas").integrate_importance_sampling(
        FNS, target, proposal, n_samples=300_000, seed=7
    )
    rx = MonteCarloIntegrator(backend="xla").integrate_importance_sampling(
        FNS, target, proposal, n_samples=300_000, seed=7
    )
    # IS with a table proposal can have heavy weights where q is small;
    # agreement tolerance is correspondingly loose but still catches
    # wrong-branch/wrong-knot class bugs.
    scale = max(1.0, abs(rx.values[1]))
    np.testing.assert_allclose(rp.values, rx.values, atol=0.05 * scale)


@pytest.mark.parametrize("case_seed", [0, 1, 2])
def test_mcmc_agreement(case_seed):
    rng = np.random.RandomState(3000 + case_seed)
    target, (lo, hi) = _random_table_dist(rng)
    proposal = Distribution.uniform(lo, hi)
    rp = MonteCarloIntegrator(backend="pallas").integrate_mcmc(
        FNS, target, proposal,
        n_steps=2500, n_chains=512, n_burnin=300, seed=7,
    )
    rx = MonteCarloIntegrator(backend="xla").integrate_mcmc(
        FNS, target, proposal,
        n_steps=2500, n_chains=512, n_burnin=300, seed=7,
    )
    scale = max(1.0, abs(rx.values[1]))
    np.testing.assert_allclose(rp.values, rx.values, atol=0.05 * scale)
    assert abs(rp.acceptance_rate - rx.acceptance_rate) < 0.1
