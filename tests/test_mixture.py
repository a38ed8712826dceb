"""``Distribution.mixture``: finite mixtures as CUSTOM tables.

The mixture compiles the components' pdfs into one table, so every
existing table behavior must compose: moments on both backends, the
gap-respecting sampler between well-separated modes, MCMC targets, and
replica-exchange tempering on the resulting multimodal density (the
reference can only reach a multimodal target through a hand-written pdf,
python/wgpu_montecarlo/__init__.py:416-460).
"""

import numpy as np
import pytest

from tpu_montecarlo import (
    Distribution,
    MonteCarloIntegrator,
    RandomWalk,
    integrate,
    integrate_mcmc,
)


def _bimodal(sep=3.0, w=(0.3, 0.7)):
    return Distribution.mixture(
        [Distribution.normal(-sep, 1.0), Distribution.normal(sep, 1.0)],
        weights=w,
    )


class TestMoments:
    def test_bimodal_moments(self):
        d = _bimodal(sep=3.0, w=(0.3, 0.7))
        res = integrate(
            [lambda x: x, lambda x: x * x], d, n_samples=400_000, seed=1
        )
        mean = 0.3 * -3.0 + 0.7 * 3.0
        second = 0.3 * (1 + 9.0) + 0.7 * (1 + 9.0)
        assert abs(res[0] - mean) < 0.05
        assert abs(res[1] - second) < 0.15

    def test_matches_xla_backend(self):
        d = _bimodal()
        r_x = MonteCarloIntegrator(backend="xla").integrate(
            [lambda x: x], d, n_samples=200_000, seed=2
        )
        r_p = MonteCarloIntegrator(backend="pallas").integrate(
            [lambda x: x], d, n_samples=200_000, seed=2
        )
        assert abs(r_x[0] - r_p[0]) < 0.08

    def test_uniform_plus_exponential(self):
        d = Distribution.mixture(
            [Distribution.uniform(0.0, 1.0), Distribution.exponential(1.0)],
            weights=[0.5, 0.5],
        )
        res = integrate([lambda x: x], d, n_samples=400_000, seed=3)
        assert abs(res[0] - (0.5 * 0.5 + 0.5 * 1.0)) < 0.03


class TestGapComposition:
    def test_separated_modes_leave_a_gap(self):
        """Modes 16 sigma apart: the inter-mode density underflows to
        exact zeros, and the sampler must never emit a sample there."""
        d = Distribution.mixture(
            [Distribution.normal(-8.0, 0.5), Distribution.normal(8.0, 0.5)]
        )
        from tpu_montecarlo.sampling import dist_spec_of

        assert dist_spec_of(d).exact_inverse
        res = integrate(
            [lambda x: 1.0 * (abs(x) < 4.0)], d, n_samples=400_000, seed=4
        )
        assert res[0] < 1e-6

    def test_weight_split_between_modes(self):
        d = Distribution.mixture(
            [Distribution.normal(-8.0, 0.5), Distribution.normal(8.0, 0.5)],
            weights=[0.25, 0.75],
        )
        res = integrate(
            [lambda x: 1.0 * (x > 0.0)], d, n_samples=400_000, seed=5
        )
        assert abs(res[0] - 0.75) < 0.01


class TestValidation:
    def test_needs_two_components(self):
        with pytest.raises(ValueError):
            Distribution.mixture([Distribution.normal(0.0, 1.0)])

    def test_rejects_non_distribution(self):
        with pytest.raises(TypeError):
            Distribution.mixture([Distribution.normal(0.0, 1.0), 3.0])

    def test_rejects_bad_weights(self):
        comps = [Distribution.normal(0.0, 1.0), Distribution.normal(2.0, 1.0)]
        with pytest.raises(ValueError):
            Distribution.mixture(comps, weights=[1.0])
        with pytest.raises(ValueError):
            Distribution.mixture(comps, weights=[1.0, -1.0])

    def test_weights_normalised(self):
        d = Distribution.mixture(
            [Distribution.normal(-2.0, 1.0), Distribution.normal(2.0, 1.0)],
            weights=[2.0, 2.0],
        )
        res = integrate([lambda x: x], d, n_samples=200_000, seed=6)
        assert abs(res[0]) < 0.05


class TestMcmcTarget:
    def test_tempered_mixture_target(self):
        """The flagship composition: a walk on a bimodal mixture target
        recovers the global mean only with replica exchange."""
        target = _bimodal(sep=4.0, w=(0.5, 0.5))
        res = integrate_mcmc(
            [lambda x: x], target,
            RandomWalk(step_size=0.8, adapt=True, init_range=(2.0, 6.0)),
            n_steps=3_000, n_chains=256, n_burnin=800, seed=7,
            temperatures=[1.0, 3.0, 9.0, 27.0],
        )
        assert abs(res[0]) < 0.5
        assert 0.0 < res.diagnostics["swap_rate"] <= 1.0

    def test_plain_mcmc_mixture_target(self):
        target = Distribution.mixture(
            [Distribution.normal(-1.0, 1.0), Distribution.normal(1.0, 1.0)]
        )
        res = integrate_mcmc(
            [lambda x: x * x], target, Distribution.normal(0.0, 3.0),
            n_steps=2_000, n_chains=512, n_burnin=500, seed=8,
        )
        # E[X^2] = 1 + 1 = 2 for the +-1 unit-variance pair.
        assert abs(res[0] - 2.0) < 0.15
