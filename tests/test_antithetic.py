"""Antithetic variates (``method="antithetic"``): every uniform draw is
used at ``u`` AND its mirror ``1 - u`` through the monotone inverse-CDF
transforms (the NORMAL pair reflects z about the mean) — a classic
variance-reduction surface beyond the plain-MC reference.

Contract under test:
  * identical API surface (integrate / compile / IS / nd), routed by the
    ``method`` kwarg validated against {"mc", "qmc", "antithetic"};
  * unbiased: family moments match closed forms at MC tolerances;
  * EXACT pair cancellation for odd integrands under symmetric
    distributions (the estimate equals the mean to f32 summation, the
    error bar collapses to ~0);
  * real variance reduction on monotone integrands, and HONEST error
    bars — the pair mean is the iid unit, so an even integrand (whose
    pair members coincide) reports sqrt(2) WIDER stderr than iid MC,
    not narrower;
  * bit-equality contracts: seed-batched elements equal unbatched
    calls; values with and without stderr are identical.
"""

import math
import warnings

import numpy as np
import pytest

from tpu_montecarlo import (
    Distribution,
    MonteCarloIntegrator,
    integrate,
    integrate_importance_sampling,
    pack_param_batch,
)

BACKENDS = ["xla", "pallas"]


class TestExactCancellation:
    """Odd integrands under symmetric distributions: x and its mirror
    2*mean - x average to the mean EXACTLY, pair by pair."""

    @pytest.mark.parametrize("backend", BACKENDS)
    def test_normal_mean_exact(self, backend):
        integ = MonteCarloIntegrator(backend=backend)
        r = integ.integrate(
            [lambda x: x], Distribution.normal(3.0, 2.0),
            n_samples=200_000, seed=42, method="antithetic",
            return_stderr=True,
        )
        assert abs(r.values[0] - 3.0) < 1e-5
        assert r.stderr[0] < 1e-7

    @pytest.mark.parametrize("backend", BACKENDS)
    def test_uniform_mean_exact(self, backend):
        integ = MonteCarloIntegrator(backend=backend)
        r = integ.integrate(
            [lambda x: x], Distribution.uniform(-1.0, 3.0),
            n_samples=200_000, seed=7, method="antithetic",
            return_stderr=True,
        )
        assert abs(r.values[0] - 1.0) < 1e-5
        assert r.stderr[0] < 1e-6


class TestUnbiased:
    """Second moments and asymmetric families at plain MC tolerances."""

    @pytest.mark.parametrize("backend", BACKENDS)
    def test_normal_second_moment(self, backend):
        integ = MonteCarloIntegrator(backend=backend)
        r = integ.integrate(
            [lambda x: x * x], Distribution.normal(3.0, 2.0),
            n_samples=400_000, seed=42, method="antithetic",
        )
        assert abs(r.values[0] - 13.0) < 0.15

    @pytest.mark.parametrize("backend", BACKENDS)
    def test_exponential(self, backend):
        integ = MonteCarloIntegrator(backend=backend)
        r = integ.integrate(
            [lambda x: x, lambda x: x * x], Distribution.exponential(2.0),
            n_samples=400_000, seed=42, method="antithetic",
        )
        assert abs(r.values[0] - 0.5) < 0.01
        assert abs(r.values[1] - 0.5) < 0.03

    @pytest.mark.parametrize("backend", BACKENDS)
    def test_extended_family(self, backend):
        integ = MonteCarloIntegrator(backend=backend)
        r = integ.integrate(
            [lambda x: x], Distribution.lognormal(0.0, 0.5),
            n_samples=400_000, seed=42, method="antithetic",
        )
        assert abs(r.values[0] - math.exp(0.125)) < 0.02

    @pytest.mark.parametrize("backend", BACKENDS)
    def test_custom_table(self, backend):
        tri = Distribution.from_pdf(
            lambda x: 1.0 - abs(x) if abs(x) < 1 else 0.0
        )
        integ = MonteCarloIntegrator(backend=backend)
        r = integ.integrate(
            [lambda x: x, lambda x: x * x], tri,
            n_samples=400_000, seed=42, method="antithetic",
        )
        assert abs(r.values[0]) < 0.01
        assert abs(r.values[1] - 1.0 / 6.0) < 0.01


class TestVarianceReduction:
    @pytest.mark.parametrize("backend", BACKENDS)
    def test_monotone_integrand_beats_mc(self, backend):
        """exp(x/2) under N(0,1) is monotone: the pair correlation is
        strongly negative, so the honest antithetic error bar is well
        under the iid MC one at equal N."""
        integ = MonteCarloIntegrator(backend=backend)
        kw = dict(n_samples=400_000, seed=1, return_stderr=True)
        f = [lambda x: math.e ** (0.5 * x)]
        d = Distribution.normal(0.0, 1.0)
        rm = integ.integrate(f, d, method="mc", **kw)
        ra = integ.integrate(f, d, method="antithetic", **kw)
        assert abs(ra.values[0] - math.exp(0.125)) < 0.01
        assert ra.stderr[0] < 0.7 * rm.stderr[0]

    def test_even_integrand_honest_stderr(self):
        """x^2 under N(0,1): the mirror evaluates to the SAME value, so
        pairs are perfectly correlated and the pair-unit error bar must
        come out ~sqrt(2) WIDER than iid MC — the estimator really is
        that much worse, and the error bar must say so."""
        integ = MonteCarloIntegrator(backend="xla")
        kw = dict(n_samples=400_000, seed=3, return_stderr=True)
        f = [lambda x: x * x]
        d = Distribution.normal(0.0, 1.0)
        rm = integ.integrate(f, d, method="mc", **kw)
        ra = integ.integrate(f, d, method="antithetic", **kw)
        ratio = ra.stderr[0] / rm.stderr[0]
        assert 1.25 < ratio < 1.6  # ~sqrt(2), MC noise on both bars


class TestContracts:
    def test_method_validated(self):
        with pytest.raises(ValueError, match="antithetic"):
            integrate(
                [lambda x: x], Distribution.normal(0.0, 1.0),
                n_samples=1000, method="bogus",
            )

    @pytest.mark.parametrize("backend", BACKENDS)
    def test_values_bit_equal_with_and_without_stderr(self, backend):
        integ = MonteCarloIntegrator(backend=backend)
        d = Distribution.normal(1.0, 2.0)
        f = [lambda x: x * x * x]
        r1 = integ.integrate(
            f, d, n_samples=100_000, seed=9, method="antithetic"
        )
        r2 = integ.integrate(
            f, d, n_samples=100_000, seed=9, method="antithetic",
            return_stderr=True,
        )
        np.testing.assert_array_equal(r1.values, r2.values)

    @pytest.mark.parametrize("backend", BACKENDS)
    def test_seed_batch_bit_equal(self, backend):
        integ = MonteCarloIntegrator(backend=backend)
        d = Distribution.exponential(1.5)
        f = [lambda x: x]
        prog = integ.compile_integrate(
            f, d, n_samples=100_000, seed_batch=3, method="antithetic"
        )
        batched = np.asarray(prog([5, 6, 7]))
        single = integ.compile_integrate(
            f, d, n_samples=100_000, method="antithetic"
        )
        for i, s in enumerate([5, 6, 7]):
            np.testing.assert_array_equal(
                batched[i], np.asarray(single(s))
            )

    @pytest.mark.parametrize("backend", BACKENDS)
    def test_param_batch(self, backend):
        integ = MonteCarloIntegrator(backend=backend)
        dists = [
            Distribution.normal(0.0, 1.0), Distribution.normal(5.0, 2.0)
        ]
        prog = integ.compile_integrate(
            [lambda x: x], dists[0], n_samples=100_000,
            seed_batch=2, param_batch=True, method="antithetic",
            return_stderr=True,
        )
        vals, se = prog([1, 2], pack_param_batch(dists))
        np.testing.assert_allclose(
            np.asarray(vals).ravel(), [0.0, 5.0], atol=1e-4
        )
        assert np.all(np.asarray(se) < 1e-6)  # exact pair cancellation

    def test_distinct_seeds_differ(self):
        integ = MonteCarloIntegrator(backend="xla")
        f = [lambda x: x * x]
        d = Distribution.normal(0.0, 1.0)
        a = integ.integrate(
            f, d, n_samples=100_000, seed=1, method="antithetic"
        )
        b = integ.integrate(
            f, d, n_samples=100_000, seed=2, method="antithetic"
        )
        assert a.values[0] != b.values[0]

    def test_mesh_sharded(self, mesh8):
        integ = MonteCarloIntegrator(mesh=mesh8)
        r = integ.integrate(
            [lambda x: x], Distribution.normal(2.0, 1.0),
            n_samples=200_000, seed=42, method="antithetic",
            return_stderr=True,
        )
        assert abs(r.values[0] - 2.0) < 1e-5
        assert r.stderr[0] < 1e-6


class TestNd:
    def test_nd_values_and_cancellation(self):
        integ = MonteCarloIntegrator()
        r = integ.integrate(
            [lambda x, y: x + y, lambda x, y: x * x * y],
            [Distribution.normal(1.0, 1.0), Distribution.uniform(0.0, 2.0)],
            n_samples=400_000, seed=42, method="antithetic",
            return_stderr=True,
        )
        # x + y is odd about (1, 1): exact pair cancellation.
        assert abs(r.values[0] - 2.0) < 1e-5
        assert r.stderr[0] < 1e-6
        assert abs(r.values[1] - 2.0) < 0.05

    def test_nd_kernel_antithetic(self):
        """nd antithetic runs IN-KERNEL (componentwise mirrors ride the
        per-dimension draws): exact cancellation of a jointly odd
        integrand, unbiased cross moment, custom dim mirrored within
        its stratum."""
        tri = Distribution.from_pdf(
            lambda x: 1.0 - abs(x) if abs(x) < 1 else 0.0
        )
        integ = MonteCarloIntegrator(backend="pallas")
        r = integ.integrate(
            [lambda x, y: x + y, lambda x, y: x * x * y * y],
            [Distribution.normal(1.0, 1.0), tri],
            n_samples=200_000, seed=42, method="antithetic",
            return_stderr=True,
        )
        assert abs(r.values[0] - 1.0) < 1e-5  # odd about (1, 0)
        # The custom dim mirrors WITHIN each stratum, so pair means vary
        # across strata and the error bar stays conservative (iid-scale,
        # the stratified-stderr convention) rather than collapsing to 0
        # like the fully analytic case — but the cancellation of the
        # analytic dim still shrinks it well below plain MC's ~2.9e-3.
        assert r.stderr[0] < 2e-3
        assert abs(r.values[1] - 2.0 / 6.0) < 0.02


class TestImportanceSampling:
    @pytest.mark.parametrize("backend", BACKENDS)
    def test_is_antithetic(self, backend):
        integ = MonteCarloIntegrator(backend=backend)
        r = integ.integrate_importance_sampling(
            [lambda x: x * x],
            Distribution.normal(0.0, 1.0),
            Distribution.normal(0.0, 1.5),
            n_samples=400_000, seed=42, method="antithetic",
            return_stderr=True,
        )
        assert abs(r.values[0] - 1.0) < 0.05
        assert r.stderr[0] > 0

    def test_is_rare_event_variance_reduction(self):
        """Shifted-proposal rare-event probability: the weighted
        indicator is monotone in x, so antithetic pairing of the
        proposal draws reduces the honest error bar."""
        integ = MonteCarloIntegrator(backend="xla")
        kw = dict(n_samples=400_000, seed=4, return_stderr=True)
        p = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(4.0, 1.0)
        f = [lambda x: 1.0 if x > 4.0 else 0.0]
        rm = integrate_importance_sampling(f, p, q, method="mc", **kw)
        ra = integrate_importance_sampling(
            f, p, q, method="antithetic", **kw
        )
        true = 3.167124183311986e-5  # P(Z > 4)
        assert abs(ra.values[0] - true) < 0.15 * true
        assert ra.stderr[0] < rm.stderr[0]

    def test_diagnostics_rejected(self):
        with pytest.raises(ValueError, match="iid quantity"):
            integrate_importance_sampling(
                [lambda x: x],
                Distribution.normal(0.0, 1.0),
                Distribution.normal(0.0, 1.5),
                n_samples=1000, method="antithetic",
                return_diagnostics=True,
            )
