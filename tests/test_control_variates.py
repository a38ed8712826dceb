"""Control variates (``control_variates=[(g, E[g]), ...]`` on
integrate): regression-adjusted estimates using controls of KNOWN mean —
``theta_i = mean(f_i) - c_i^T (mean(g) - E[g])`` with the optimal
``c_i = Cov(g)^{-1} Cov(g, f_i)`` — a classic variance-reduction surface
beyond the reference.

Design under test: every moment the adjustment needs (cross products,
Gram matrix, squares) is itself a pilot-shifted integrand fused into ONE
standard program on shared samples, so the estimator rides both
backends, any family, and the nd path with no device-side machinery;
``return_stderr`` reports the regression RESIDUAL error (the corrected
estimator's actual error).
"""

import math

import numpy as np
import pytest

from tpu_montecarlo import (
    Distribution,
    MonteCarloIntegrator,
    integrate,
)

BACKENDS = ["xla", "pallas"]
E_HALF = math.exp(0.125)  # E[exp(X/2)], X ~ N(0,1)


class TestCorrectness:
    @pytest.mark.parametrize("backend", BACKENDS)
    def test_estimate_and_reduction(self, backend):
        """exp(x/2) with control x (E=0): the corrected estimate stays
        right and its residual error bar drops well under the plain
        one."""
        integ = MonteCarloIntegrator(backend=backend)
        f = [lambda x: math.e ** (0.5 * x)]
        d = Distribution.normal(0.0, 1.0)
        kw = dict(n_samples=200_000, seed=5, return_stderr=True)
        plain = integ.integrate(f, d, **kw)
        cv = integ.integrate(
            f, d, control_variates=[(lambda x: x, 0.0)], **kw
        )
        assert abs(cv.values[0] - E_HALF) < 0.005
        assert cv.stderr[0] < 0.5 * plain.stderr[0]

    def test_two_controls_beat_one(self):
        f = [lambda x: math.e ** (0.5 * x)]
        d = Distribution.normal(0.0, 1.0)
        kw = dict(n_samples=200_000, seed=5, return_stderr=True)
        one = integrate(
            f, d, control_variates=[(lambda x: x, 0.0)], **kw
        )
        two = integrate(
            f, d,
            control_variates=[(lambda x: x, 0.0), (lambda x: x * x, 1.0)],
            **kw,
        )
        assert abs(two.values[0] - E_HALF) < 0.002
        assert two.stderr[0] < 0.5 * one.stderr[0]

    def test_perfect_control_is_exact(self):
        """g == f with known mean: the regression removes ALL variance —
        the estimate equals the known mean and the residual bar is 0."""
        r = integrate(
            [lambda x: x * x], Distribution.normal(0.0, 1.0),
            n_samples=100_000, seed=7, return_stderr=True,
            control_variates=[(lambda x: x * x, 1.0)],
        )
        assert abs(r.values[0] - 1.0) < 1e-6
        assert r.stderr[0] < 1e-9

    def test_unbiased_with_useless_control(self):
        """An uncorrelated control must not bias the estimate (its
        coefficient goes to ~0)."""
        r = integrate(
            [lambda x: x * x], Distribution.normal(0.0, 1.0),
            n_samples=400_000, seed=11, return_stderr=True,
            control_variates=[(lambda x: x, 0.0)],  # odd: cov ~ 0
        )
        assert abs(r.values[0] - 1.0) < 0.02

    def test_degenerate_constant_control(self):
        """A constant control has zero variance AND zero covariance —
        the minimum-norm solution leaves the estimate uncorrected
        instead of blowing up."""
        r = integrate(
            [lambda x: x * x], Distribution.normal(0.0, 1.0),
            n_samples=100_000, seed=7, return_stderr=True,
            control_variates=[(lambda x: 1.0, 1.0)],
        )
        assert abs(r.values[0] - 1.0) < 0.03
        assert np.isfinite(r.stderr[0])

    @pytest.mark.parametrize("backend", BACKENDS)
    def test_custom_table_distribution(self, backend):
        tri = Distribution.from_pdf(
            lambda x: 1.0 - abs(x) if abs(x) < 1 else 0.0
        )
        integ = MonteCarloIntegrator(backend=backend)
        kw = dict(n_samples=200_000, seed=3, return_stderr=True)
        plain = integ.integrate([lambda x: math.e ** x], tri, **kw)
        cv = integ.integrate(
            [lambda x: math.e ** x], tri,
            control_variates=[(lambda x: x, 0.0)], **kw
        )
        true = (math.e + math.exp(-1.0) - 2.0)  # int e^x (1-|x|) dx
        assert abs(cv.values[0] - true) < 0.01
        assert cv.stderr[0] < 0.7 * plain.stderr[0]

    def test_multiple_integrands_share_controls(self):
        r = integrate(
            [lambda x: math.e ** (0.5 * x), lambda x: x * x * x + x],
            Distribution.normal(0.0, 1.0),
            n_samples=200_000, seed=9, return_stderr=True,
            control_variates=[(lambda x: x, 0.0), (lambda x: x * x, 1.0)],
        )
        assert abs(r.values[0] - E_HALF) < 0.005
        assert abs(r.values[1]) < 0.05  # odd integrand: mean 0
        assert np.all(np.isfinite(r.stderr))


class TestNd:
    def test_nd_control(self):
        d = [
            Distribution.normal(0.0, 1.0),
            Distribution.uniform(0.0, 1.0),
        ]
        f = [lambda x, y: math.e ** (0.3 * (x + y))]
        kw = dict(n_samples=200_000, seed=3, return_stderr=True)
        plain = integrate(f, d, **kw)
        cv = integrate(
            f, d, control_variates=[(lambda x, y: x + y, 0.5)], **kw
        )
        true = math.exp(0.045) * (math.exp(0.3) - 1.0) / 0.3
        assert abs(cv.values[0] - true) < 0.005
        assert cv.stderr[0] < 0.5 * plain.stderr[0]


class TestValidation:
    def test_non_mc_method_rejected(self):
        for method in ("qmc", "antithetic"):
            with pytest.raises(ValueError, match="method='mc'"):
                integrate(
                    [lambda x: x], Distribution.normal(0.0, 1.0),
                    n_samples=1000, method=method,
                    control_variates=[(lambda x: x, 0.0)],
                )

    def test_empty_rejected(self):
        with pytest.raises(ValueError, match="non-empty"):
            integrate(
                [lambda x: x], Distribution.normal(0.0, 1.0),
                n_samples=1000, control_variates=[],
            )

    def test_malformed_pair_rejected(self):
        with pytest.raises(TypeError, match="known_mean"):
            integrate(
                [lambda x: x], Distribution.normal(0.0, 1.0),
                n_samples=1000, control_variates=[lambda x: x],
            )
