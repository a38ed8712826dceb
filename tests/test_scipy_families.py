"""Table-backed scipy families: ``Distribution.gamma`` / ``student_t`` /
``chi2``.

The reference ships exactly one non-closed-form factory (``beta``,
python/wgpu_montecarlo/__init__.py:383-414) built on scipy + the custom
PDF-table machinery; these three extend that pattern.  They ride the
CUSTOM inverse-CDF table path end to end — stratified in-kernel sampling,
IS tables, MCMC log-pdf tables — so the tests sweep moments on both
backends plus proposal/target roles.
"""

import math

import numpy as np
import pytest

from tpu_montecarlo import (
    Distribution,
    MonteCarloIntegrator,
    integrate,
    integrate_importance_sampling,
    integrate_mcmc,
)


# (factory, kwargs, mean, variance)
CASES = [
    ("gamma", dict(shape=3.0, rate=2.0), 1.5, 0.75),
    ("gamma", dict(shape=1.0, rate=0.5), 2.0, 4.0),
    ("gamma", dict(shape=0.7, rate=1.0), 0.7, 0.7),
    ("student_t", dict(df=5.0), 0.0, 5.0 / 3.0),
    ("student_t", dict(df=12.0, loc=2.0, scale=0.5), 2.0, 0.25 * 1.2),
    ("chi2", dict(df=4.0), 4.0, 8.0),
]


def _make(name, kwargs):
    return getattr(Distribution, name)(**kwargs)


class TestMoments:
    @pytest.mark.parametrize("name,kwargs,mean,var", CASES)
    def test_moments_pallas(self, name, kwargs, mean, var):
        d = _make(name, kwargs)
        res = integrate(
            [lambda x: x, lambda x: x * x], d, n_samples=400_000, seed=7
        )
        assert abs(res[0] - mean) < 0.05 * max(1.0, abs(mean))
        second = var + mean * mean
        assert abs(res[1] - second) < 0.08 * max(1.0, second)

    @pytest.mark.parametrize("name,kwargs,mean,var", CASES[:3])
    def test_moments_xla(self, name, kwargs, mean, var):
        d = _make(name, kwargs)
        it = MonteCarloIntegrator(backend="xla")
        res = it.integrate([lambda x: x], d, n_samples=400_000, seed=11)
        assert abs(res[0] - mean) < 0.05 * max(1.0, abs(mean))

    def test_gamma_small_shape_avoids_pole(self):
        """shape < 1 has an integrable pole at 0; the table must start
        strictly above it and still capture the mass."""
        d = Distribution.gamma(shape=0.5, rate=1.0)
        x_min = float(d._x_table[0])
        assert x_min > 0.0
        res = integrate([lambda x: 1.0 * (x > 0)], d, n_samples=200_000)
        assert abs(res[0] - 1.0) < 1e-3

    def test_student_t_heavy_tail_mass(self):
        """df=2 tails: P(|X| > 5) is ~1.9% — a pdf-ratio support cutoff
        would clip it; the quantile-based bounds must keep it."""
        d = Distribution.student_t(df=2.0)
        res = integrate(
            [lambda x: 1.0 * (abs(x) > 5.0)], d, n_samples=1_000_000,
            seed=3,
        )
        exact = 2.0 * (0.5 - 0.5 * (5.0 / math.sqrt(2.0 + 25.0)))
        assert abs(res[0] - exact) < 0.25 * exact


class TestHeavyTailRouting:
    """The uniform-u resampled inverse table spreads the outermost
    1/(m-1) slab of mass over the whole tail x-range; for heavy-tailed
    tables that is a many-sigma moment bias (t(5): E[X^2] 1.95 vs
    1.667).  ``tables.inverse_table_distorts`` must reroute those to the
    knot-exact searchsorted inverse while bounded tables keep the fast
    path."""

    def test_student_t_routes_exact_inverse(self):
        from tpu_montecarlo.sampling import dist_spec_of

        d = Distribution.student_t(df=5.0)
        spec = dist_spec_of(d)
        assert spec.exact_inverse
        assert spec.heavy_tail

    def test_heavy_tail_not_pallas_eligible(self):
        """The kernel's gap-respecting stratified tables are ALSO a
        uniform-u resampled inverse, so heavy-tail tables must leave the
        Pallas tier entirely (forced backend='pallas' warns + falls
        back, the no-silent-degrade contract)."""
        import warnings

        d = Distribution.student_t(df=5.0)
        it = MonteCarloIntegrator(backend="pallas")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            res = it.integrate(
                [lambda x: x * x], d, n_samples=500_000, seed=2
            )
        assert any("XLA" in str(x.message) for x in w)
        assert abs(res[0] - 5.0 / 3.0) < 0.1

    def test_bounded_table_keeps_fast_path(self):
        from tpu_montecarlo.sampling import dist_spec_of

        d = Distribution.from_pdf(
            lambda x: x * (2.0 - x) if 0 < x < 2 else 0.0,
            support=(0.0, 2.0),
        )
        assert not dist_spec_of(d).exact_inverse

    def test_heavy_tail_from_pdf_second_moment(self):
        """A user's own heavy-tailed from_pdf distribution (the bias the
        routing guards against, independent of the scipy factories)."""
        import math

        c = 8.0 / math.pi  # t(2)-like: 1/(1+x^2)^2 normalised… on [-40, 40]
        d = Distribution.from_pdf(
            lambda x: c / (1.0 + x * x) ** 2.0,
            support=(-40.0, 40.0),
        )
        # E[X^2] of c/(1+x^2)^2 on R is 1 for c = 2/pi; the truncated
        # table target is within 2% of that.
        res = integrate([lambda x: x * x], d, n_samples=800_000, seed=21)
        x = np.asarray(d._x_table, np.float64)
        cdf = np.asarray(d._cdf_table, np.float64)
        dm = np.diff(cdf)
        want = float(
            (dm * (x[:-1] ** 2 + x[:-1] * x[1:] + x[1:] ** 2) / 3.0).sum()
        )
        assert abs(res[0] - want) < 0.05 * want


class TestValidation:
    def test_gamma_rejects_bad_params(self):
        with pytest.raises(ValueError):
            Distribution.gamma(shape=0.0)
        with pytest.raises(ValueError):
            Distribution.gamma(shape=1.0, rate=-1.0)

    def test_student_t_rejects_bad_params(self):
        with pytest.raises(ValueError):
            Distribution.student_t(df=-2.0)
        with pytest.raises(ValueError):
            Distribution.student_t(df=3.0, scale=0.0)


class TestComposition:
    def test_gamma_as_is_proposal(self):
        """Gamma proposal against an exponential target: E_p[x] = 1."""
        target = Distribution.exponential(1.0)
        proposal = Distribution.gamma(shape=2.0, rate=1.0)
        res = integrate_importance_sampling(
            [lambda x: x], target, proposal, n_samples=400_000, seed=5
        )
        assert abs(res[0] - 1.0) < 0.05

    def test_chi2_as_mcmc_target(self):
        """Chi2(6) target via MCMC: mean 6, proposal overdispersed."""
        target = Distribution.chi2(df=6.0)
        proposal = Distribution.gamma(shape=2.0, rate=0.25)
        res = integrate_mcmc(
            [lambda x: x], target, proposal,
            n_steps=2_000, n_chains=512, n_burnin=500, seed=9,
        )
        assert abs(res[0] - 6.0) < 0.4

    def test_student_t_nd_dimension(self):
        """A t-dimension inside an nd integrate: E[x0 * x1] factorises."""
        dims = [
            Distribution.student_t(df=8.0, loc=1.0),
            Distribution.uniform(0.0, 2.0),
        ]
        res = integrate(
            [lambda x, y: x * y], dims, n_samples=400_000, seed=13
        )
        assert abs(res[0] - 1.0) < 0.06

    def test_pdf_matches_scipy(self):
        scipy_stats = pytest.importorskip("scipy.stats")
        d = Distribution.student_t(df=4.0, loc=0.5, scale=2.0)
        xs = np.linspace(-6.0, 7.0, 11)
        want = scipy_stats.t(df=4.0, loc=0.5, scale=2.0).pdf(xs)
        got = np.array([d.pdf(float(x)) for x in xs])
        # The table pdf is a piecewise-linear interpolant over the knots.
        np.testing.assert_allclose(got, want, rtol=5e-3)
