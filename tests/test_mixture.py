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


class TestQuantileKnots:
    """Round-4 knot allocation: per-component quantile-spaced knots
    (weight-proportional budget) replace the uniform-x union grid, which
    could not resolve separated or scale-mismatched modes."""

    def test_far_separated_narrow_modes_resolved(self):
        """N(-500,1)+N(500,1): the old uniform grid gave each mode ~4
        knots across +-4 sigma; quantile knots recover the exact table
        moments (VERDICT r3 task 6's before/after case)."""
        d = Distribution.mixture(
            [Distribution.normal(-500.0, 1.0), Distribution.normal(500.0, 1.0)]
        )
        xs = np.asarray(d._x_table, np.float64)
        cdf = np.asarray(d._cdf_table, np.float64)
        # table-model P(-503 < X < -497) = 0.5 * P(|Z| < 3)
        p = np.interp(-497.0, xs, cdf) - np.interp(-503.0, xs, cdf)
        assert abs(p - 0.49865) < 1e-3
        # table-model moments (exact for the piecewise-linear density)
        a, b = xs[:-1], xs[1:]
        mass = np.diff(cdf)
        m2 = float(np.sum(mass * (a * a + a * b + b * b) / 3.0))
        assert abs(m2 - 250001.0) < 0.01 * 250001.0
        # sampled moments at the reference Beta-grade tolerance
        res = integrate(
            [lambda x: x, lambda x: x * x], d, n_samples=1_000_000, seed=11
        )
        assert abs(res[0]) < 0.01 * 500.0
        assert abs(res[1] - 250001.0) < 0.01 * 250001.0

    def test_heavy_tail_component_does_not_starve_narrow_mode(self):
        """ADVICE r3 (high): Cauchy's 1e-7-quantile span (+-3.2e6)
        starved a unit normal on the uniform grid — measured
        P(3<X<7) = 0.010 vs true 0.506 and P(|X|<1) = 0.005 vs 0.25."""
        import math

        d = Distribution.mixture(
            [Distribution.cauchy(0.0, 1.0), Distribution.normal(5.0, 1.0)],
            weights=[0.5, 0.5],
        )
        xs = np.asarray(d._x_table, np.float64)
        cdf = np.asarray(d._cdf_table, np.float64)

        def prob(lo, hi):
            return np.interp(hi, xs, cdf) - np.interp(lo, xs, cdf)

        true_37 = 0.5 * (math.atan(7.0) - math.atan(3.0)) / math.pi + 0.5 * (
            0.9772498680518208 - 0.02275013194817921
        )
        assert abs(prob(3.0, 7.0) - true_37) < 5e-3
        true_abs1 = 0.5 * (2.0 * math.atan(1.0) / math.pi)
        assert abs(prob(-1.0, 1.0) - true_abs1) < 5e-3

    def test_gapped_heavy_tail_mixture_flags_heavy(self):
        """ADVICE r3 (medium): a mixture of separated heavy-tailed modes
        is BOTH gapped and heavy-tailed; the gapped branch must still run
        the tail-moment guard so the spec routes to the XLA searchsorted
        sampler instead of the kernel's resampled gap tables."""
        from tpu_montecarlo.sampling import dist_spec_of

        d = Distribution.mixture(
            [Distribution.cauchy(-500.0, 1.0), Distribution.cauchy(500.0, 1.0)]
        )
        spec = dist_spec_of(d)
        assert spec.exact_inverse
        assert spec.heavy_tail
        # bounded gapped mixtures keep the fast kernel path
        b = Distribution.mixture(
            [Distribution.uniform(0.0, 1.0), Distribution.uniform(10.0, 11.0)]
        )
        spec_b = dist_spec_of(b)
        assert spec_b.exact_inverse
        assert not spec_b.heavy_tail

    def test_gapped_heavy_tail_mixture_moments(self):
        """End-to-end: the rerouted sampler gets the Cauchy pair's
        central quantiles right (moments diverge, so assert on the
        median band instead)."""
        d = Distribution.mixture(
            [Distribution.cauchy(-500.0, 1.0), Distribution.cauchy(500.0, 1.0)]
        )
        res = integrate(
            [lambda x: 1.0 * (x > 0.0), lambda x: 1.0 * (abs(x) < 400.0)],
            d, n_samples=400_000, seed=12,
        )
        assert abs(res[0] - 0.5) < 0.01
        # P(|X| < 400): each Cauchy puts ~atan-shaped mass near its loc;
        # P(|X - (+-500)| ... ) — mass inside (-400, 400) is the far
        # tails of both: 0.5*(F_c(900)-F_c(100)) roughly where
        # F_c(t) = atan(t)/pi tail mass ~ (1/(pi*100) - 1/(pi*900))
        import math

        true_in = (math.atan(900.0) - math.atan(100.0)) / math.pi
        assert abs(res[1] - true_in) < 0.01


class TestScipyFamilyEdgeCases:
    """ADVICE r3 (low): float64-distinct quantile knots must survive the
    float32 cast that from_pdf_table validates in."""

    def test_student_t_far_location(self):
        d = Distribution.student_t(df=3.0, loc=1e8)
        assert len(d._x_table) >= 2
        # central mass still lands near the location
        xs = np.asarray(d._x_table, np.float64)
        cdf = np.asarray(d._cdf_table, np.float64)
        med = float(np.interp(0.5, cdf, xs))
        assert abs(med - 1e8) < 1e4

    def test_student_t_tiny_df_constructs(self):
        d = Distribution.student_t(df=0.1)
        assert len(d._x_table) >= 2

    def test_out_of_float32_range_raises_clearly(self):
        with pytest.raises(ValueError, match="float32"):
            Distribution.student_t(df=3.0, loc=1e39)


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
