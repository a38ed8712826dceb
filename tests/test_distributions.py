"""Distribution factories, table numerics, and table-sampled accuracy.

Mirrors the reference distribution suite (reference:
tests/test_distributions.py): factory parameter conventions, Beta moments
through table sampling, table-size behaviour (min 1000), support
auto-detection, and PDF sanitisation (NaN/Inf/negative -> 0).
"""

import math

import numpy as np
import pytest

from tpu_montecarlo import Distribution, DistributionType
from tpu_montecarlo.tables import LOG_PDF_FLOOR, MIN_TABLE_POINTS, find_support


class TestFactories:
    def test_uniform_creation(self):
        d = Distribution.uniform(min=-1.0, max=3.0)
        assert d.dist_type == DistributionType.UNIFORM
        assert d.params["min"] == -1.0
        assert d.params["max"] == 3.0
        assert d.pdf(0.0) == pytest.approx(0.25)
        assert d.pdf(-1.0) == pytest.approx(0.25)  # closed at min
        assert d.pdf(3.0) == 0.0  # half-open at max
        assert d.pdf(5.0) == 0.0

    def test_normal_creation(self):
        d = Distribution.normal(mean=2.0, std=0.5)
        assert d.dist_type == DistributionType.NORMAL
        assert d.params["mean"] == 2.0
        assert d.params["std"] == 0.5
        assert d.params["support"] == (2.0 - 3.5, 2.0 + 3.5)
        assert d.pdf(2.0) == pytest.approx(1.0 / (0.5 * math.sqrt(2 * math.pi)))

    def test_exponential_creation(self):
        d = Distribution.exponential(lambda_param=2.0)
        assert d.dist_type == DistributionType.EXPONENTIAL
        assert d.params["lambda"] == 2.0
        assert d.pdf(0.0) == pytest.approx(2.0)
        assert d.pdf(-0.1) == 0.0

    def test_beta_is_custom(self):
        d = Distribution.beta(2.0, 5.0)
        assert d.dist_type == DistributionType.CUSTOM
        assert d._x_table is not None
        assert d._cdf_table is not None

    def test_from_pdf_requires_callable(self):
        with pytest.raises(TypeError):
            Distribution.from_pdf("not callable")


class TestFromPdfTableValidation:
    def test_basic_creation(self):
        x = np.linspace(0, 1, 100)
        p = np.ones(100)
        d = Distribution.from_pdf_table(x, p)
        assert d.dist_type == DistributionType.CUSTOM
        assert d.params["table_size"] == 100
        assert d.pdf(0.5) == pytest.approx(1.0)
        assert d.pdf(2.0) == 0.0

    def test_rejects_2d(self):
        with pytest.raises(ValueError):
            Distribution.from_pdf_table(np.ones((2, 2)), np.ones((2, 2)))

    def test_rejects_length_mismatch(self):
        with pytest.raises(ValueError):
            Distribution.from_pdf_table([0.0, 1.0], [1.0, 1.0, 1.0])

    def test_rejects_short_tables(self):
        with pytest.raises(ValueError):
            Distribution.from_pdf_table([0.0], [1.0])

    def test_rejects_unsorted_x(self):
        with pytest.raises(ValueError):
            Distribution.from_pdf_table([0.0, 2.0, 1.0], [1.0, 1.0, 1.0])

    def test_rejects_negative_pdf(self):
        with pytest.raises(ValueError):
            Distribution.from_pdf_table([0.0, 1.0], [1.0, -0.5])

    def test_cdf_computed_and_normalised(self):
        x = np.linspace(0, 2, 50)
        p = np.ones(50)
        d = Distribution.from_pdf_table(x, p)
        assert d._cdf_table[0] == pytest.approx(0.0)
        assert d._cdf_table[-1] == pytest.approx(1.0)

    def test_cdf_length_mismatch_rejected(self):
        with pytest.raises(ValueError):
            Distribution.from_pdf_table(
                [0.0, 1.0], [1.0, 1.0], cdf_table=[0.0, 0.5, 1.0]
            )

    def test_rejects_nonfinite_pdf(self):
        # An inf pdf knot would reach the device log-pdf tables and turn
        # MH acceptance ratios into NaN.
        with pytest.raises(ValueError, match="finite"):
            Distribution.from_pdf_table([0.0, 1.0], [1.0, float("inf")])

    def test_rejects_all_zero_pdf(self):
        # Previously constructed silently with an all-zero CDF and routed
        # degenerate exact-inverse sampling.
        with pytest.raises(ValueError, match="integral is zero"):
            Distribution.from_pdf_table(np.linspace(0, 1, 50), np.zeros(50))

    def test_rejects_nonmonotone_user_cdf(self):
        with pytest.raises(ValueError, match="non-decreasing"):
            Distribution.from_pdf_table(
                [0.0, 0.5, 1.0], [1.0, 1.0, 1.0],
                cdf_table=[0.0, 0.8, 0.5],
            )

    def test_unnormalised_user_cdf_is_normalised(self):
        # A user CDF ending at 0.95 would otherwise put a silent 5%
        # probability atom at x_max (every u above 0.95 clamps there).
        n = 64
        x = np.linspace(0.0, 1.0, n)
        d = Distribution.from_pdf_table(
            x, np.ones(n), cdf_table=np.linspace(0.0, 0.95, n)
        )
        assert d._cdf_table[-1] == pytest.approx(1.0)


class TestSupportDetection:
    def test_normal_like_pdf(self):
        x_min, x_max = find_support(lambda x: math.exp(-0.5 * x * x))
        assert x_min < -3.0
        assert x_max > 3.0

    def test_bounded_beta_like(self):
        def pdf(x):
            return x * (1 - x) * 6 if 0 < x < 1 else 0.0

        x_min, x_max = find_support(pdf)
        assert -1.0 <= x_min <= 0.5
        assert 0.5 <= x_max <= 2.0

    def test_zero_everywhere_raises(self):
        with pytest.raises(ValueError, match="support"):
            find_support(lambda x: 0.0)

    def test_shifted_distribution_found_by_exponential_scan(self):
        x_min, x_max = find_support(
            lambda x: math.exp(-0.5 * (x - 16.0) ** 2)
        )
        assert x_min < 16.0 < x_max

    def test_nan_outside_domain_stops_expansion(self):
        # Numpy-style PDFs return NaN outside their domain instead of
        # raising; NaN must count as zero density, not balloon the
        # doubling walk to the hard limit (regression: returned
        # (-13107, 13107) for a semicircle on [-1, 1]).
        def pdf(t):
            with np.errstate(invalid="ignore"):
                return float(np.sqrt(1 - t * t) * 2 / np.pi)

        x_min, x_max = find_support(pdf)
        assert -4.0 < x_min <= -0.9
        assert 0.9 <= x_max < 4.0

    def test_inf_pole_does_not_collapse_support(self):
        # An integrable pole evaluating to inf must not be adopted as the
        # hill-climb peak (threshold would become inf and the expansion
        # would collapse the support to the pole's neighbourhood).
        def pdf(t):
            if t == 0.0:
                return float("inf")
            return max(0.0, 1.0 - t * t) / math.sqrt(abs(t))

        x_min, x_max = find_support(pdf)
        assert x_max - x_min > 1.0


class TestTableSizes:
    def test_minimum_table_size_enforced(self):
        d = Distribution.from_pdf(
            lambda x: 1.0 if 0 <= x < 1 else 0.0, support=(0.0, 1.0), table_size=10
        )
        assert d.params["table_size"] >= MIN_TABLE_POINTS
        assert len(d._x_table) >= MIN_TABLE_POINTS

    @pytest.mark.parametrize("size", [1024, 2048, 4096])
    def test_table_size_variations(self, size, integrator):
        d = Distribution.beta(2.0, 5.0, table_size=size)
        result = integrator.integrate([lambda x: x], d, n_samples=1_000_000)
        assert abs(result.values[0] - 2.0 / 7.0) < 0.02


class TestSanitisation:
    def test_nan_pdf_sanitised(self, integrator):
        def pdf(x):
            return float("nan") if abs(x) > 0.9 else 1.0

        d = Distribution.from_pdf(pdf, support=(-1.0, 1.0))
        result = integrator.integrate([lambda x: x], d, n_samples=500_000)
        assert abs(result.values[0]) < 0.05

    def test_inf_pdf_sanitised(self, integrator):
        def pdf(x):
            return float("inf") if abs(x) > 0.9 else 1.0

        d = Distribution.from_pdf(pdf, support=(-1.0, 1.0))
        result = integrator.integrate([lambda x: x], d, n_samples=500_000)
        assert abs(result.values[0]) < 0.05

    def test_negative_pdf_clipped(self, integrator):
        def pdf(x):
            return -1.0 if abs(x) > 0.9 else 1.0

        d = Distribution.from_pdf(pdf, support=(-1.0, 1.0))
        result = integrator.integrate([lambda x: x], d, n_samples=500_000)
        assert abs(result.values[0]) < 0.05

    def test_all_zero_pdf_raises(self):
        with pytest.raises(ValueError, match="integral is zero"):
            Distribution.from_pdf(lambda x: 0.0, support=(0.0, 1.0))


class TestBetaMoments:
    """Analytic Beta moments through inverse-CDF table sampling
    (reference tolerance 0.01-0.02 at 1e7)."""

    def test_beta_2_5(self, integrator):
        a, b = 2.0, 5.0
        d = Distribution.beta(a, b)
        mean = a / (a + b)
        var = a * b / ((a + b) ** 2 * (a + b + 1))
        result = integrator.integrate(
            [lambda x: x, lambda x: (x - mean) ** 2], d, n_samples=10_000_000
        )
        assert abs(result.values[0] - mean) < 0.01
        assert abs(result.values[1] - var) < 0.01

    def test_beta_3_2(self, integrator):
        a, b = 3.0, 2.0
        d = Distribution.beta(a, b)
        mean = a / (a + b)
        result = integrator.integrate([lambda x: x], d, n_samples=10_000_000)
        assert abs(result.values[0] - mean) < 0.01

    def test_table_uniform_vs_analytic_uniform(self, integrator):
        """A table-backed U(0,1) must agree with the analytic sampler."""
        table = Distribution.from_pdf(
            lambda x: 1.0 if 0 <= x < 1 else 0.0, support=(0.0, 1.0)
        )
        analytic = Distribution.uniform(0.0, 1.0)
        r_t = integrator.integrate(
            [lambda x: x, lambda x: x * x], table, n_samples=2_000_000
        )
        r_a = integrator.integrate(
            [lambda x: x, lambda x: x * x], analytic, n_samples=2_000_000
        )
        np.testing.assert_allclose(r_t.values, r_a.values, atol=0.01)

    def test_triangular_from_pdf(self, integrator):
        # Triangular on [0,2] peaked at 1: mean = 1.
        def pdf(x):
            if 0 <= x <= 1:
                return x
            if 1 < x <= 2:
                return 2 - x
            return 0.0

        d = Distribution.from_pdf(pdf, support=(0.0, 2.0))
        result = integrator.integrate([lambda x: x], d, n_samples=2_000_000)
        assert abs(result.values[0] - 1.0) < 0.01


class TestLogPdfTables:
    def test_floor_applied_outside_support(self):
        d = Distribution.uniform(0.0, 1.0)
        x, logp = d.get_log_pdf_table()
        assert np.all(np.isfinite(logp))
        assert logp.min() >= LOG_PDF_FLOOR

    def test_uniform_endpoint_fix(self):
        d = Distribution.uniform(0.0, 2.0)
        x, logp = d.get_log_pdf_table()
        # Half-open pdf reads 0 at x=max; the table must patch the endpoint
        # to log(1/width) so MH acceptance is sane at the boundary.
        assert logp[-1] == pytest.approx(math.log(0.5), abs=1e-6)

    def test_pdf_table_lazy_and_cached(self):
        d = Distribution.normal(0.0, 1.0)
        x1, p1 = d.get_or_compute_pdf_table()
        x2, p2 = d.get_or_compute_pdf_table()
        assert x1 is x2 and p1 is p2
        assert len(x1) == 2048
        i = np.argmin(np.abs(x1))
        assert p1[i] == pytest.approx(1.0 / math.sqrt(2 * math.pi), abs=1e-3)
