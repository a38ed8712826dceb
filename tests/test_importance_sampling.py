"""Importance sampling: closed-form weight path + PDF-table fallback.

Mirrors the reference IS suite (reference: tests/test_importance_sampling.py):
p=q sanity, shifted/wider proposals, mixed families, traceable custom PDFs,
the non-traceable -> table-lookup fallback routing, and config passthrough.
"""

import math

import numpy as np
import pytest

from tpu_montecarlo import (
    Distribution,
    MonteCarloIntegrator,
    integrate_importance_sampling,
)


class TestAnalyticPairs:
    def test_identical_distributions(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x * x], d, d, n_samples=1_000_000
        )
        assert abs(result.values[0] - 1.0) < 0.02

    def test_shifted_proposal(self, integrator):
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(0.5, 1.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0]) < 0.02

    def test_wider_proposal(self, integrator):
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(0.0, 2.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x * x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 1.0) < 0.02

    def test_normal_target_uniform_proposal(self, integrator):
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.uniform(-5.0, 5.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x * x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 1.0) < 0.05

    def test_uniform_target_uniform_proposal(self, integrator):
        target = Distribution.uniform(0.0, 1.0)
        proposal = Distribution.uniform(-1.0, 2.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 0.5) < 0.02

    def test_exponential_pair(self, integrator):
        target = Distribution.exponential(2.0)
        proposal = Distribution.exponential(1.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 0.5) < 0.02

    def test_rare_event(self, integrator):
        # P(X > 4) under N(0,1) = 3.167e-5; a N(4, 1.5) proposal makes the
        # rare region common (BASELINE.md config 4).
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(4.0, 1.5)
        result = integrator.integrate_importance_sampling(
            [lambda x: x > 4.0], target, proposal, n_samples=10_000_000
        )
        assert abs(result.values[0] - 3.167e-5) < 3e-6

    def test_multiple_functions_share_weights(self, integrator):
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(0.0, 1.5)
        result = integrator.integrate_importance_sampling(
            [lambda x: x, lambda x: x * x, lambda x: x**4],
            target,
            proposal,
            n_samples=4_000_000,
        )
        assert abs(result.values[0]) < 0.02
        assert abs(result.values[1] - 1.0) < 0.02
        assert abs(result.values[2] - 3.0) < 0.15

    def test_mixed_callable_and_wgsl(self, integrator):
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(0.0, 1.5)
        src = "fn sq(x: f32) -> f32 { return x * x; }"
        result = integrator.integrate_importance_sampling(
            [lambda x: x, src], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0]) < 0.02
        assert abs(result.values[1] - 1.0) < 0.02


class TestTraceableCustomPdfs:
    """PDFs written in the restricted math subset trace into closed-form
    f*p/q kernels (no tables)."""

    def test_custom_target_traceable(self, integrator):
        # Triangular-ish quadratic target on [0,1]: pdf = 6x(1-x).
        target = Distribution.from_pdf(
            lambda x: 6.0 * x * (1.0 - x) if 0.0 < x < 1.0 else 0.0,
            support=(0.0, 1.0),
        )
        proposal = Distribution.uniform(0.0, 1.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 0.5) < 0.02

    def test_custom_proposal_traceable(self, integrator):
        target = Distribution.uniform(0.0, 1.0)
        proposal = Distribution.from_pdf(
            lambda x: 2.0 * x if 0.0 < x < 1.0 else 0.0, support=(0.0, 1.0)
        )
        result = integrator.integrate_importance_sampling(
            [lambda x: x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 0.5) < 0.02

    def test_custom_pdf_with_math_functions(self, integrator):
        # Half-cosine pdf on [-pi/2, pi/2]: pdf = cos(x)/2, E[x^2] = pi^2/4 - 2.
        target = Distribution.from_pdf(
            lambda x: math.cos(x) / 2.0 if abs(x) < math.pi / 2 else 0.0,
            support=(-math.pi / 2, math.pi / 2),
        )
        proposal = Distribution.uniform(-math.pi / 2, math.pi / 2)
        result = integrator.integrate_importance_sampling(
            [lambda x: x * x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - (math.pi**2 / 4 - 2.0)) < 0.01

    def test_truncated_normal_moments(self, integrator):
        # N(0,1) truncated to [-1, 1]; E[X]=0, E[X^2] = 1 - 2*phi(1)/(2*Phi(1)-1).
        # The IS weight is raw f*p/q (not self-normalising, matching the
        # reference), so the pdf here must carry its true normaliser.
        z = 2.0 * 0.8413447460685429 - 1.0
        phi1 = math.exp(-0.5) / math.sqrt(2 * math.pi)
        ex2 = 1.0 - 2.0 * phi1 / z
        norm = math.sqrt(2 * math.pi) * z

        def pdf(x):
            return (
                math.exp(-0.5 * x * x) / norm if -1.0 < x < 1.0 else 0.0
            )

        target = Distribution.from_pdf(pdf, support=(-1.0, 1.0))
        proposal = Distribution.uniform(-1.0, 1.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x, lambda x: x * x], target, proposal, n_samples=4_000_000
        )
        assert abs(result.values[0]) < 0.01
        assert abs(result.values[1] - ex2) < 0.01

    def test_custom_pdf_with_power(self, integrator):
        # pdf ∝ x^2 on [0,1] => normalised 3x^2, E[X] = 3/4.
        target = Distribution.from_pdf(
            lambda x: 3.0 * x**2 if 0.0 < x < 1.0 else 0.0, support=(0.0, 1.0)
        )
        proposal = Distribution.uniform(0.0, 1.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 0.75) < 0.01


class TestTableFallback:
    """PDFs the tracer rejects (int casts, data-dependent Python control
    flow) must route to interpolated table lookups — the same trigger class
    as the reference's TranspilerError fallback."""

    @staticmethod
    def _untraceable_uniform_pdf(x):
        # int() cast on a data value defeats tracing.
        return 0.5 if int(abs(x)) < 1 else 0.0

    def test_non_traceable_target_uses_table(self, integrator):
        from tpu_montecarlo import is_traceable

        assert not is_traceable(self._untraceable_uniform_pdf)
        target = Distribution.from_pdf(
            self._untraceable_uniform_pdf, support=(-1.0, 1.0)
        )
        proposal = Distribution.uniform(-1.0, 1.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x * x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 1.0 / 3.0) < 0.02

    def test_non_traceable_proposal_uses_table(self, integrator):
        target = Distribution.uniform(-1.0, 1.0)
        proposal = Distribution.from_pdf(
            self._untraceable_uniform_pdf, support=(-1.0, 1.0)
        )
        result = integrator.integrate_importance_sampling(
            [lambda x: x * x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 1.0 / 3.0) < 0.02

    def test_both_non_traceable(self, integrator):
        target = Distribution.from_pdf(
            self._untraceable_uniform_pdf, support=(-1.0, 1.0)
        )
        proposal = Distribution.from_pdf(
            self._untraceable_uniform_pdf, support=(-1.0, 1.0)
        )
        result = integrator.integrate_importance_sampling(
            [lambda x: x * x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 1.0 / 3.0) < 0.02

    def test_from_pdf_table_distribution(self, integrator):
        x = np.linspace(-1.0, 1.0, 1500)
        p = np.where(np.abs(x) < 1.0, 0.5, 0.0)
        target = Distribution.from_pdf_table(x, p)
        proposal = Distribution.normal(0.0, 1.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x * x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 1.0 / 3.0) < 0.02

    def test_arbitrary_table_size(self, integrator):
        x = np.linspace(0.0, 1.0, 777)
        p = 2.0 * x
        target = Distribution.from_pdf_table(x, p)
        proposal = Distribution.uniform(0.0, 1.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 2.0 / 3.0) < 0.02


class TestErrorsAndConfig:
    def test_empty_functions_error(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        with pytest.raises(ValueError):
            integrator.integrate_importance_sampling([], d, d, n_samples=1000)

    def test_invalid_function_type_error(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        with pytest.raises(TypeError):
            integrator.integrate_importance_sampling([42], d, d, n_samples=1000)

    def test_module_level_function(self):
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(0.0, 1.5)
        result = integrate_importance_sampling(
            [lambda x: x * x], target, proposal, n_samples=1_000_000
        )
        assert abs(result.values[0] - 1.0) < 0.05

    def test_target_threads_passthrough(self):
        integ = MonteCarloIntegrator(target_threads=2048)
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(0.0, 1.5)
        result = integ.integrate_importance_sampling(
            [lambda x: x * x], target, proposal, n_samples=500_000
        )
        assert abs(result.values[0] - 1.0) < 0.05

    def test_result_metadata(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        result = integrator.integrate_importance_sampling(
            [lambda x: x, lambda x: x * x], d, d, n_samples=123_456
        )
        assert result.n_samples == 123_456
        assert result.n_functions == 2


class TestPallasRouting:
    def test_table_fallback_marks_no_pallas(self, integrator):
        """Integrands carrying table-lookup closures must be flagged so the
        Pallas integrate kernel (which cannot lower the gathers) is skipped."""
        target = Distribution.from_pdf(
            TestTableFallback._untraceable_uniform_pdf, support=(-1.0, 1.0)
        )
        p_eval = integrator._pdf_evaluator(target)
        assert getattr(p_eval, "__tpu_mc_no_pallas__", False)
        q_eval = integrator._pdf_evaluator(Distribution.normal(0.0, 1.0))
        assert not getattr(q_eval, "__tpu_mc_no_pallas__", False)
