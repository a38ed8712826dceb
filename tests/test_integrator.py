"""Statistical accuracy + API behaviour of MonteCarloIntegrator.integrate.

Mirrors the coverage of the reference GPU integrator suite
(reference: tests/test_integrator.py) — closed-form expectations at fixed
seed with the reference's tolerances — but runs on the CPU backend, since
the estimator is backend-agnostic jittable JAX.
"""

import math

import numpy as np
import pytest

from tpu_montecarlo import Distribution, IntegrationResult, MonteCarloIntegrator, integrate

GLOBAL_COEFF = 2.5


class TestBasicAPI:
    def test_init(self):
        assert MonteCarloIntegrator() is not None

    def test_single_function(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        result = integrator.integrate([lambda x: x], dist, n_samples=100_000)
        assert isinstance(result, IntegrationResult)
        assert len(result.values) == 1
        assert abs(result.values[0]) < 0.1

    def test_multiple_functions_share_samples(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        result = integrator.integrate(
            [lambda x: x, lambda x: x**2, lambda x: x**3],
            dist,
            n_samples=100_000,
        )
        assert len(result.values) == 3
        assert abs(result.values[0]) < 0.1
        assert abs(result.values[1] - 1.0) < 0.1
        assert abs(result.values[2]) < 0.1

    def test_wgsl_string_function(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        src = "fn square(x: f32) -> f32 { return x * x; }"
        result = integrator.integrate([src], dist, n_samples=100_000)
        assert abs(result.values[0] - 1.0) < 0.1

    def test_mixed_callable_and_wgsl(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        src = "fn sq(x: f32) -> f32 { return x * x; }"
        result = integrator.integrate(
            [lambda x: x, src], dist, n_samples=100_000
        )
        assert abs(result.values[0]) < 0.1
        assert abs(result.values[1] - 1.0) < 0.1

    def test_empty_functions_error(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        with pytest.raises(ValueError):
            integrator.integrate([], dist, n_samples=1000)

    def test_invalid_function_type_error(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        with pytest.raises(TypeError):
            integrator.integrate([123], dist, n_samples=1000)

    def test_result_object_semantics(self, integrator):
        dist = Distribution.uniform(0.0, 1.0)
        result = integrator.integrate(
            [lambda x: x, lambda x: 1.0 - x], dist, n_samples=10_000
        )
        assert result.values.dtype == np.float64
        assert result.n_samples == 10_000
        assert result.n_functions == 2
        assert len(result) == 2
        assert result[0] == result.values[0]
        assert "IntegrationResult" in repr(result)
        assert result.acceptance_rate is None


class TestLambdaSourceRecovery:
    def test_inline_lambdas_in_call(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        result = integrator.integrate([lambda x: x, lambda x: x * x], dist, n_samples=100_000)
        assert abs(result.values[0]) < 0.1
        assert abs(result.values[1] - 1.0) < 0.1

    def test_inline_lambdas_four_on_one_line(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        result = integrator.integrate([lambda x: x, lambda x: x**2, lambda x: x**3, lambda x: x**4], dist, n_samples=1_000_000)
        assert abs(result.values[0]) < 0.1
        assert abs(result.values[1] - 1.0) < 0.1
        assert abs(result.values[2]) < 0.1
        assert abs(result.values[3] - 3.0) < 0.1

    def test_tuple_unpacking_lambdas(self, integrator):
        f, g = lambda x: x, lambda x: x * x
        dist = Distribution.normal(0.0, 1.0)
        result = integrator.integrate([f, g], dist, n_samples=100_000)
        assert abs(result.values[0]) < 0.1
        assert abs(result.values[1] - 1.0) < 0.1

    def test_global_capture(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        result = integrator.integrate(
            [lambda x: GLOBAL_COEFF * x * x], dist, n_samples=1_000_000
        )
        assert abs(result.values[0] - GLOBAL_COEFF) < 0.05

    def test_closure_capture(self, integrator):
        scale = 3.0

        def make(s):
            return lambda x: s * x * x

        dist = Distribution.normal(0.0, 1.0)
        result = integrator.integrate([make(scale)], dist, n_samples=1_000_000)
        assert abs(result.values[0] - scale) < 0.05

    def test_math_constants(self, integrator):
        dist = Distribution.uniform(0.0, 1.0)
        result = integrator.integrate(
            [lambda x: math.pi, lambda x: math.e], dist, n_samples=10_000
        )
        assert abs(result.values[0] - math.pi) < 1e-5
        assert abs(result.values[1] - math.e) < 1e-5


class TestStatisticalAccuracy:
    """Reference tolerances: ±0.01 at 1e7 samples, seed 42."""

    def test_normal_mean_and_variance(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        result = integrator.integrate(
            [lambda x: x, lambda x: x * x], dist, n_samples=10_000_000
        )
        assert abs(result.values[0]) < 0.01
        assert abs(result.values[1] - 1.0) < 0.01

    def test_uniform_mean_and_variance(self, integrator):
        dist = Distribution.uniform(0.0, 1.0)
        result = integrator.integrate(
            [lambda x: x, lambda x: (x - 0.5) ** 2], dist, n_samples=10_000_000
        )
        assert abs(result.values[0] - 0.5) < 0.01
        assert abs(result.values[1] - 1.0 / 12.0) < 0.01

    def test_exponential_mean_and_variance(self, integrator):
        lam = 2.0
        dist = Distribution.exponential(lam)
        result = integrator.integrate(
            [lambda x: x, lambda x: (x - 0.5) ** 2], dist, n_samples=10_000_000
        )
        assert abs(result.values[0] - 1.0 / lam) < 0.01
        assert abs(result.values[1] - 1.0 / lam**2) < 0.01

    def test_normal_moments_to_fourth(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        result = integrator.integrate(
            [lambda x: x, lambda x: x**2, lambda x: x**3, lambda x: x**4],
            dist,
            n_samples=10_000_000,
        )
        assert abs(result.values[0]) < 0.01
        assert abs(result.values[1] - 1.0) < 0.01
        assert abs(result.values[2]) < 0.01
        assert abs(result.values[3] - 3.0) < 0.01

    def test_trig_expectations(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        result = integrator.integrate(
            [lambda x: math.sin(x), lambda x: x * math.cos(x)],
            dist,
            n_samples=10_000_000,
        )
        assert abs(result.values[0]) < 0.01
        assert abs(result.values[1]) < 0.01

    def test_polynomial_expectation(self, integrator):
        # E[2x^2 + 3x + 1] under N(0,1) = 2 + 0 + 1 = 3
        dist = Distribution.normal(0.0, 1.0)
        result = integrator.integrate(
            [lambda x: 2 * x * x + 3 * x + 1], dist, n_samples=1_000_000
        )
        assert abs(result.values[0] - 3.0) < 0.05

    def test_indicator_function(self, integrator):
        # P(X > 1) under N(0,1) = 0.158655
        dist = Distribution.normal(0.0, 1.0)
        result = integrator.integrate(
            [lambda x: x > 1.0], dist, n_samples=10_000_000
        )
        assert abs(result.values[0] - 0.158655) < 0.005

    def test_shifted_scaled_normal(self, integrator):
        dist = Distribution.normal(3.0, 2.0)
        result = integrator.integrate(
            [lambda x: x, lambda x: (x - 3.0) ** 2], dist, n_samples=10_000_000
        )
        assert abs(result.values[0] - 3.0) < 0.01
        assert abs(result.values[1] - 4.0) < 0.02


class TestConfigKnobs:
    def test_target_threads_passthrough(self):
        dist = Distribution.normal(0.0, 1.0)
        integ = MonteCarloIntegrator(target_threads=1024)
        result = integ.integrate([lambda x: x * x], dist, n_samples=100_000)
        assert abs(result.values[0] - 1.0) < 0.1

    def test_xla_backend_explicit(self):
        dist = Distribution.normal(0.0, 1.0)
        integ = MonteCarloIntegrator(backend="xla")
        result = integ.integrate([lambda x: x * x], dist, n_samples=100_000)
        assert abs(result.values[0] - 1.0) < 0.1

    def test_unknown_backend_rejected(self):
        with pytest.raises(ValueError):
            MonteCarloIntegrator(backend="cuda")

    def test_module_level_integrate(self):
        dist = Distribution.normal(0.0, 1.0)
        result = integrate([lambda x: x * x], dist, n_samples=100_000)
        assert abs(result.values[0] - 1.0) < 0.1

    def test_seed_reproducibility(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        r1 = integrator.integrate([lambda x: x * x], dist, n_samples=100_000, seed=7)
        r2 = integrator.integrate([lambda x: x * x], dist, n_samples=100_000, seed=7)
        np.testing.assert_array_equal(r1.values, r2.values)

    def test_different_seeds_differ(self, integrator):
        dist = Distribution.normal(0.0, 1.0)
        r1 = integrator.integrate([lambda x: x * x], dist, n_samples=100_000, seed=1)
        r2 = integrator.integrate([lambda x: x * x], dist, n_samples=100_000, seed=2)
        assert r1.values[0] != r2.values[0]
