"""MCMC: log-PDF conversion (host tier) + independence-MH chain behaviour.

Mirrors the reference MCMC suite (reference: tests/test_mcmc.py): log-table
math without a device, statistical tolerances 0.1-0.2 at seed 42, burn-in
semantics, chain-count edge cases, exact seed reproducibility, and error
handling.
"""

import math

import numpy as np
import pytest

from tpu_montecarlo import Distribution, integrate_mcmc
from tpu_montecarlo.tables import LOG_PDF_FLOOR


class TestLogPdfConversion:
    """Host-only tier — no device needed (reference test_mcmc.py:24-84)."""

    def test_normal_log_pdf_correctness(self):
        d = Distribution.normal(0.0, 1.0)
        x, logp = d.get_log_pdf_table()
        i = np.argmin(np.abs(x))
        expected = -0.5 * 0.0 - math.log(math.sqrt(2 * math.pi))
        assert logp[i] == pytest.approx(expected, abs=1e-3)

    def test_zero_pdf_maps_to_floor(self):
        d = Distribution.uniform(0.0, 1.0)
        # Widen the grid so points outside support exist.
        d._x_table = np.linspace(-1.0, 2.0, 2048).astype(np.float32)
        d._pdf_table = None
        x, logp = d.get_log_pdf_table()
        outside = logp[x < -0.001]
        assert np.all(outside == LOG_PDF_FLOOR)

    def test_numerical_stability_tight_sigma(self):
        d = Distribution.normal(0.0, 0.01)
        x, logp = d.get_log_pdf_table()
        assert np.all(np.isfinite(logp))

    def test_negative_pdf_maps_to_floor(self):
        from tpu_montecarlo.tables import log_pdf_from_pdf

        logp = log_pdf_from_pdf(np.array([-1.0, 0.0, 1.0]))
        assert logp[0] == LOG_PDF_FLOOR
        assert logp[1] == LOG_PDF_FLOOR
        assert logp[2] == pytest.approx(0.0)

    def test_custom_min_log_value(self):
        from tpu_montecarlo.tables import log_pdf_from_pdf

        logp = log_pdf_from_pdf(np.array([0.0]), min_log_value=-50.0)
        assert logp[0] == -50.0


class TestChainStatistics:
    """Reference tolerances 0.1-0.2."""

    def test_normal_mean(self, integrator):
        target = Distribution.normal(1.0, 1.0)
        proposal = Distribution.normal(1.0, 2.0)
        result = integrator.integrate_mcmc(
            [lambda x: x], target, proposal,
            n_steps=2000, n_chains=512, n_burnin=200,
        )
        assert abs(result.values[0] - 1.0) < 0.1

    def test_normal_second_moment(self, integrator):
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(0.0, 2.0)
        result = integrator.integrate_mcmc(
            [lambda x: x * x], target, proposal,
            n_steps=2000, n_chains=512, n_burnin=200,
        )
        assert abs(result.values[0] - 1.0) < 0.2

    def test_multiple_functions(self, integrator):
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(0.0, 2.0)
        result = integrator.integrate_mcmc(
            [lambda x: x, lambda x: x * x, lambda x: x**3],
            target, proposal,
            n_steps=2000, n_chains=512, n_burnin=200,
        )
        assert abs(result.values[0]) < 0.1
        assert abs(result.values[1] - 1.0) < 0.2
        assert abs(result.values[2]) < 0.3

    def test_same_proposal_as_target(self, integrator):
        # Independence sampler with q = p accepts everything.
        d = Distribution.normal(0.0, 1.0)
        result = integrator.integrate_mcmc(
            [lambda x: x * x], d, d, n_steps=1000, n_chains=512, n_burnin=100
        )
        assert abs(result.values[0] - 1.0) < 0.2
        assert result.acceptance_rate > 0.99

    def test_uniform_proposal(self, integrator):
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.uniform(-6.0, 6.0)
        result = integrator.integrate_mcmc(
            [lambda x: x], target, proposal,
            n_steps=2000, n_chains=512, n_burnin=200,
        )
        assert abs(result.values[0]) < 0.1

    def test_custom_bimodal_target(self, integrator):
        def pdf(x):
            return math.exp(-0.5 * (x - 2.0) ** 2) + math.exp(
                -0.5 * (x + 2.0) ** 2
            )

        target = Distribution.from_pdf(pdf, support=(-6.0, 6.0))
        proposal = Distribution.uniform(-6.0, 6.0)
        result = integrator.integrate_mcmc(
            [lambda x: x, lambda x: x * x], target, proposal,
            n_steps=2000, n_chains=512, n_burnin=200,
        )
        assert abs(result.values[0]) < 0.15  # symmetric modes
        assert abs(result.values[1] - 5.0) < 0.3  # E[X^2] = 4 + 1

    def test_beta_target(self, integrator):
        target = Distribution.beta(2.0, 5.0)
        proposal = Distribution.uniform(0.0, 1.0)
        result = integrator.integrate_mcmc(
            [lambda x: x], target, proposal,
            n_steps=2000, n_chains=512, n_burnin=200,
        )
        assert abs(result.values[0] - 2.0 / 7.0) < 0.05

    def test_exponential_target(self, integrator):
        target = Distribution.exponential(2.0)
        proposal = Distribution.exponential(1.0)
        result = integrator.integrate_mcmc(
            [lambda x: x], target, proposal,
            n_steps=2000, n_chains=512, n_burnin=200,
        )
        assert abs(result.values[0] - 0.5) < 0.1


class TestChainMechanics:
    def test_zero_burnin_allowed(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        result = integrator.integrate_mcmc(
            [lambda x: x], d, Distribution.normal(0.0, 2.0),
            n_steps=1000, n_chains=256, n_burnin=0,
        )
        assert abs(result.values[0]) < 0.2

    def test_burnin_does_not_change_sample_count(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        r0 = integrator.integrate_mcmc(
            [lambda x: x], d, q, n_steps=500, n_chains=256, n_burnin=0
        )
        r1 = integrator.integrate_mcmc(
            [lambda x: x], d, q, n_steps=500, n_chains=256, n_burnin=300
        )
        assert r0.n_samples == r1.n_samples == 500 * 256

    def test_single_chain(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        result = integrator.integrate_mcmc(
            [lambda x: x], d, Distribution.normal(0.0, 2.0),
            n_steps=3000, n_chains=1, n_burnin=300,
        )
        # n_chains=1 rounds up to the 256-lane grid (reference quirk:
        # all rounded-up chains run and are averaged, engine.rs:860-871).
        assert abs(result.values[0]) < 0.2

    def test_many_chains(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        result = integrator.integrate_mcmc(
            [lambda x: x], d, Distribution.normal(0.0, 2.0),
            n_steps=500, n_chains=4096, n_burnin=100,
        )
        assert abs(result.values[0]) < 0.05

    def test_reproducibility_with_equal_seeds(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        r1 = integrator.integrate_mcmc(
            [lambda x: x, lambda x: x * x], d, q,
            n_steps=500, n_chains=256, n_burnin=50, seed=123,
        )
        r2 = integrator.integrate_mcmc(
            [lambda x: x, lambda x: x * x], d, q,
            n_steps=500, n_chains=256, n_burnin=50, seed=123,
        )
        np.testing.assert_array_almost_equal(r1.values, r2.values)

    def test_different_seeds_differ(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        r1 = integrator.integrate_mcmc(
            [lambda x: x], d, q, n_steps=500, n_chains=256, seed=1
        )
        r2 = integrator.integrate_mcmc(
            [lambda x: x], d, q, n_steps=500, n_chains=256, seed=2
        )
        assert r1.values[0] != r2.values[0]

    def test_acceptance_rate_reported(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        result = integrator.integrate_mcmc(
            [lambda x: x], d, Distribution.normal(0.0, 2.0),
            n_steps=500, n_chains=256, n_burnin=50,
        )
        assert 0.0 < result.acceptance_rate <= 1.0

    def test_n_samples_metadata(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        result = integrator.integrate_mcmc(
            [lambda x: x], d, Distribution.normal(0.0, 2.0),
            n_steps=100, n_chains=64, n_burnin=10,
        )
        assert result.n_samples == 100 * 64
        assert result.n_functions == 1


class TestErrors:
    def test_empty_function_list(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        with pytest.raises(ValueError):
            integrator.integrate_mcmc([], d, d, n_steps=100, n_chains=64)

    def test_zero_n_steps(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        with pytest.raises(ValueError):
            integrator.integrate_mcmc(
                [lambda x: x], d, d, n_steps=0, n_chains=64
            )

    def test_zero_n_chains(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        with pytest.raises(ValueError):
            integrator.integrate_mcmc(
                [lambda x: x], d, d, n_steps=100, n_chains=0
            )

    def test_negative_burnin(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        with pytest.raises(ValueError):
            integrator.integrate_mcmc(
                [lambda x: x], d, d, n_steps=100, n_chains=64, n_burnin=-1
            )

    def test_invalid_function_type(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        with pytest.raises(TypeError):
            integrator.integrate_mcmc(
                [3.14], d, d, n_steps=100, n_chains=64
            )

    def test_convenience_function(self):
        d = Distribution.normal(0.0, 1.0)
        result = integrate_mcmc(
            [lambda x: x * x], d, Distribution.normal(0.0, 2.0),
            n_steps=500, n_chains=256, n_burnin=50,
        )
        assert abs(result.values[0] - 1.0) < 0.2
