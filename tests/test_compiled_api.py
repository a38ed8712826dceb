"""Ahead-of-time compiled-program handles (compile_integrate /
compile_importance_sampling / compile_mcmc) — the serving API the
re-compile-every-call reference lacks (SURVEY.md §3.2)."""

import numpy as np
import pytest

from tpu_montecarlo import Distribution, MonteCarloIntegrator


@pytest.fixture(scope="module")
def integ():
    return MonteCarloIntegrator()


class TestCompileIntegrate:
    def test_matches_integrate(self, integ):
        d = Distribution.normal(0.0, 1.0)
        fns = [lambda x: x, lambda x: x * x]
        prog = integ.compile_integrate(fns, d, n_samples=500_000)
        vals = np.asarray(prog(42))
        ref = integ.integrate(fns, d, n_samples=500_000, seed=42)
        np.testing.assert_allclose(vals, ref.values, rtol=1e-6)

    def test_repeat_calls_distinct_seeds(self, integ):
        d = Distribution.uniform(0.0, 1.0)
        prog = integ.compile_integrate([lambda x: x], d, n_samples=100_000)
        v1 = float(np.asarray(prog(1))[0])
        v2 = float(np.asarray(prog(2))[0])
        assert v1 != v2
        assert abs(v1 - 0.5) < 0.01

    def test_custom_distribution(self, integ):
        beta = Distribution.beta(2.0, 5.0)
        prog = integ.compile_integrate([lambda x: x], beta, n_samples=500_000)
        assert abs(float(np.asarray(prog(42))[0]) - 2.0 / 7.0) < 0.02


class TestCompileIS:
    def test_matches_is(self, integ):
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(0.0, 1.5)
        fns = [lambda x: x * x]
        prog = integ.compile_importance_sampling(
            fns, target, proposal, n_samples=500_000
        )
        vals = np.asarray(prog(42))
        ref = integ.integrate_importance_sampling(
            fns, target, proposal, n_samples=500_000, seed=42
        )
        np.testing.assert_allclose(vals, ref.values, rtol=1e-6)


class TestCompileMCMC:
    def test_matches_integrate_mcmc(self, integ):
        d = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        prog = integ.compile_mcmc(
            [lambda x: x * x], d, q, n_steps=300, n_chains=256, n_burnin=50
        )
        vals, acc = prog(42)
        ref = integ.integrate_mcmc(
            [lambda x: x * x], d, q,
            n_steps=300, n_chains=256, n_burnin=50, seed=42,
        )
        np.testing.assert_allclose(np.asarray(vals), ref.values, rtol=1e-6)
        assert float(acc) == pytest.approx(ref.acceptance_rate, abs=1e-6)

    def test_validation(self, integ):
        d = Distribution.normal(0.0, 1.0)
        with pytest.raises(ValueError):
            integ.compile_mcmc([], d, d)
        with pytest.raises(ValueError):
            integ.compile_mcmc([lambda x: x], d, d, n_steps=0)

    def test_table_target(self, integ):
        import math

        target = Distribution.from_pdf(
            lambda x: math.exp(-0.5 * (x - 1.0) ** 2), support=(-4.0, 6.0)
        )
        q = Distribution.uniform(-4.0, 6.0)
        prog = integ.compile_mcmc(
            [lambda x: x], target, q, n_steps=500, n_chains=512, n_burnin=100
        )
        vals, acc = prog(42)
        assert abs(float(np.asarray(vals)[0]) - 1.0) < 0.1
