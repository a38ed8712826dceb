"""Native C++ oracle tier: independent implementations of the sampler /
table / MH math cross-check the JAX estimators (SURVEY.md §7.1 native/).
"""

import numpy as np
import pytest

from tpu_montecarlo import Distribution, MonteCarloIntegrator
from tpu_montecarlo.native import get_oracle, oracle_available
from tpu_montecarlo.sampling import DistKind

pytestmark = pytest.mark.skipif(
    not oracle_available(), reason="g++ toolchain unavailable"
)


@pytest.fixture(scope="module")
def oracle():
    return get_oracle()


class TestOracleSamplers:
    def test_uniform_moments(self, oracle):
        x = oracle.sample(DistKind.UNIFORM, [0.0, 1.0], seed=1, n=200_000)
        assert abs(x.mean() - 0.5) < 0.01
        assert abs(x.var() - 1 / 12) < 0.01
        assert x.min() >= 0.0 and x.max() < 1.0

    def test_normal_moments(self, oracle):
        x = oracle.sample(DistKind.NORMAL, [0.0, 1.0], seed=1, n=200_000)
        assert abs(x.mean()) < 0.01
        assert abs(x.var() - 1.0) < 0.02

    def test_exponential_moments(self, oracle):
        x = oracle.sample(DistKind.EXPONENTIAL, [2.0, 0.0], seed=1, n=200_000)
        assert abs(x.mean() - 0.5) < 0.01
        assert x.min() >= 0.0

    def test_custom_table_sampling(self, oracle):
        d = Distribution.beta(2.0, 5.0)
        x = oracle.sample(
            DistKind.CUSTOM, [0.0, 0.0], seed=1, n=200_000,
            x_table=d._x_table, cdf_table=d._cdf_table,
        )
        assert abs(x.mean() - 2.0 / 7.0) < 0.01


class TestOracleTableLookups:
    def test_pdf_outside_support_is_zero(self, oracle):
        xt = np.linspace(0, 1, 100).astype(np.float32)
        pt = np.ones(100, np.float32)
        vals = oracle.pdf_from_table(
            np.array([-0.5, 0.5, 1.5], np.float32), xt, pt
        )
        assert vals[0] == 0.0
        assert vals[1] == pytest.approx(1.0)
        assert vals[2] == 0.0

    def test_log_pdf_outside_support_is_floor(self, oracle):
        xt = np.linspace(0, 1, 100).astype(np.float32)
        lt = np.zeros(100, np.float32)
        vals = oracle.log_pdf_from_table(
            np.array([-0.5, 0.5, 1.5], np.float32), xt, lt
        )
        assert vals[0] == -100.0
        assert vals[1] == pytest.approx(0.0)
        assert vals[2] == -100.0

    def test_interpolation_matches_numpy(self, oracle):
        xt = np.linspace(-2, 2, 64).astype(np.float32)
        pt = np.exp(-(xt**2)).astype(np.float32)
        q = np.linspace(-1.9, 1.9, 37).astype(np.float32)
        got = oracle.pdf_from_table(q, xt, pt)
        want = np.interp(q, xt, pt)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_closed_form_log_pdfs_match_jax(self, oracle):
        from tpu_montecarlo.sampling import log_pdf
        import jax.numpy as jnp

        x = np.linspace(-3, 3, 101).astype(np.float32)
        for kind, params in [
            (DistKind.UNIFORM, [0.0, 1.0]),
            (DistKind.NORMAL, [0.5, 1.5]),
            (DistKind.EXPONENTIAL, [2.0, 0.0]),
        ]:
            got = oracle.log_pdf(kind, params, x)
            want = np.asarray(
                log_pdf(kind, jnp.asarray(params, jnp.float32), jnp.asarray(x))
            )
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestOracleVsDevice:
    """The oracle and the device estimator must agree within combined
    statistical error (they use different RNG streams by design)."""

    def test_integrate_normal_moments(self, oracle, integrator):
        want = oracle.integrate_moments(
            DistKind.NORMAL, [0.0, 1.0], seed=3, n=1_000_000, k=2
        )
        got = integrator.integrate(
            [lambda x: x, lambda x: x * x],
            Distribution.normal(0.0, 1.0),
            n_samples=1_000_000,
        )
        np.testing.assert_allclose(got.values, want, atol=0.01)

    def test_integrate_beta_mean(self, oracle, integrator):
        d = Distribution.beta(2.0, 5.0)
        want = oracle.integrate_moments(
            DistKind.CUSTOM, [0.0, 0.0], seed=3, n=1_000_000, k=1,
            x_table=d._x_table, cdf_table=d._cdf_table,
        )
        got = integrator.integrate([lambda x: x], d, n_samples=1_000_000)
        np.testing.assert_allclose(got.values, want, atol=0.01)

    def test_mcmc_normal(self, oracle, integrator):
        want, acc_want = oracle.mcmc_moments(
            DistKind.NORMAL, [0.0, 2.0], DistKind.NORMAL, [0.0, 1.0],
            seed=3, n_chains=256, n_steps=1500, n_burnin=200, k=2,
        )
        got = integrator.integrate_mcmc(
            [lambda x: x, lambda x: x * x],
            Distribution.normal(0.0, 1.0),
            Distribution.normal(0.0, 2.0),
            n_steps=1500, n_chains=256, n_burnin=200,
        )
        np.testing.assert_allclose(got.values, want, atol=0.1)
        assert abs(got.acceptance_rate - acc_want) < 0.05

    def test_mean_reduce_parity(self, oracle):
        rng = np.random.default_rng(0)
        partials = rng.normal(size=(4096, 3)).astype(np.float32)
        got = oracle.mean_reduce(partials)
        want = partials.astype(np.float64).mean(axis=0)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_mcmc_custom_proposal_uses_log_table(self, oracle):
        """Independence-sampler q-correction must survive CUSTOM proposals
        (regression: the oracle used to floor both q terms, silently
        degrading to plain Metropolis)."""
        # Triangular proposal on [-4, 4]: q strongly non-uniform, so a
        # dropped q-correction visibly biases E[X^2] under N(0,1).
        prop = Distribution.from_pdf(
            lambda x: 4.0 - abs(x) if abs(x) < 4.0 else 0.0,
            support=(-4.0, 4.0),
        )
        lx, lp = prop.get_log_pdf_table()
        want, acc = oracle.mcmc_moments(
            DistKind.CUSTOM, [0.0, 0.0], DistKind.NORMAL, [0.0, 1.0],
            seed=3, n_chains=256, n_steps=1500, n_burnin=200, k=2,
            prop_x_table=prop._x_table, prop_cdf_table=prop._cdf_table,
            prop_lx=lx, prop_lp=lp,
        )
        assert abs(want[0]) < 0.1
        assert abs(want[1] - 1.0) < 0.15
        assert 0.0 < acc < 1.0


class TestOracleStderr:
    def test_integrate_stderr_vs_framework(self, oracle):
        # Independent double-precision Welford error bars vs the f32
        # pilot-shifted framework accumulators — different streams, so
        # compare magnitudes.
        from tpu_montecarlo import Distribution, integrate

        means, ses = oracle.integrate_stderr(
            DistKind.NORMAL, [0.0, 1.0], seed=3, n=400_000, k=2
        )
        r = integrate(
            [lambda x: x, lambda x: x * x],
            Distribution.normal(0.0, 1.0),
            n_samples=400_000, return_stderr=True,
        )
        # Oracle stderr for E[X] ~ 1/sqrt(n); framework divides by its
        # rounded-up actual count — both near the analytic value.
        np.testing.assert_allclose(
            ses, np.asarray(r.stderr), rtol=0.15
        )
        assert abs(means[0]) < 4 * ses[0]
        assert abs(means[1] - 1.0) < 4 * ses[1]

    def test_stderr_large_mean_stability(self, oracle):
        # The double Welford oracle is cancellation-proof by
        # construction; the framework's pilot shift must track it at a
        # large offset.
        from tpu_montecarlo import Distribution, integrate

        _, ses = oracle.integrate_stderr(
            DistKind.NORMAL, [10_000.0, 1.0], seed=5, n=300_000, k=1
        )
        r = integrate(
            [lambda x: x], Distribution.normal(10_000.0, 1.0),
            n_samples=300_000, return_stderr=True,
        )
        np.testing.assert_allclose(ses, np.asarray(r.stderr), rtol=0.2)


class TestOracleRhat:
    def _jax_rhat(self, seq_means, within_vars, n1):
        import jax.numpy as jnp

        from tpu_montecarlo.ops.mcmc_xla import split_rhat_ess

        sm = np.asarray(seq_means, np.float64)
        wv = np.asarray(within_vars, np.float64)
        m = len(sm)
        mean = sm.mean()
        r, e = split_rhat_ess(
            jnp.float32(wv.sum()),
            jnp.float32(((sm - mean) ** 2).sum()),
            m, n1,
        )
        return float(r), float(e)

    def test_matches_framework_formula(self, oracle):
        rng = np.random.default_rng(11)
        seq_means = rng.normal(3.0, 0.2, size=64)
        within = rng.uniform(0.5, 1.5, size=64)
        r_o, e_o = oracle.split_rhat_ess(seq_means, within, n1=50)
        r_j, e_j = self._jax_rhat(seq_means, within, 50)
        assert abs(r_o - r_j) < 1e-3
        assert abs(e_o - e_j) / e_o < 1e-3

    def test_degenerate_branches_match(self, oracle):
        # Frozen at distinct values -> +inf both sides.
        r_o, e_o = oracle.split_rhat_ess(
            [1.0, 2.0, 3.0, 4.0], [0.0] * 4, n1=10
        )
        r_j, e_j = self._jax_rhat([1.0, 2.0, 3.0, 4.0], [0.0] * 4, 10)
        assert np.isinf(r_o) and np.isinf(r_j)
        assert e_o == e_j == 4.0
        # All-constant -> 1 both sides.
        r_o, e_o = oracle.split_rhat_ess([2.0] * 4, [0.0] * 4, n1=10)
        r_j, e_j = self._jax_rhat([2.0] * 4, [0.0] * 4, 10)
        assert r_o == r_j == 1.0
        assert e_o == e_j == 40.0

    def test_stderr_any_k(self, oracle):
        # Regression: k > 16 must be fully computed, not silently capped
        # at a fixed scratch size (uninitialized tails).
        means, ses = oracle.integrate_stderr(
            DistKind.UNIFORM, [0.0, 1.0], seed=2, n=100_000, k=20
        )
        assert np.all(np.isfinite(means)) and np.all(np.isfinite(ses))
        # E[U^j] = 1/(j+1); check the tail entries specifically.
        for j in (16, 19):
            assert abs(means[j] - 1.0 / (j + 2)) < 0.01
            assert 0 < ses[j] < 0.01


class TestOracleNd:
    """nd oracle tier: the C++ joint-Gaussian MH and the d-dim product
    integrator cross-check the nd kernels' math from an independent
    implementation (streams differ; estimates compare statistically)."""

    def test_nd_gauss_mh_matches_framework_joint_target(self, oracle):
        rho = 0.8
        c = 1.0 / (2 * (1 - rho * rho))
        prop = Distribution.normal(0.0, 2.0)
        it = MonteCarloIntegrator()
        r = it.integrate_mcmc(
            [lambda x, y: x * y, lambda x, y: x * x],
            lambda x, y: -c * (x * x - 2 * rho * x * y + y * y),
            [prop, prop],
            n_steps=3000, n_chains=1024, n_burnin=300, seed=1,
        )
        out, acc = oracle.mcmc_nd_gauss(
            rho, [0.0, 2.0, 0.0, 2.0], d=2, seed=7,
            n_chains=512, n_steps=3000, n_burnin=300,
        )
        # Both implementations estimate the same bivariate Gaussian.
        assert abs(out[0] - rho) < 0.06
        assert abs(out[1] - 1.0) < 0.06
        assert abs(r.values[0] - out[0]) < 0.1
        assert abs(r.values[1] - out[1]) < 0.1
        assert 0.0 < acc < 1.0
        assert abs(acc - r.acceptance_rate) < 0.1

    def test_nd_gauss_exchangeable_d3(self, oracle):
        # d=3 exchangeable rho=0.5: E[x0*x1] = 0.5, E[x0^2] = 1.
        out, acc = oracle.mcmc_nd_gauss(
            0.5, [0.0, 2.0] * 3, d=3, seed=11,
            n_chains=512, n_steps=4000, n_burnin=400,
        )
        assert abs(out[0] - 0.5) < 0.06
        assert abs(out[1] - 1.0) < 0.06

    def test_nd_integrate_mixed_dims_vs_framework(self, oracle):
        it = MonteCarloIntegrator()
        nx = Distribution.normal(1.0, 0.5)
        ex = Distribution.exponential(2.0)
        r = it.integrate(
            [lambda x, y: x * y, lambda x, y: x * x + y * y],
            [nx, ex], n_samples=1_000_000, seed=3,
        )
        out = oracle.integrate_nd_mean(
            [DistKind.NORMAL, DistKind.EXPONENTIAL],
            [1.0, 0.5, 2.0, 0.0], seed=5, n=500_000,
        )
        # E[XY] = 1 * 0.5 = 0.5; E[X^2 + Y^2] = 1.25 + 0.5 = 1.75
        assert abs(out[0] - 0.5) < 0.01
        assert abs(out[1] - 1.75) < 0.02
        assert abs(r.values[0] - out[0]) < 0.02
        assert abs(r.values[1] - out[1]) < 0.03

    def test_nd_integrate_table_dim(self, oracle):
        d = Distribution.beta(2.0, 5.0)
        spec_x = np.asarray(d._x_table, np.float32)
        spec_c = np.asarray(d._cdf_table, np.float32)
        out = oracle.integrate_nd_mean(
            [DistKind.CUSTOM, DistKind.UNIFORM],
            [0.0, 0.0, 0.0, 1.0], seed=9, n=500_000,
            x_table=spec_x, cdf_table=spec_c, table_dim=0,
        )
        assert abs(out[0] - (2.0 / 7.0) * 0.5) < 0.005
