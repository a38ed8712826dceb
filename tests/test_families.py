"""Extended analytic families (lognormal / cauchy / laplace / logistic /
gumbel / weibull / pareto).

These go beyond the reference's factory surface (reference:
python/wgpu_montecarlo/__init__.py:254-608 stops at
uniform/normal/exponential/beta/from_pdf): each family is one
``sampling.ANALYTIC_EXT`` registry row — an exact inverse-CDF transform
plus a closed-form log density — consumed generically by every backend.
The tests sweep each family through the full feature matrix: moments on
both backends, QMC, MCMC proposals AND targets, IS, param_batch,
pathwise gradients, nd kernels, and log-pdf/pdf consistency.
"""

import math

import numpy as np
import pytest

import tpu_montecarlo as mc
from tpu_montecarlo import Distribution, MonteCarloIntegrator
from tpu_montecarlo.sampling import (
    ANALYTIC_EXT,
    DistKind,
    analytic_log_pdf,
    dist_spec_of,
)

EULER_GAMMA = 0.5772156649


def _gamma(z):
    return math.gamma(z)


# (factory kwargs, mean, variance) per family — None variance = skip.
FAMILY_MOMENTS = [
    ("lognormal", dict(mu=0.3, sigma=0.5),
     math.exp(0.3 + 0.125), (math.exp(0.25) - 1) * math.exp(0.6 + 0.25)),
    ("laplace", dict(loc=1.0, scale=2.0), 1.0, 8.0),
    ("logistic", dict(loc=0.5, scale=1.0), 0.5, math.pi ** 2 / 3),
    ("gumbel", dict(loc=0.0, scale=1.5),
     1.5 * EULER_GAMMA, (math.pi * 1.5) ** 2 / 6),
    ("weibull", dict(shape=2.0, scale=1.0),
     _gamma(1.5), _gamma(2.0) - _gamma(1.5) ** 2),
    ("pareto", dict(x_min=1.0, alpha=3.0), 1.5, 0.75),
]


def make(name, **kw):
    return getattr(Distribution, name)(**kw)


class TestMoments:
    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    @pytest.mark.parametrize(
        "name,kw,mean,var", FAMILY_MOMENTS,
        ids=[row[0] for row in FAMILY_MOMENTS],
    )
    def test_mean_and_variance(self, backend, name, kw, mean, var):
        d = make(name, **kw)
        r = MonteCarloIntegrator(backend=backend).integrate(
            [lambda x: x, lambda x: x * x], d,
            n_samples=600_000, return_stderr=True,
        )
        assert abs(r.values[0] - mean) < 5 * r.stderr[0] + 0.01
        assert abs(r.values[1] - (var + mean * mean)) < (
            5 * r.stderr[1] + 0.02
        )

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_cauchy_quantiles(self, backend):
        # No moments: check the CDF at loc and loc +/- scale
        # (F(loc) = 1/2, F(loc +/- scale) = 1/2 +/- 1/4).
        d = Distribution.cauchy(2.0, 1.5)
        r = MonteCarloIntegrator(backend=backend).integrate(
            [lambda x: x < 2.0, lambda x: x < 0.5, lambda x: x < 3.5],
            d, n_samples=600_000,
        )
        np.testing.assert_allclose(
            r.values, [0.5, 0.25, 0.75], atol=0.01
        )

    def test_qmc_is_tighter_than_mc(self):
        # The monotone inverse CDF carries the low-discrepancy structure
        # to the samples: rQMC error bars must beat plain MC stderr.
        d = Distribution.gumbel(0.0, 1.0)
        truth = EULER_GAMMA
        r_mc = mc.integrate(
            [lambda x: x], d, n_samples=1 << 18, return_stderr=True
        )
        r_q = mc.integrate(
            [lambda x: x], d, n_samples=1 << 18, method="qmc",
            return_stderr=True, qmc_rotations=8,
        )
        assert abs(r_q.values[0] - truth) < 0.005
        assert r_q.stderr[0] < 0.5 * r_mc.stderr[0]


class TestLogPdfConsistency:
    @pytest.mark.parametrize("kind", list(ANALYTIC_EXT), ids=lambda k: k.name)
    def test_matches_factory_pdf(self, kind):
        # The registry's closed-form log density and the factory's scalar
        # pdf closure must be the same function (exp(log_pdf) == pdf)
        # wherever the density is above the -100 floor.
        ext = ANALYTIC_EXT[kind]
        kw_defaults = {
            DistKind.LOGNORMAL: dict(mu=0.2, sigma=0.7),
            DistKind.CAUCHY: dict(loc=1.0, scale=2.0),
            DistKind.LAPLACE: dict(loc=-1.0, scale=0.5),
            DistKind.LOGISTIC: dict(loc=0.0, scale=2.0),
            DistKind.GUMBEL: dict(loc=1.0, scale=2.0),
            DistKind.WEIBULL: dict(shape=1.7, scale=2.0),
            DistKind.PARETO: dict(x_min=0.5, alpha=2.5),
        }[kind]
        d = make(ext.name, **kw_defaults)
        spec = dist_spec_of(d)
        assert spec.kind == kind
        lo, hi = d.params["support"]
        xs = np.linspace(max(lo, -30.0), min(hi, 30.0), 301)[1:-1]
        lp = np.asarray(
            analytic_log_pdf(kind, spec.params[0], spec.params[1], xs)
        )
        host = np.array([d.pdf(float(x)) for x in xs])
        m = host > 1e-30
        np.testing.assert_allclose(
            np.exp(lp[m]).astype(np.float64), host[m], rtol=2e-4
        )

    def test_log_pdf_finite_everywhere(self):
        # Every registry log density must stay finite (floored) on wild
        # inputs — MCMC acceptance deltas would NaN on inf - inf.
        xs = np.array(
            [-1e30, -100.0, -1.0, 0.0, 1e-30, 1.0, 100.0, 1e30],
            np.float32,
        )
        for kind, ext in ANALYTIC_EXT.items():
            lp = np.asarray(ext.log_pdf(xs, np.float32(1.0), np.float32(1.5)))
            assert np.all(np.isfinite(lp)), kind


class TestMcmc:
    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_new_family_target(self, backend):
        r = MonteCarloIntegrator(backend=backend).integrate_mcmc(
            [lambda x: x], Distribution.laplace(3.0, 1.0),
            Distribution.normal(0.0, 2.0),
            n_steps=3000, n_chains=512, n_burnin=500,
        )
        assert abs(r.values[0] - 3.0) < 0.2
        assert 0.05 < r.acceptance_rate < 0.95

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_new_family_proposal(self, backend):
        # Independence-style MH with a heavy-tailed logistic proposal
        # mixes into a normal target fine.
        r = MonteCarloIntegrator(backend=backend).integrate_mcmc(
            [lambda x: x * x], Distribution.normal(0.0, 1.0),
            Distribution.logistic(0.0, 2.0),
            n_steps=3000, n_chains=512, n_burnin=500,
        )
        assert abs(r.values[0] - 1.0) < 0.1


class TestServingAndGrads:
    def test_param_batch_sweep(self):
        from tpu_montecarlo import pack_param_batch

        dists = [Distribution.weibull(k, 1.0) for k in (1.0, 1.5, 2.0)]
        pb = pack_param_batch(dists)
        prog = MonteCarloIntegrator(backend="pallas").compile_integrate(
            [lambda x: x], dists[0], n_samples=300_000,
            seed_batch=3, param_batch=True,
        )
        v = np.asarray(prog([1, 2, 3], pb))
        truth = [_gamma(1.0 + 1.0 / k) for k in (1.0, 1.5, 2.0)]
        np.testing.assert_allclose(v[:, 0], truth, atol=0.02)

    def test_expectation_grad(self):
        import jax
        import jax.numpy as jnp

        est = mc.expectation_fn(
            [lambda x: x], Distribution.lognormal(0.0, 0.5),
            n_samples=300_000,
        )
        g = jax.grad(lambda p: est(p)[0])(
            jnp.array([0.0, 0.5], jnp.float32)
        )
        # dE/dmu = E[X], dE/dsigma = sigma * E[X] for lognormal.
        ex = math.exp(0.125)
        assert abs(float(g[0]) - ex) < 0.03
        assert abs(float(g[1]) - 0.5 * ex) < 0.03

    def test_seed_batch_bit_equal(self):
        it = MonteCarloIntegrator(backend="pallas")
        d = Distribution.pareto(1.0, 2.5)
        prog = it.compile_integrate(
            [lambda x: x], d, n_samples=200_000, seed_batch=2
        )
        single = it.compile_integrate(
            [lambda x: x], d, n_samples=200_000
        )
        v = np.asarray(prog([5, 9]))
        np.testing.assert_array_equal(v[1], np.float32(single(9)))


class TestNd:
    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_mixed_dims(self, backend):
        # E[X * Y] over independent lognormal x gumbel = E[X] E[Y].
        dists = [
            Distribution.lognormal(0.0, 0.5),
            Distribution.gumbel(1.0, 0.5),
        ]
        r = MonteCarloIntegrator(backend=backend).integrate(
            [lambda x, y: x * y], dists, n_samples=600_000,
        )
        truth = math.exp(0.125) * (1.0 + 0.5 * EULER_GAMMA)
        assert abs(r.values[0] - truth) < 0.02

    def test_nd_mcmc_product_target(self):
        r = mc.integrate_mcmc(
            [lambda x, y: x + y],
            [Distribution.laplace(2.0, 1.0), Distribution.logistic(-1.0, 0.5)],
            [Distribution.normal(0.0, 2.0), Distribution.normal(0.0, 2.0)],
            n_steps=3000, n_chains=512, n_burnin=500,
        )
        assert abs(r.values[0] - 1.0) < 0.25


class TestValidationAndIS:
    def test_bad_params_raise(self):
        with pytest.raises(ValueError):
            Distribution.lognormal(0.0, -1.0)
        with pytest.raises(ValueError):
            Distribution.cauchy(0.0, 0.0)
        with pytest.raises(ValueError):
            Distribution.weibull(-2.0)
        with pytest.raises(ValueError):
            Distribution.pareto(0.0, 1.0)
        with pytest.raises(ValueError):
            Distribution.gumbel(0.0, -0.5)

    def test_is_traced_weights(self):
        # Both new-family pdfs trace -> weights fold into the kernel.
        r = mc.integrate_importance_sampling(
            [lambda x: x], Distribution.lognormal(0.0, 0.5),
            Distribution.lognormal(0.1, 0.6),
            n_samples=400_000, return_stderr=True,
        )
        truth = math.exp(0.125)
        assert abs(r.values[0] - truth) < 5 * r.stderr[0] + 0.01

    def test_is_new_family_proposal_for_table_target(self):
        # Table target + laplace proposal exercises the table-weight
        # kernel path with an extended-family sampler.
        def box(x):
            return float(int(abs(x) < 1.0)) * 0.5

        target = Distribution.from_pdf(box, support=(-1.0, 1.0))
        r = mc.integrate_importance_sampling(
            [lambda x: x * x], target, Distribution.laplace(0.0, 1.0),
            n_samples=400_000, return_stderr=True,
        )
        assert abs(r.values[0] - 1.0 / 3.0) < 4 * r.stderr[0] + 2e-3

    def test_tail_truncation_documented(self):
        # The 1e-7 u-clamp truncates sampled tails: a pareto(1, 0.5)
        # draw cannot exceed x_min * exp(16.12 / 0.5) on either backend.
        cap = 1.0 * math.exp(-math.log(1e-7) / 0.5)
        for backend in ("xla", "pallas"):
            r = MonteCarloIntegrator(backend=backend).integrate(
                [lambda x: x > 1e15], Distribution.pareto(1.0, 0.5),
                n_samples=200_000,
            )
            assert r.values[0] <= 1.0  # well-defined, no inf/NaN
        assert cap < 1e15


class TestSpecPacking:
    def test_param_order_matches_registry(self):
        d = Distribution.weibull(1.7, 2.5)
        spec = dist_spec_of(d)
        assert spec.kind == DistKind.WEIBULL
        np.testing.assert_allclose(spec.params, [1.7, 2.5])
        d2 = Distribution.pareto(0.5, 3.0)
        np.testing.assert_allclose(
            dist_spec_of(d2).params, [0.5, 3.0]
        )
