"""Monte Carlo standard errors (``return_stderr=True``).

An addition over the reference (point estimates only): ``result.stderr``
estimates sqrt(Var[f(X)] / N) per function from sums of squares carried
in the same sweep that produces the estimates — pilot-shifted Kahan
accumulators on the XLA path, and pilot-shifted in-kernel accumulator
blocks on the fused Pallas path (error bars no longer price the run off
the kernel).
"""

import numpy as np
import pytest

from tpu_montecarlo import (
    Distribution,
    MonteCarloIntegrator,
    integrate,
    integrate_importance_sampling,
    integrate_mcmc,
)


class TestStderrValues:
    def test_normal_mean_stderr(self):
        # Var[X] = 1 under N(0,1): stderr of E[X] at N samples is
        # ~ 1/sqrt(N_actual); the plan rounds N up, so allow 15%.
        n = 1_000_000
        r = integrate(
            [lambda x: x], Distribution.normal(0.0, 1.0),
            n_samples=n, return_stderr=True,
        )
        assert r.stderr is not None and r.stderr.shape == (1,)
        assert abs(r.stderr[0] - 1.0 / np.sqrt(n)) < 0.15 / np.sqrt(n)
        assert abs(r.values[0]) < 4 * r.stderr[0]

    def test_indicator_stderr(self):
        # f = 1{X > 1}: Var = p(1-p) with p = P(X > 1) ~ 0.1587.
        n = 1_000_000
        p = 0.15865525
        r = integrate(
            [lambda x: x > 1.0], Distribution.normal(0.0, 1.0),
            n_samples=n, return_stderr=True,
        )
        expected = np.sqrt(p * (1 - p) / n)
        assert abs(r.stderr[0] - expected) < 0.1 * expected
        assert abs(r.values[0] - p) < 4 * r.stderr[0]

    def test_stderr_scales_with_n(self):
        # Quadrupling N halves the standard error.
        d = Distribution.exponential(1.0)
        r1 = integrate([lambda x: x], d, n_samples=250_000,
                       return_stderr=True)
        r2 = integrate([lambda x: x], d, n_samples=1_000_000,
                       return_stderr=True)
        ratio = r1.stderr[0] / r2.stderr[0]
        assert abs(ratio - 2.0) < 0.3

    def test_multiple_functions_and_default_none(self):
        d = Distribution.uniform(0.0, 1.0)
        r = integrate(
            [lambda x: x, lambda x: x * x], d, n_samples=200_000,
            return_stderr=True,
        )
        assert r.stderr.shape == (2,)
        # Var[U] = 1/12, Var[U^2] = 1/5 - 1/9 = 4/45.
        n = 200_000
        assert abs(r.stderr[0] - np.sqrt(1 / 12 / n)) < 0.2 * r.stderr[0]
        assert abs(r.stderr[1] - np.sqrt(4 / 45 / n)) < 0.2 * r.stderr[1]
        plain = integrate([lambda x: x], d, n_samples=100_000)
        assert plain.stderr is None

    def test_large_mean_no_cancellation(self):
        # Regression: the one-pass E[f^2] - mean^2 formula collapses in
        # float32 when |mean| >> std (measured stderr=0.0 at N(1e4, 1)
        # and 22x inflated at N(5e4, 1)); the pilot-shifted accumulation
        # must keep the error bar accurate at any offset.
        n = 1_000_000
        for mean in (10_000.0, 50_000.0):
            r = integrate(
                [lambda x: x], Distribution.normal(mean, 1.0),
                n_samples=n, return_stderr=True,
            )
            expected = 1.0 / np.sqrt(n)
            assert abs(r.stderr[0] - expected) < 0.2 * expected, (
                mean, r.stderr[0]
            )

    def test_custom_table_distribution(self):
        r = integrate(
            [lambda x: x], Distribution.beta(2.0, 5.0),
            n_samples=500_000, return_stderr=True,
        )
        # mean 2/7, Var = ab/((a+b)^2 (a+b+1)) = 10/(49*8).
        assert abs(r.values[0] - 2 / 7) < 4 * r.stderr[0] + 1e-3
        assert r.stderr[0] > 0


class TestStderrIS:
    def test_rare_event_stderr(self):
        # The IS estimator's stderr must bracket the truth and be far
        # smaller than the naive-MC stderr sqrt(p/N) for p ~ 3.2e-5.
        n = 10_000_000
        truth = 3.1671e-05
        r = integrate_importance_sampling(
            [lambda x: x > 4.0],
            Distribution.normal(0.0, 1.0),
            Distribution.normal(4.0, 1.0),
            n_samples=n, return_stderr=True,
        )
        assert abs(r.values[0] - truth) < 4 * r.stderr[0]
        naive = np.sqrt(truth / n)
        assert r.stderr[0] < 0.5 * naive

    def test_p_equals_q_matches_plain(self):
        # With p == q the weight is exactly 1 (identical traced pdf
        # expressions), so the IS estimator IS the plain estimator: both
        # the values and the stderrs must match.  A regression that drops
        # the weight from the squared term (estimating Var[f] instead of
        # Var[f w]) survives a positivity check but not this one.
        d = Distribution.normal(0.0, 1.0)
        r_is = integrate_importance_sampling(
            [lambda x: x * x], d, Distribution.normal(0.0, 1.0),
            n_samples=200_000, return_stderr=True,
        )
        plain = integrate(
            [lambda x: x * x], d, n_samples=200_000, return_stderr=True,
        )
        np.testing.assert_allclose(
            r_is.values, plain.values, rtol=1e-6
        )
        np.testing.assert_allclose(
            r_is.stderr, plain.stderr, rtol=1e-5
        )
        assert abs(r_is.values[0] - 1.0) < 4 * r_is.stderr[0]

    def test_table_pdf_fallback_path(self):
        # Non-traceable PDF -> table closure path; stderr still flows.
        def weird_pdf(x):
            return float(int(abs(x) < 1.0)) * 0.5

        tri = Distribution.from_pdf(weird_pdf, support=(-1.0, 1.0))
        r = integrate_importance_sampling(
            [lambda x: x * x],
            tri,
            Distribution.uniform(-1.5, 1.5),
            n_samples=400_000, return_stderr=True,
        )
        assert abs(r.values[0] - 1 / 3) < 4 * r.stderr[0] + 2e-3
        assert r.stderr[0] > 0


class TestStderrMcmc:
    def test_between_chain_stderr(self):
        # stderr from between-chain variance of per-chain means: the
        # truth must sit inside the error bars, and the bars must be at
        # least the iid floor sqrt(Var[f]/(n_steps*n_chains)) — the
        # chain's autocorrelation makes them somewhat wider — without
        # being uselessly wide.
        n_steps, n_chains = 2000, 1024
        r = integrate_mcmc(
            [lambda x: x, lambda x: x * x],
            Distribution.normal(0.0, 1.0),
            Distribution.normal(0.0, 2.0),
            n_steps=n_steps, n_chains=n_chains, n_burnin=200,
            return_stderr=True,
        )
        assert r.stderr is not None and r.stderr.shape == (2,)
        iid_floor = np.sqrt(1.0 / (n_steps * n_chains))
        for v, truth, se in zip(r.values, (0.0, 1.0), r.stderr):
            assert abs(v - truth) < 4 * se
            assert se > 0.5 * iid_floor
            assert se < 20 * iid_floor

    def test_stderr_shrinks_with_chains(self):
        kw = dict(n_steps=500, n_burnin=100, return_stderr=True)
        t = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        r1 = integrate_mcmc([lambda x: x], t, q, n_chains=1024, **kw)
        r2 = integrate_mcmc([lambda x: x], t, q, n_chains=4096, **kw)
        ratio = r1.stderr[0] / r2.stderr[0]
        assert abs(ratio - 2.0) < 0.5

    def test_large_offset_no_swamping(self):
        # Regression: an unshifted per-chain f32 accumulator swamps the
        # between-chain signal when |E[f]| >> std (measured 33x-inflated
        # stderr at N(1e5, 1) and ~20% anti-conservative bars at
        # N(1e4, 1)); the pilot-shifted accumulation must keep the error
        # bar in the honest band at any offset.
        n_steps, n_chains = 2000, 1024
        mu = 100_000.0
        r = integrate_mcmc(
            [lambda x: x], Distribution.normal(mu, 1.0),
            Distribution.normal(mu, 2.0),
            n_steps=n_steps, n_chains=n_chains, n_burnin=200,
            return_stderr=True,
        )
        iid_floor = np.sqrt(1.0 / (n_steps * n_chains))
        assert abs(r.values[0] - mu) < 4 * r.stderr[0] + 1e-3
        assert 0.5 * iid_floor < r.stderr[0] < 20 * iid_floor

    def test_rejected_with_state(self):
        with pytest.raises(ValueError, match="stateless"):
            integrate_mcmc(
                [lambda x: x], Distribution.normal(0.0, 1.0),
                Distribution.normal(0.0, 2.0), n_steps=100, n_chains=256,
                n_burnin=10, return_stderr=True, return_state=True,
            )

    def test_kernel_path_matches_xla(self):
        # Error-bar MCMC stays on the kernel (no fallback warning) and
        # its stderr agrees with the XLA implementation's convention.
        import warnings as _warnings

        kw = dict(n_steps=600, n_chains=1024, n_burnin=100,
                  return_stderr=True)
        t = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")
            r_p = MonteCarloIntegrator(backend="pallas").integrate_mcmc(
                [lambda x: x, lambda x: x * x], t, q, **kw
            )
        r_x = MonteCarloIntegrator(backend="xla").integrate_mcmc(
            [lambda x: x, lambda x: x * x], t, q, **kw
        )
        iid_floor = np.sqrt(1.0 / (600 * 1024))
        for r in (r_p, r_x):
            for v, truth, se in zip(r.values, (0.0, 1.0), r.stderr):
                assert abs(v - truth) < 4 * se
                assert 0.5 * iid_floor < se < 20 * iid_floor
        # Different streams, same estimator: same order of magnitude.
        ratio = r_p.stderr / r_x.stderr
        assert np.all(ratio > 0.4) and np.all(ratio < 2.5)

    def test_kernel_stderr_large_offset(self):
        # The in-kernel pilot shift must hold the error bar honest when
        # |E[f]| >> std (the naive accumulator swamps the signal).
        n_steps, n_chains = 1000, 1024
        mu = 50_000.0
        r = MonteCarloIntegrator(backend="pallas").integrate_mcmc(
            [lambda x: x], Distribution.normal(mu, 1.0),
            Distribution.normal(mu, 2.0),
            n_steps=n_steps, n_chains=n_chains, n_burnin=100,
            return_stderr=True,
        )
        iid_floor = np.sqrt(1.0 / (n_steps * n_chains))
        assert abs(r.values[0] - mu) < 4 * r.stderr[0] + 1e-3
        assert 0.5 * iid_floor < r.stderr[0] < 20 * iid_floor

    def test_kernel_stderr_sharded(self, mesh8):
        # The mesh pads programs to a device multiple and ALL rounded-up
        # chains run (reference round-up semantics), so the error-bar
        # floor uses the actual chain count.
        from tpu_montecarlo.ops.mcmc_pallas import plan_state_chains

        n_steps, n_chains = 600, 2048
        r = MonteCarloIntegrator(
            backend="pallas", mesh=mesh8
        ).integrate_mcmc(
            [lambda x: x], Distribution.normal(0.0, 1.0),
            Distribution.normal(0.0, 2.0),
            n_steps=n_steps, n_chains=n_chains, n_burnin=100,
            return_stderr=True,
        )
        chains_actual = plan_state_chains(n_chains, 8)
        iid_floor = np.sqrt(1.0 / (n_steps * chains_actual))
        assert abs(r.values[0]) < 4 * r.stderr[0]
        assert 0.5 * iid_floor < r.stderr[0] < 20 * iid_floor

    def test_kernel_stderr_custom_target(self):
        r = MonteCarloIntegrator(backend="pallas").integrate_mcmc(
            [lambda x: x * x], Distribution.beta(2.0, 2.0),
            Distribution.uniform(0.0, 1.0),
            n_steps=800, n_chains=1024, n_burnin=100,
            return_stderr=True,
        )
        # E[X^2] for Beta(2,2) = Var + mean^2 = 1/20 + 1/4 = 0.3.
        assert abs(r.values[0] - 0.3) < 4 * r.stderr[0] + 2e-3
        assert r.stderr[0] > 0

    def test_sharded_between_chain_stderr(self):
        n_steps, n_chains = 1000, 2048
        r = MonteCarloIntegrator(mesh="auto").integrate_mcmc(
            [lambda x: x], Distribution.normal(0.0, 1.0),
            Distribution.normal(0.0, 2.0),
            n_steps=n_steps, n_chains=n_chains, n_burnin=100,
            return_stderr=True,
        )
        iid_floor = np.sqrt(1.0 / (n_steps * n_chains))
        assert abs(r.values[0]) < 4 * r.stderr[0]
        assert 0.5 * iid_floor < r.stderr[0] < 20 * iid_floor


class TestStderrInKernel:
    """return_stderr on the fused Pallas kernel (interpreter tier on
    CPU): error bars must stay on the kernel path and agree with the
    XLA implementation."""

    def test_no_fallback_warning_and_matches_xla(self):
        import warnings as _warnings

        fns = [lambda x: x, lambda x: x * x]
        d = Distribution.normal(0.0, 1.0)
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")
            r_p = MonteCarloIntegrator(backend="pallas").integrate(
                fns, d, n_samples=200_000, return_stderr=True
            )
        r_x = MonteCarloIntegrator(backend="xla").integrate(
            fns, d, n_samples=200_000, return_stderr=True
        )
        np.testing.assert_allclose(r_p.stderr, r_x.stderr, rtol=0.05)
        np.testing.assert_allclose(r_p.values, r_x.values, atol=0.02)

    def test_values_bit_equal_to_plain_kernel(self):
        # The stderr kernel's VALUE accumulators are untouched: means
        # must equal the plain kernel run bit-for-bit.
        fns = [lambda x: x, lambda x: x * x, lambda x: x > 0.5]
        d = Distribution.exponential(1.3)
        it = MonteCarloIntegrator(backend="pallas")
        r = it.integrate(fns, d, n_samples=300_000, seed=11,
                         return_stderr=True)
        plain = it.integrate(fns, d, n_samples=300_000, seed=11)
        np.testing.assert_array_equal(r.values, plain.values)

    def test_large_mean_pilot_shift(self):
        # N(1e4, 1): the naive one-pass formula collapses in f32; the
        # in-kernel pilot shift must keep stderr ~ 1/sqrt(N_actual).
        n = 500_000
        r = MonteCarloIntegrator(backend="pallas").integrate(
            [lambda x: x], Distribution.normal(10_000.0, 1.0),
            n_samples=n, return_stderr=True,
        )
        expected = 1.0 / np.sqrt(n)
        assert abs(r.stderr[0] - expected) < 0.35 * expected

    def test_custom_table_kernel_stderr(self):
        r_p = MonteCarloIntegrator(backend="pallas").integrate(
            [lambda x: x], Distribution.beta(2.0, 5.0),
            n_samples=400_000, return_stderr=True,
        )
        r_x = MonteCarloIntegrator(backend="xla").integrate(
            [lambda x: x], Distribution.beta(2.0, 5.0),
            n_samples=400_000, return_stderr=True,
        )
        assert abs(r_p.values[0] - 2 / 7) < 4 * r_p.stderr[0] + 1e-3
        np.testing.assert_allclose(r_p.stderr, r_x.stderr, rtol=0.15)

    def test_is_traced_weights_on_kernel(self):
        r_p = MonteCarloIntegrator(
            backend="pallas"
        ).integrate_importance_sampling(
            [lambda x: x > 4.0],
            Distribution.normal(0.0, 1.0),
            Distribution.normal(4.0, 1.0),
            n_samples=1_000_000, return_stderr=True,
        )
        truth = 3.1671e-05
        assert abs(r_p.values[0] - truth) < 4 * r_p.stderr[0]
        assert r_p.stderr[0] < 0.5 * np.sqrt(truth / 1_000_000)

    def test_sharded_kernel_stderr(self, mesh8):
        # The mesh grid rounds the sample count up (programs pad to a
        # device multiple); stderr must be 1/sqrt of the PROCESSED count,
        # which the builder reports as run.actual_samples.
        from tpu_montecarlo.ops.integrate_pallas import (
            build_integrate_fn_pallas,
        )
        from tpu_montecarlo.sampling import DistKind
        from tpu_montecarlo.utils.dispatch import make_integrate_plan

        n = 800_000
        r = MonteCarloIntegrator(backend="pallas", mesh=mesh8).integrate(
            [lambda x: x], Distribution.normal(0.0, 1.0),
            n_samples=n, return_stderr=True,
        )
        plan = make_integrate_plan(n, None, n_dev=8)
        probe = build_integrate_fn_pallas(
            (lambda x: x,), DistKind.NORMAL, plan, mesh=mesh8,
            interpret=True, with_stderr=True,
        )
        actual = probe.actual_samples
        assert actual >= n
        assert abs(r.stderr[0] - 1.0 / np.sqrt(actual)) < 0.2 / np.sqrt(actual)
        assert abs(r.values[0]) < 4 * r.stderr[0]

    def test_qmc_kernel_stderr(self):
        r = MonteCarloIntegrator(backend="pallas").integrate(
            [lambda x: x * x], Distribution.normal(0.0, 1.0),
            n_samples=300_000, method="qmc", return_stderr=True,
        )
        assert r.stderr[0] > 0
        assert abs(r.values[0] - 1.0) < 4 * r.stderr[0]

    @pytest.mark.parametrize("backend", ["pallas", "xla"])
    def test_param_batched_stderr_bit_equal(self, backend):
        # Parameter sweeps with per-rep error bars: each rep's pilot row
        # comes from its own distribution, and every element is
        # bit-equal to its unbatched error-bar call.
        from tpu_montecarlo import pack_param_batch

        dists = [
            Distribution.normal(0.0, 1.0),
            Distribution.normal(5.0, 3.0),
        ]
        fns = [lambda x: x, lambda x: x * x]
        it = MonteCarloIntegrator(backend=backend)
        prog = it.compile_integrate(
            fns, dists[0], n_samples=150_000, seed_batch=2,
            param_batch=True, return_stderr=True,
        )
        v, s = prog(np.array([7, 9], np.uint32), pack_param_batch(dists))
        v, s = np.asarray(v), np.asarray(s)
        for row, (seed, dd) in enumerate(zip((7, 9), dists)):
            r = it.integrate(
                fns, dd, n_samples=150_000, seed=seed, return_stderr=True
            )
            np.testing.assert_array_equal(v[row], np.float32(r.values))
            np.testing.assert_array_equal(s[row], np.float32(r.stderr))

    @pytest.mark.parametrize("backend", ["pallas", "xla"])
    def test_seed_batched_stderr_bit_equal(self, backend):
        # Serving handles return per-job error bars: each batch element
        # must be BIT-equal to its unbatched error-bar call (same
        # streams, same pilot — the distribution is shared).
        fns = [lambda x: x, lambda x: x * x]
        d = Distribution.exponential(0.8)
        it = MonteCarloIntegrator(backend=backend)
        prog = it.compile_integrate(
            fns, d, n_samples=150_000, seed_batch=3, return_stderr=True
        )
        v, s = prog(np.array([5, 6, 7], np.uint32))
        v, s = np.asarray(v), np.asarray(s)
        assert v.shape == (3, 2) and s.shape == (3, 2)
        for row, seed in enumerate((5, 6, 7)):
            r = it.integrate(
                fns, d, n_samples=150_000, seed=seed, return_stderr=True
            )
            np.testing.assert_array_equal(v[row], np.float32(r.values))
            np.testing.assert_array_equal(s[row], np.float32(r.stderr))

    def test_seed_batched_is_stderr(self):
        it = MonteCarloIntegrator(backend="pallas")
        prog = it.compile_importance_sampling(
            [lambda x: x > 4.0], Distribution.normal(0.0, 1.0),
            Distribution.normal(4.0, 1.0),
            n_samples=300_000, seed_batch=2, return_stderr=True,
        )
        v, s = prog([1, 2])
        v, s = np.asarray(v), np.asarray(s)
        truth = 3.1671e-05
        for row in range(2):
            assert abs(v[row, 0] - truth) < 4 * s[row, 0]

    def test_is_table_weight_stderr_in_kernel(self):
        # A non-traceable target PDF routes the in-kernel table-weight
        # path; error bars must now ride the SAME kernel (values
        # bit-equal to the plain kernel run — the value accumulators are
        # untouched) and agree with the XLA sweep's stderr.
        import warnings as _warnings

        def box_pdf(x):
            return float(int(abs(x) < 1.0)) * 0.5

        target = Distribution.from_pdf(box_pdf, support=(-1.0, 1.0))
        proposal = Distribution.uniform(-1.5, 1.5)
        fns = [lambda x: x * x, lambda x: x]
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")
            it = MonteCarloIntegrator(backend="pallas")
            r = it.integrate_importance_sampling(
                fns, target, proposal, n_samples=400_000, seed=7,
                return_stderr=True,
            )
            plain = it.integrate_importance_sampling(
                fns, target, proposal, n_samples=400_000, seed=7,
            )
        np.testing.assert_array_equal(
            np.float32(r.values), np.float32(plain.values)
        )
        r_x = MonteCarloIntegrator(backend="xla").integrate_importance_sampling(
            fns, target, proposal, n_samples=400_000, return_stderr=True,
        )
        np.testing.assert_allclose(r.stderr, r_x.stderr, rtol=0.15)
        assert abs(r.values[0] - 1 / 3) < 4 * r.stderr[0] + 2e-3

    def test_is_table_weight_stderr_seed_batched(self):
        def box_pdf(x):
            return float(int(abs(x) < 1.0)) * 0.5

        target = Distribution.from_pdf(box_pdf, support=(-1.0, 1.0))
        it = MonteCarloIntegrator(backend="pallas")
        prog = it.compile_importance_sampling(
            [lambda x: x * x], target, Distribution.uniform(-1.5, 1.5),
            n_samples=200_000, seed_batch=3, return_stderr=True,
        )
        v, s = (np.asarray(a) for a in prog([1, 2, 3]))
        assert v.shape == (3, 1) and s.shape == (3, 1)
        for row in range(3):
            assert abs(v[row, 0] - 1 / 3) < 4 * s[row, 0] + 2e-3
        # Each batch element must be bit-equal to its single-seed call.
        single = it.compile_importance_sampling(
            [lambda x: x * x], target, Distribution.uniform(-1.5, 1.5),
            n_samples=200_000, return_stderr=True,
        )
        v1, s1 = (np.asarray(a) for a in single(2))
        np.testing.assert_array_equal(v[1], np.float32(v1))
        np.testing.assert_array_equal(s[1], np.float32(s1))


class TestStderrRouting:

    def test_values_match_xla_backend(self):
        # The stderr program's estimates must equal the plain XLA
        # program's bit-for-bit (same streams, same accumulation of the
        # value sums).
        d = Distribution.normal(0.0, 1.0)
        r = integrate(
            [lambda x: x, lambda x: x * x], d, n_samples=300_000,
            seed=9, return_stderr=True,
        )
        plain = integrate(
            [lambda x: x, lambda x: x * x], d, n_samples=300_000,
            seed=9, backend="xla",
        )
        np.testing.assert_array_equal(
            np.float32(r.values), np.float32(plain.values)
        )

    def test_qmc_stderr_is_conservative(self):
        # Under QMC the iid formula is only a bound; the actual error is
        # far smaller.  Check it is finite, positive, and brackets truth.
        r = integrate(
            [lambda x: x * x], Distribution.normal(0.0, 1.0),
            n_samples=1_000_000, method="qmc", return_stderr=True,
        )
        assert r.stderr[0] > 0
        assert abs(r.values[0] - 1.0) < 4 * r.stderr[0]

    def test_sharded_stderr(self):
        r = MonteCarloIntegrator(mesh="auto").integrate(
            [lambda x: x], Distribution.normal(0.0, 1.0),
            n_samples=800_000, return_stderr=True,
        )
        n = 800_000
        assert abs(r.stderr[0] - 1.0 / np.sqrt(n)) < 0.2 / np.sqrt(n)


class TestSeedBatchedMcmcStderr:
    @pytest.mark.parametrize("backend", ["pallas", "xla"])
    def test_bit_equal_to_unbatched(self, backend):
        t = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        it = MonteCarloIntegrator(backend=backend)
        prog = it.compile_mcmc(
            [lambda x: x, lambda x: x * x], t, q,
            n_steps=300, n_chains=512, n_burnin=50,
            seed_batch=2, return_stderr=True,
        )
        v, a, s = prog(np.array([3, 4], np.uint32))
        v, a, s = np.asarray(v), np.asarray(a), np.asarray(s)
        assert v.shape == (2, 2) and a.shape == (2,) and s.shape == (2, 2)
        for row, seed in enumerate((3, 4)):
            r = it.integrate_mcmc(
                [lambda x: x, lambda x: x * x], t, q,
                n_steps=300, n_chains=512, n_burnin=50,
                seed=seed, return_stderr=True,
            )
            np.testing.assert_array_equal(v[row], np.float32(r.values))
            np.testing.assert_array_equal(s[row], np.float32(r.stderr))
            assert float(a[row]) == float(r.acceptance_rate)

    def test_param_batched_mcmc_stderr(self):
        # A posterior sweep with per-element error bars in one program:
        # each rep's in-kernel pilot comes from its own init draw.
        from tpu_montecarlo import pack_param_batch

        targets = [
            Distribution.normal(0.0, 1.0),
            Distribution.normal(2.0, 0.5),
        ]
        proposals = [
            Distribution.normal(0.0, 2.0),
            Distribution.normal(2.0, 1.0),
        ]
        it = MonteCarloIntegrator(backend="pallas")
        prog = it.compile_mcmc(
            [lambda x: x], targets[0], proposals[0],
            n_steps=300, n_chains=512, n_burnin=50,
            seed_batch=2, param_batch=True, return_stderr=True,
        )
        v, a, s = prog(
            np.array([3, 4], np.uint32),
            pack_param_batch(targets),
            pack_param_batch(proposals),
        )
        v, a, s = np.asarray(v), np.asarray(a), np.asarray(s)
        assert v.shape == (2, 1) and s.shape == (2, 1)
        assert abs(v[0, 0]) < 5 * s[0, 0]
        assert abs(v[1, 0] - 2.0) < 5 * s[1, 0]


class TestRandomizedQmcStderr:
    """method="qmc" + return_stderr: randomized-QMC error bars from
    independent rotations (one seed-batched dispatch), replacing the
    iid variance formula that neither tracks nor bounds a deterministic
    rotation's error."""

    def test_values_and_error_within_bars(self):
        # Smooth integrand: E[X^2] = 1 under N(0,1).  The rQMC composite
        # keeps QMC-rate accuracy and the spread must cover the error.
        r = integrate(
            [lambda x: x * x], Distribution.normal(0.0, 1.0),
            n_samples=1_000_000, seed=11, method="qmc",
            return_stderr=True,
        )
        assert r.stderr is not None and r.stderr.shape == (1,)
        assert r.stderr[0] > 0.0
        assert abs(r.values[0] - 1.0) < 6 * r.stderr[0]

    def test_qmc_bars_beat_mc_bars_on_smooth_integrand(self):
        # The whole point of QMC: at equal N the rotation spread is far
        # below the MC standard error for a smooth integrand.
        d = Distribution.uniform(0.0, 1.0)
        fn = [lambda x: np.exp(x)]
        n = 1_000_000
        rq = integrate(fn, d, n_samples=n, seed=3, method="qmc",
                       return_stderr=True)
        rm = integrate(fn, d, n_samples=n, seed=3, return_stderr=True)
        assert rq.stderr[0] < 0.2 * rm.stderr[0]
        assert abs(rq.values[0] - (np.e - 1.0)) < 1e-4

    def test_rotation_count_validation(self):
        with pytest.raises(ValueError, match="qmc_rotations"):
            integrate(
                [lambda x: x], Distribution.uniform(0.0, 1.0),
                method="qmc", return_stderr=True, qmc_rotations=1,
            )

    def test_importance_sampling_rqmc_bars(self):
        # Rare event P(X > 4) ~ 3.167e-5 via a shifted proposal.
        r = integrate_importance_sampling(
            [lambda x: x > 4.0],
            Distribution.normal(0.0, 1.0),
            Distribution.normal(4.0, 1.5),
            n_samples=400_000, seed=5, method="qmc", return_stderr=True,
        )
        p = 3.16712e-5
        assert abs(r.values[0] - p) < 6 * max(r.stderr[0], 1e-9)
        assert r.stderr[0] < 0.05 * p

    def test_custom_rotation_count(self):
        r = integrate(
            [lambda x: x], Distribution.uniform(0.0, 1.0),
            n_samples=200_000, seed=9, method="qmc",
            return_stderr=True, qmc_rotations=4,
        )
        assert abs(r.values[0] - 0.5) < 1e-3
        assert r.stderr[0] > 0.0
