"""Regression tests for defects found in the round-1 code review."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_montecarlo import Distribution, MonteCarloIntegrator, trace_wgsl_function


class TestFingerprintCollisions:
    def test_distinct_array_captures_not_conflated(self, integrator):
        """Direct-traced closures over different arrays must not share a
        compiled-program cache entry."""

        def make(a):
            return lambda x: x + a[0]

        f1 = make(jnp.asarray([100.0]))
        f2 = make(jnp.asarray([200.0]))
        d = Distribution.uniform(0.0, 1.0)
        r1 = integrator.integrate([f1], d, n_samples=10_000)
        r2 = integrator.integrate([f2], d, n_samples=10_000)
        assert abs(r1.values[0] - 100.5) < 0.1
        assert abs(r2.values[0] - 200.5) < 0.1

    def test_identical_array_captures_still_cached(self):
        from tpu_montecarlo.tracing import function_fingerprint

        def make(a):
            return lambda x: x + a[0]

        a = np.asarray([3.0])
        fp1 = function_fingerprint(make(a))
        fp2 = function_fingerprint(make(a.copy()))
        assert fp1 is not None and fp1 == fp2

    def test_unfingerprintable_capture_returns_none(self):
        from tpu_montecarlo.tracing import function_fingerprint

        class Weird:
            def __getitem__(self, i):
                return 1.0

        w = Weird()
        fp = function_fingerprint(lambda x: x + w[0])
        assert fp is None


class TestResumeFreshStreams:
    def test_resumed_segment_draws_new_proposals(self, integrator):
        """With q == p every proposal is accepted, so the chain state IS the
        proposal stream; a resumed same-seed segment must not replay it."""
        d = Distribution.normal(0.0, 1.0)
        r1 = integrator.integrate_mcmc(
            [lambda x: x], d, d,
            n_steps=100, n_chains=256, n_burnin=0,
            seed=5, return_state=True,
        )
        r2 = integrator.integrate_mcmc(
            [lambda x: x], d, d,
            n_steps=100, n_chains=256, n_burnin=0,
            seed=5, initial_state=r1.chain_state, return_state=True,
        )
        assert r2.chain_state.segment == 1
        # Replayed streams would reproduce the exact same final state.
        assert not np.array_equal(r1.chain_state.x, r2.chain_state.x)
        assert not np.allclose(r1.values, r2.values)


class TestChainPlanDivisibility:
    @pytest.mark.parametrize("n_dev", [1, 2, 3, 5, 7, 8])
    def test_plan_divides_any_device_count(self, n_dev):
        from tpu_montecarlo.ops.mcmc_xla import plan_chains

        total = plan_chains(256, None, n_dev)
        assert total % n_dev == 0
        assert total % 256 == 0
        assert total >= 256


class TestWgslTruncMod:
    def test_mod_negative_dividend(self):
        f = trace_wgsl_function("fn f(x: f32) -> f32 { return x % 2.0; }")
        assert float(f(np.float32(-3.0))) == pytest.approx(-1.0)
        assert float(f(np.float32(3.0))) == pytest.approx(1.0)

    def test_compound_mod(self):
        src = """
        fn f(x: f32) -> f32 {
            var v: f32 = x;
            v %= 2.0;
            return v;
        }
        """
        f = trace_wgsl_function(src)
        assert float(f(np.float32(-3.0))) == pytest.approx(-1.0)

    def test_python_mod_stays_floor(self, integrator):
        # The Python front-end deliberately keeps Python semantics.
        from tpu_montecarlo import trace_function

        g = trace_function(lambda x: x % 2.0)
        assert float(g(np.float32(-3.0))) == pytest.approx(1.0)


class TestUniformBoundary:
    def test_extreme_offset_uniform_is_weights_finite(self, integrator):
        """f32 rounding of min + u*(max-min) must never land on the
        half-open max where q = 0 (IS would produce inf/NaN)."""
        d = Distribution.uniform(1e8, 1e8 + 16)
        r = integrator.integrate_importance_sampling(
            [lambda x: 1.0], d, d, n_samples=200_000
        )
        assert np.isfinite(r.values[0])
        assert abs(r.values[0] - 1.0) < 1e-3

    def test_sampler_never_emits_max(self):
        from tpu_montecarlo.sampling import DistKind, sample_block
        import jax

        params = jnp.asarray([1e8, 1e8 + 16], jnp.float32)
        x = sample_block(
            jax.random.PRNGKey(0), (200_000,), DistKind.UNIFORM, params
        )
        assert float(jnp.max(x)) < 1e8 + 16


class TestForcedBackendErrors:
    def test_unknown_backend_still_rejected(self):
        with pytest.raises(ValueError):
            MonteCarloIntegrator(backend="wgsl")


class TestZeroDensitySpans:
    """Distributions whose pdf is exactly zero on interior spans must
    sample through the exact inverse CDF: the fast uniform-u table would
    interpolate across the CDF jump and emit impossible samples
    (absorbing-state MCMC bias / inf IS weights)."""

    @staticmethod
    def _gapped():
        x = np.linspace(0.0, 1.0, 2048)
        p = np.where((x > 0.4) & (x < 0.6), 0.0, 1.0)
        return Distribution.from_pdf_table(x, p)

    def test_detected_as_exact_inverse(self):
        from tpu_montecarlo.sampling import dist_spec_of

        spec = dist_spec_of(self._gapped())
        assert spec.exact_inverse

    def test_smooth_beta_keeps_fast_path(self):
        from tpu_montecarlo.sampling import dist_spec_of

        spec = dist_spec_of(Distribution.beta(2.0, 5.0))
        assert not spec.exact_inverse

    def test_sampler_avoids_gap(self):
        import jax
        import jax.numpy as jnp
        from tpu_montecarlo.sampling import DistKind, dist_spec_of, sample_block

        spec = dist_spec_of(self._gapped())
        x = np.asarray(
            sample_block(
                jax.random.PRNGKey(0), (200_000,), DistKind.CUSTOM,
                jnp.asarray(spec.params), jnp.asarray(spec.x_table),
                jnp.asarray(spec.cdf_table), exact_inverse=True,
            )
        )
        in_gap = np.sum((x > 0.41) & (x < 0.59))
        assert in_gap == 0

    def test_is_estimate_finite(self, integrator):
        # The proposal's weight table is the TRUE (normalized) sampling
        # density since the from_pdf_table rescale fix, so a proposal
        # that cannot reach the gap (0.4, 0.6) yields the
        # support-restricted integral 0.4, not the full E[X] = 0.5 (the
        # old 0.5 was an unnormalized-weight bias coincidentally
        # standing in for the unreachable gap mass) — see
        # test_gapped_pallas.py::test_is_gapped_proposal.
        proposal = self._gapped()
        target = Distribution.uniform(0.0, 1.0)
        r = integrator.integrate_importance_sampling(
            [lambda x: x], target, proposal, n_samples=200_000
        )
        assert np.isfinite(r.values[0])
        assert abs(r.values[0] - 0.4) < 0.02

    def test_mcmc_not_absorbed_in_gap(self, integrator):
        proposal = self._gapped()
        target = Distribution.uniform(0.0, 1.0)
        r = integrator.integrate_mcmc(
            [lambda x: x], target, proposal,
            n_steps=3000, n_chains=256, n_burnin=200,
        )
        # With absorbing gap states this read ~0.63.
        assert abs(r.values[0] - 0.5) < 0.03
