"""Regression tests for the round-3 review fixes.

Covers: the batched-dispatch wrapper cache being keyed on the run object
itself (not a reusable ``id(run)``), unconditional user-CDF normalization
with matched pdf rescaling in ``from_pdf_table``, and the documented
kernel-path normal tail truncation.
"""

import gc

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_montecarlo import Distribution, MonteCarloIntegrator, integrate
from tpu_montecarlo import api


class TestBatchedWrapperCache:
    def test_wrapper_not_in_global_cache(self):
        """The seed-batched wrapper must live on the run object, never in
        the process-wide LRU under an id(run) key (an evicted entry's id
        can be reused by a different program, silently dispatching the
        wrong workload)."""
        it = MonteCarloIntegrator(backend="xla")
        prog = it.compile_integrate(
            [lambda x: x], Distribution.uniform(0.0, 1.0),
            n_samples=10_000, seed_batch=2,
        )
        out = np.asarray(prog(np.array([1, 2], np.uint32)))
        assert out.shape == (2, 1)
        assert not any(
            isinstance(k, tuple) and k and k[0] == "param_batch"
            for k in api._GLOBAL_CACHE._store
        )

    def test_survives_lru_eviction(self):
        """Fill a tiny LRU past its bound so the parent run is evicted
        and collected, then keep dispatching the original handle: it must
        keep computing ITS program (the failure mode being guarded
        against is a stale wrapper resolving to a different program)."""
        it = MonteCarloIntegrator(backend="xla")
        it._cache = api._ProgramCache(maxsize=2)
        d = Distribution.uniform(0.0, 2.0)
        prog_a = it.compile_integrate(
            [lambda x: x], d, n_samples=10_000, seed_batch=3
        )
        seeds = np.array([5, 6, 7], np.uint32)
        first = np.asarray(prog_a(seeds))
        # Churn the LRU with distinct programs (distinct plans).
        for n in (11_000, 12_000, 13_000, 14_000):
            it.compile_integrate(
                [lambda x: x * x], d, n_samples=n, seed_batch=3
            )(seeds)
        gc.collect()
        again = np.asarray(prog_a(seeds))
        np.testing.assert_array_equal(first, again)
        # Sanity: E[X] under U(0,2) is 1, not the churn programs' E[X^2].
        assert np.all(np.abs(again - 1.0) < 0.05)


class TestFromPdfTableNormalization:
    def test_near_one_cdf_is_normalized(self):
        # A final CDF value within the old 1e-3 tolerance used to be left
        # unnormalized, parking the residual mass as an atom at x_max.
        x = np.linspace(0.0, 1.0, 101)
        pdf = np.ones(101)
        cdf = x * 0.999
        d = Distribution.from_pdf_table(x, pdf, cdf)
        assert abs(float(d._cdf_table[-1]) - 1.0) < 1e-6

    def test_pdf_rescaled_with_cdf(self):
        # Normalizing the CDF by its final value must rescale the pdf
        # table (and the interpolating pdf closure) by the same factor,
        # so table-based IS weights and log-pdf tables see one scale.
        x = np.linspace(0.0, 1.0, 101)
        pdf = 2.0 * np.ones(101)
        cdf = 2.0 * x  # integrates to 2: both tables halve
        d = Distribution.from_pdf_table(x, pdf, cdf)
        assert abs(float(d._cdf_table[-1]) - 1.0) < 1e-6
        np.testing.assert_allclose(d._pdf_table, np.ones(101), rtol=1e-6)
        assert abs(d.pdf(0.5) - 1.0) < 1e-6

    def test_zero_mass_cdf_still_rejected(self):
        x = np.linspace(0.0, 1.0, 11)
        with pytest.raises(ValueError, match="zero"):
            Distribution.from_pdf_table(x, np.ones(11), np.zeros(11))


class TestNormalTailTruncation:
    def test_kernel_sampler_truncates_near_5_sigma(self):
        # The inverse-CDF transform clamps u to [1e-7, 1-1e-7]:
        # |z| <= sqrt(2) erfinv(1 - 2e-7) ~ 5.2 — the documented kernel
        # truncation (Distribution.normal / integrate docstrings).
        from tpu_montecarlo.sampling import normal_from_u01

        u = jnp.array([0.0, 1e-9, 0.5, 1.0 - 1e-7, 1.0], jnp.float32)
        z = np.asarray(normal_from_u01(u))
        assert np.all(np.isfinite(z))
        assert np.max(np.abs(z)) < 5.5
        assert np.max(np.abs(z)) > 5.0

    def test_kernel_path_hard_zero_beyond_clamp(self):
        # An indicator of the region beyond the clamp is EXACTLY zero on
        # the kernel path (the XLA path draws untruncated normals and is
        # merely astronomically-unlikely-nonzero) — the structural
        # divergence the docs point extreme-tail users to backend="xla"
        # for.
        r = integrate(
            [lambda x: x > 5.5], Distribution.normal(0.0, 1.0),
            n_samples=500_000, backend="pallas",
        )
        assert r.values[0] == 0.0


class TestMultiPassHighK:
    """K > 128 fused workloads chain multiple kernel passes over
    identical sample streams instead of falling off the ~500x XLA
    table-sampling cliff (reference any-K accumulators,
    src/shader_gen.rs:264-282)."""

    def test_k256_custom_table_matches_xla(self):
        import math

        d = Distribution.from_pdf(
            lambda x: math.exp(-0.5 * x * x), support=(-5.0, 5.0)
        )
        edges = np.linspace(-3.0, 3.0, 257)

        def make_bin(lo, hi):
            return lambda x: (x >= lo) & (x < hi)

        fns = [make_bin(edges[i], edges[i + 1]) for i in range(256)]
        r_p = MonteCarloIntegrator(backend="pallas").integrate(
            fns, d, n_samples=100_000, seed=3
        )
        r_x = MonteCarloIntegrator(backend="xla").integrate(
            fns, d, n_samples=100_000, seed=3
        )
        assert r_p.values.shape == (256,)
        assert abs(r_p.values.sum() - 1.0) < 0.02
        np.testing.assert_allclose(r_p.values, r_x.values, atol=5e-3)

    def test_passes_share_identical_samples(self):
        # The same integrand placed in BOTH passes must produce
        # bit-equal estimates: every pass re-generates the identical
        # counter-keyed sample stream.
        def f(x):
            return x * x

        fns = [f] * 129  # two passes: 65 + 64 functions
        r = MonteCarloIntegrator(backend="pallas").integrate(
            fns, Distribution.normal(0.0, 1.0), n_samples=100_000
        )
        assert r.values.shape == (129,)
        assert np.all(r.values == r.values[0])

    def test_multi_pass_qmc(self):
        def make_pow(j):
            return lambda x: x ** (j % 3)

        fns = [make_pow(j) for j in range(130)]
        r = MonteCarloIntegrator(backend="pallas").integrate(
            fns, Distribution.uniform(0.0, 1.0), n_samples=100_000,
            method="qmc",
        )
        # E[U^0]=1, E[U]=1/2, E[U^2]=1/3 cycling.
        np.testing.assert_allclose(
            r.values[:3], [1.0, 0.5, 1 / 3], atol=1e-3
        )
        np.testing.assert_allclose(r.values[0], r.values[129 // 3 * 3], atol=1e-6)

    def test_multi_pass_seed_batch_and_stderr(self):
        # K>128 multi-pass composes with seed batching and error bars:
        # (R, K) results, identical estimates for the same integrand in
        # different passes, and batched rows bit-equal to unbatched
        # error-bar runs.
        def f(x):
            return x * x

        fns = [f] * 130
        d = Distribution.normal(0.0, 1.0)
        it = MonteCarloIntegrator(backend="pallas")
        prog = it.compile_integrate(
            fns, d, n_samples=80_000, seed_batch=2, return_stderr=True
        )
        v, s = prog(np.array([4, 5], np.uint32))
        v, s = np.asarray(v), np.asarray(s)
        assert v.shape == (2, 130) and s.shape == (2, 130)
        assert np.all(v[0] == v[0, 0]) and np.all(s[1] == s[1, 0])
        r = it.integrate(
            fns, d, n_samples=80_000, seed=4, return_stderr=True
        )
        np.testing.assert_array_equal(v[0], np.float32(r.values))
        np.testing.assert_array_equal(s[0], np.float32(r.stderr))
