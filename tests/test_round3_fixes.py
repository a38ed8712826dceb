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
