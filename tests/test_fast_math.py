"""Polynomial trig kernels (ops/fast_math.py): accuracy, scoped
dispatch, and backend equivalence.

The Pallas kernels evaluate traced sin/cos/tan through single-split
Cody-Waite reductions + minimax polynomials (Mosaic's intrinsics cost
~6x at equal f32 accuracy over MC sample ranges); the XLA backend and
plain user calls keep the stock jnp intrinsics.  For calibration the
reference's device trig is WGSL sin/cos, which the WebGPU spec bounds
only by 2^-11 on [-pi, pi] — these tests assert error floors orders of
magnitude below that.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import tpu_montecarlo as mc
from tpu_montecarlo.ops import fast_math
from tpu_montecarlo.tracing import trace_function


class TestAccuracy:
    def _check(self, fast, ref, lo, hi, tol):
        x = np.linspace(lo, hi, 200_001, dtype=np.float32)
        got = np.asarray(fast(jnp.asarray(x))).astype(np.float64)
        want = ref(x.astype(np.float64))
        assert np.max(np.abs(got - want)) < tol

    def test_sin_small(self):
        self._check(fast_math.fast_sin, np.sin, -100.0, 100.0, 3e-7)

    def test_cos_small(self):
        self._check(fast_math.fast_cos, np.cos, -100.0, 100.0, 3e-7)

    def test_sin_large(self):
        # Single-split reduction stays f32-grade out to ~1.3e4.
        self._check(fast_math.fast_sin, np.sin, -1.3e4, 1.3e4, 1e-6)

    def test_cos_large(self):
        self._check(fast_math.fast_cos, np.cos, -1.3e4, 1.3e4, 1e-6)

    def test_tan_away_from_poles(self):
        # Compare where |cos| is not tiny (tan has no accuracy guarantee
        # near poles — for the intrinsic or for WGSL).
        x = np.linspace(-20.0, 20.0, 200_001, dtype=np.float32)
        x64 = x.astype(np.float64)
        keep = np.abs(np.cos(x64)) > 0.1
        got = np.asarray(fast_math.fast_tan(jnp.asarray(x))).astype(np.float64)
        rel = np.abs(got[keep] - np.tan(x64[keep])) / (
            1.0 + np.abs(np.tan(x64[keep]))
        )
        assert np.max(rel) < 5e-6

    def test_non_finite_propagates(self):
        bad = jnp.asarray([np.inf, -np.inf, np.nan], jnp.float32)
        assert not np.any(np.isfinite(np.asarray(fast_math.fast_sin(bad))))


class TestScopedDispatch:
    def test_traced_sin_is_intrinsic_outside_kernels(self):
        f = trace_function(lambda x: np.sin(x))
        x = jnp.linspace(-8.0, 8.0, 1001, dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(jnp.sin(x)))

    def test_kernelized_traced_sin_is_polynomial(self):
        f = fast_math.kernelize(trace_function(lambda x: np.sin(x)))
        x = jnp.linspace(-8.0, 8.0, 1001, dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(f(x)), np.asarray(fast_math.fast_sin(x))
        )

    def test_context_resets_after_call(self):
        f = fast_math.kernelize(trace_function(lambda x: np.cos(x)))
        x = jnp.linspace(0.0, 4.0, 101, dtype=jnp.float32)
        f(x)
        assert not fast_math.in_kernel()
        g = trace_function(lambda x: np.cos(x))
        np.testing.assert_array_equal(np.asarray(g(x)), np.asarray(jnp.cos(x)))

    def test_context_resets_on_error(self):
        def boom(x):
            raise RuntimeError("integrand failed")

        with pytest.raises(RuntimeError):
            fast_math.kernelize(boom)(jnp.float32(1.0))
        assert not fast_math.in_kernel()

    def test_wgsl_sin_dispatches_too(self):
        from tpu_montecarlo.wgsl_frontend import trace_wgsl_function

        src = "fn f(x: f32) -> f32 { return sin(x) * sin(x); }"
        f = fast_math.kernelize(trace_wgsl_function(src))
        x = jnp.linspace(-8.0, 8.0, 1001, dtype=jnp.float32)
        expect = fast_math.fast_sin(x) * fast_math.fast_sin(x)
        np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(expect))


class TestBackendEquivalence:
    """Pallas (polynomial trig) vs XLA (intrinsics): estimates agree to
    far below MC noise, on analytic and trig-heavy integrands."""

    @pytest.mark.parametrize("method", ["mc", "qmc"])
    def test_integrate_sin_cos(self, method):
        d = mc.Distribution.normal(0.5, 2.0)
        fns = [lambda x: np.sin(x), lambda x: np.cos(3.0 * x),
               lambda x: np.sin(x) ** 2]
        # Different backends draw independent streams, so agreement is
        # statistical (MC noise ~1/sqrt(N)), not bitwise; the poly-vs-
        # intrinsic delta under test is ~1e-7, far below this floor.
        rp = mc.integrate(fns, d, n_samples=1_000_000, seed=7,
                          backend="pallas", method=method)
        rx = mc.integrate(fns, d, n_samples=1_000_000, seed=7,
                          backend="xla", method=method)
        np.testing.assert_allclose(rp.values, rx.values, atol=1e-2)

    def test_mcmc_trig_integrand(self):
        target = mc.Distribution.normal(0.0, 1.0)
        prop = mc.Distribution.normal(0.0, 2.0)
        rp = mc.integrate_mcmc([lambda x: np.cos(x)], target, prop,
                               n_steps=400, n_chains=512, n_burnin=100,
                               seed=3, backend="pallas")
        # E[cos(X)] = exp(-1/2) for X ~ N(0,1)
        assert abs(rp.values[0] - np.exp(-0.5)) < 0.05

    def test_stderr_pilot_consistency(self):
        # Pilot evaluation and kernel body must use the SAME trig: the
        # stderr path stays finite/accurate with a trig integrand.
        d = mc.Distribution.normal(0.0, 1.0)
        r = mc.integrate([lambda x: np.sin(x) + 10.0], d,
                         n_samples=400_000, seed=11, backend="pallas",
                         return_stderr=True)
        assert abs(r.values[0] - 10.0) < 0.01
        assert 0.0 < r.stderr[0] < 0.01
