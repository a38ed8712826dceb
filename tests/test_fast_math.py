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

    def _check_rel(self, fast, ref, lo, hi, tol, n=100_001):
        x = np.linspace(lo, hi, n, dtype=np.float32)
        got = np.asarray(fast(jnp.asarray(x))).astype(np.float64)
        want = ref(x.astype(np.float64))
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-6)
        assert np.max(rel) < tol

    def test_atan(self):
        self._check(fast_math.fast_atan, np.arctan, -50.0, 50.0, 3e-7)

    def test_asin_acos(self):
        self._check(fast_math.fast_asin, np.arcsin, -1.0, 1.0, 1e-6)
        self._check(fast_math.fast_acos, np.arccos, -1.0, 1.0, 1e-6)

    def test_atan2_quadrants_and_edges(self):
        ys = np.array([1.0, -1.0, 0.0, -0.0, 3.0, -3.0, np.inf, -np.inf,
                       0.0, -0.0, 1e-30, 2.0], np.float32)
        xs = np.array([1.0, 1.0, -1.0, -1.0, -2.0, -2.0, np.inf, -np.inf,
                       0.0, -0.0, -1.0, 0.0], np.float32)
        got = np.asarray(fast_math.fast_atan2(jnp.asarray(ys), jnp.asarray(xs)))
        want = np.arctan2(ys.astype(np.float64), xs.astype(np.float64))
        np.testing.assert_allclose(got, want, atol=3e-7)
        # signed-zero results keep their sign bit
        assert np.signbit(np.asarray(
            fast_math.fast_atan2(jnp.float32(-0.0), jnp.float32(1.0))))

    def test_hyperbolics(self):
        self._check_rel(fast_math.fast_sinh, np.sinh, -8.0, 8.0, 1e-6)
        self._check_rel(fast_math.fast_sinh, np.sinh, -1e-3, 1e-3, 1e-6)
        self._check_rel(fast_math.fast_cosh, np.cosh, -8.0, 8.0, 1e-6)
        self._check_rel(fast_math.fast_asinh, np.arcsinh, -50.0, 50.0, 1e-6)
        self._check_rel(fast_math.fast_asinh, np.arcsinh, -1e-3, 1e-3, 1e-6)
        x = np.linspace(1.0, 50.0, 100_001, dtype=np.float32)
        got = np.asarray(fast_math.fast_acosh(jnp.asarray(x))).astype(np.float64)
        np.testing.assert_allclose(got, np.arccosh(x.astype(np.float64)),
                                   atol=2e-7, rtol=1e-6)
        self._check(fast_math.fast_atanh, np.arctanh, -0.999, 0.999, 5e-6)

    def test_expm1(self):
        self._check_rel(fast_math.fast_expm1, np.expm1, -0.49, 0.49, 3e-7)
        self._check_rel(fast_math.fast_expm1, np.expm1, -20.0, 20.0, 2e-6)

    def test_cbrt(self):
        self._check_rel(fast_math.fast_cbrt, np.cbrt, -100.0, 100.0, 1e-6)
        assert float(fast_math.fast_cbrt(jnp.float32(0.0))) == 0.0
        assert float(fast_math.fast_cbrt(jnp.float32(-8.0))) == pytest.approx(
            -2.0, rel=1e-6
        )

    def test_copysign_bits(self):
        xs = np.array([1.5, -2.5, 0.0, -0.0, np.inf], np.float32)
        ys = np.array([-0.0, 0.0, -3.0, 4.0, -1.0], np.float32)
        got = np.asarray(fast_math.fast_copysign(jnp.asarray(xs), jnp.asarray(ys)))
        np.testing.assert_array_equal(got, np.copysign(xs, ys))
        np.testing.assert_array_equal(np.signbit(got), np.signbit(np.copysign(xs, ys)))


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


class TestKernelLowering:
    """EVERY traceable math name must lower inside a Pallas TPU kernel
    (cross-platform lowering from the CPU test host — no chip needed).
    Without the fast_math dispatch, asin/acos/atan/atan2/sinh/cosh/
    asinh/acosh/atanh/expm1/cbrt raise Mosaic NotImplementedError and
    copysign trips a verifier bug; all are WGSL builtins the reference
    compiles (transpiler.py:82-112), so a kernel-path crash would be a
    silent coverage regression."""

    # One representative integrand per traceable name, argument-ranged
    # to stay in-domain for x ~ N(0, 1).
    EXPRS = {
        "abs": lambda x: np.abs(x),
        "sin": lambda x: np.sin(x),
        "cos": lambda x: np.cos(x),
        "tan": lambda x: np.tan(x * 0.4),
        "asin": lambda x: np.arcsin(np.clip(x, -0.9, 0.9)),
        "acos": lambda x: np.arccos(np.clip(x, -0.9, 0.9)),
        "atan": lambda x: np.arctan(x),
        "atan2": lambda x: np.arctan2(x, 1.0 + x * x),
        "sinh": lambda x: np.sinh(np.clip(x, -4.0, 4.0)),
        "cosh": lambda x: np.cosh(np.clip(x, -4.0, 4.0)),
        "tanh": lambda x: np.tanh(x),
        "asinh": lambda x: np.arcsinh(x),
        "acosh": lambda x: np.arccosh(1.0 + np.abs(x)),
        "atanh": lambda x: np.arctanh(np.clip(x, -0.9, 0.9)),
        "sqrt": lambda x: np.sqrt(np.abs(x)),
        "cbrt": lambda x: np.cbrt(x),
        "exp": lambda x: np.exp(-x * x),
        "exp2": lambda x: np.exp2(np.clip(x, -10.0, 10.0)),
        "expm1": lambda x: np.expm1(np.clip(x, -4.0, 4.0)),
        "log": lambda x: np.log(np.abs(x) + 0.1),
        "log2": lambda x: np.log2(np.abs(x) + 0.1),
        "log10": lambda x: np.log10(np.abs(x) + 0.1),
        "log1p": lambda x: np.log1p(np.abs(x)),
        "floor": lambda x: np.floor(x),
        "ceil": lambda x: np.ceil(x),
        "round": lambda x: np.round(x),
        "trunc": lambda x: np.trunc(x),
        "sign": lambda x: np.sign(x),
        "copysign": lambda x: np.copysign(1.0 + x * x, x),
        "fmod": lambda x: np.fmod(x, 0.75),
        "hypot": lambda x: np.hypot(x, 1.0 - x),
        "degrees": lambda x: np.degrees(x),
        "radians": lambda x: np.radians(x),
        "minimum": lambda x: np.minimum(x, 0.25),
        "maximum": lambda x: np.maximum(x, -0.25),
        "clip": lambda x: np.clip(x, -1.0, 1.0),
        "power": lambda x: np.power(np.abs(x) + 0.1, 2.5),
        "heaviside": lambda x: np.heaviside(x, 0.5),
        "square": lambda x: np.square(x),
        "where": lambda x: np.where(x > 0.0, x, -2.0 * x),
    }

    @pytest.mark.parametrize("name", sorted(EXPRS))
    def test_lowers_for_tpu(self, name):
        import jax
        from jax.experimental import pallas as pl

        f = fast_math.kernelize(trace_function(self.EXPRS[name]))

        def kern(x_ref, o_ref):
            o_ref[:, :] = f(x_ref[:, :]).astype(jnp.float32)

        def run(x):
            return pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
            )(x)

        x = jnp.zeros((8, 128), jnp.float32)
        jax.jit(run).trace(x).lower(lowering_platforms=("tpu",))

    @pytest.mark.parametrize(
        "name",
        ["asin", "atan", "atan2", "sinh", "cosh", "asinh", "acosh",
         "atanh", "expm1", "cbrt"],
    )
    def test_interpret_matches_intrinsic(self, name):
        """Kernel-path value == intrinsic value to f32-poly accuracy on
        the same inputs (dispatch changes the implementation, not the
        function)."""
        f = self.EXPRS[name]
        traced = trace_function(f)
        x = jnp.asarray(
            np.linspace(-3.0, 3.0, 4097, dtype=np.float32)
        )
        got = np.asarray(fast_math.kernelize(traced)(x))
        want = np.asarray(traced(x))
        np.testing.assert_allclose(got, want, atol=5e-6, rtol=5e-6)


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
