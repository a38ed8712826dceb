"""Tracing front-end tests — the analog of the reference's transpiler suite
(reference: tests/test_transpiler.py, 723 LoC of WGSL string assertions).

Where the reference asserts generated WGSL substrings, we assert the traced
function's *numerics* (the traced callable must agree with the Python
original on concrete inputs) plus the same error-routing behaviour: the
constructs that raised TranspilerError there raise TraceError here.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_montecarlo import TraceError, is_traceable, trace_function

# module-level constants for capture tests
GLOBAL_SCALE = 2.5
GLOBAL_FLAG = True
GLOBAL_LIST = [1, 2, 3]
GLOBAL_DICT = {"a": 1}


def assert_traced_matches(func, pts, ref=None, tol=None):
    traced = trace_function(func)
    ref = ref or func
    for p in pts:
        expected = float(ref(p))
        got = float(traced(jnp.float32(p)))
        # float32 device math vs float64 Python math
        approx = (
            pytest.approx(expected, abs=tol)
            if tol is not None
            else pytest.approx(expected, rel=2e-4, abs=2e-5)
        )
        assert got == approx, f"at x={p}"


class TestBasicExpressions:
    def test_identity(self):
        assert_traced_matches(lambda x: x, [0.0, 1.5, -2.0])

    def test_arithmetic(self):
        assert_traced_matches(lambda x: x * 2.0 + 3.0 - x / 4.0, [0.0, 1.0, -3.5])

    def test_power(self):
        assert_traced_matches(lambda x: x**2, [0.0, 2.0, -3.0])
        assert_traced_matches(lambda x: x**3 + x**0.5, [1.0, 4.0])

    def test_modulo_python_semantics(self):
        # Python floor-mod (deliberate deviation from WGSL trunc-mod).
        assert_traced_matches(lambda x: x % 3.0, [7.5, -7.5, 2.0])

    def test_unary(self):
        assert_traced_matches(lambda x: -x + (+x) * 2.0, [1.0, -2.0])

    def test_nested_parens(self):
        assert_traced_matches(lambda x: ((x + 1.0) * (x - 1.0)) / (x * x + 1.0), [0.5, 3.0])


class TestComparisonsAndBooleans:
    def test_bool_result_becomes_float(self):
        traced = trace_function(lambda x: x > 1.0)
        assert float(traced(2.0)) == 1.0
        assert float(traced(0.5)) == 0.0
        assert traced(2.0).dtype == jnp.float32

    def test_ternary(self):
        assert_traced_matches(lambda x: 1.0 if x > 0 else -1.0, [0.5, -0.5])

    def test_and_or(self):
        f = lambda x: 1.0 if (0.0 <= x) and (x < 2.0) else 0.0
        assert_traced_matches(f, [-1.0, 0.0, 1.0, 2.0, 3.0])
        g = lambda x: 1.0 if (x < 0.0) or (x > 1.0) else 0.0
        assert_traced_matches(g, [-1.0, 0.5, 2.0])

    def test_chained_comparison(self):
        # Capability superset: the reference transpiler rejected chains.
        assert_traced_matches(lambda x: 1.0 if 0.0 < x < 1.0 else 0.0,
                              [-0.5, 0.5, 1.5])

    def test_not(self):
        assert_traced_matches(lambda x: 1.0 if not (x > 0) else 0.0, [1.0, -1.0])

    def test_all_comparison_ops(self):
        for f in [
            lambda x: x > 1.0,
            lambda x: x < 1.0,
            lambda x: x >= 1.0,
            lambda x: x <= 1.0,
            lambda x: x == 1.0,
            lambda x: x != 1.0,
        ]:
            traced = trace_function(f)
            for p in [0.0, 1.0, 2.0]:
                assert float(traced(p)) == float(f(p))


class TestMathFunctions:
    def test_math_module(self):
        assert_traced_matches(lambda x: math.exp(x), [0.0, 1.0, -1.0])
        assert_traced_matches(lambda x: math.sqrt(x + 4.0), [0.0, 5.0])
        assert_traced_matches(lambda x: math.sin(x) + math.cos(x), [0.0, 1.0])
        assert_traced_matches(lambda x: math.log(x + 2.0), [0.0, 1.0])
        assert_traced_matches(lambda x: math.tanh(x), [0.0, 2.0])
        assert_traced_matches(lambda x: math.floor(x) + math.ceil(x), [1.3, -2.7])
        assert_traced_matches(lambda x: math.atan2(x, 2.0), [1.0, -1.0])
        assert_traced_matches(lambda x: math.pow(x, 3.0), [2.0])

    def test_numpy_module(self):
        assert_traced_matches(lambda x: np.exp(x) * np.sqrt(x + 4.0), [0.0, 1.0])
        assert_traced_matches(lambda x: np.abs(x) + np.sign(x), [2.0, -2.0])

    def test_builtins(self):
        assert_traced_matches(lambda x: abs(x), [-3.0, 3.0])
        assert_traced_matches(lambda x: min(x, 2.0), [1.0, 3.0])
        assert_traced_matches(lambda x: max(x, 0.0) + pow(x, 2.0), [1.5, -1.0])
        assert_traced_matches(lambda x: min(x, 2.0, 1.0), [0.5, 3.0])

    def test_from_import(self):
        from math import exp, pi

        def f(x):
            return exp(-x) / pi

        assert_traced_matches(f, [0.0, 1.0])

    def test_import_idiom(self):
        f = lambda x: __import__("math").exp(x)
        assert_traced_matches(f, [0.0, 1.0])


class TestConstants:
    def test_math_constants(self):
        assert_traced_matches(lambda x: x * math.pi, [1.0], tol=1e-4)
        assert_traced_matches(lambda x: x + math.e, [0.0], tol=1e-4)
        assert_traced_matches(lambda x: x * math.tau, [1.0], tol=1e-4)

    def test_numpy_constants(self):
        assert_traced_matches(lambda x: x * np.pi, [2.0], tol=1e-4)
        assert_traced_matches(lambda x: x + np.euler_gamma, [0.0], tol=1e-4)

    def test_inf(self):
        traced = trace_function(lambda x: x < math.inf)
        assert float(traced(1e30)) == 1.0


class TestExternalCapture:
    def test_global_float(self):
        assert_traced_matches(lambda x: x * GLOBAL_SCALE, [2.0])

    def test_global_bool_as_float(self):
        traced = trace_function(lambda x: x + GLOBAL_FLAG)
        assert float(traced(1.0)) == 2.0

    def test_closure_capture(self):
        a, b = 1.5, -0.5

        def make(c):
            return lambda x: a * x + b + c

        assert_traced_matches(make(2.0), [0.0, 1.0])

    def test_closure_int(self):
        n = 3
        assert_traced_matches(lambda x: x * n, [2.0])

    def test_numpy_scalar_capture(self):
        c = np.float64(0.25)
        assert_traced_matches(lambda x: x + c, [1.0])

    def test_unsupported_list_global_via_ast(self):
        # The AST tier rejects list captures; indexing also fails the
        # direct tier when the index is traced.
        def f(x):
            return GLOBAL_LIST[0] * x  # direct tier handles concrete index

        # concrete index works through the direct tier (superset)
        assert is_traceable(f)

    def test_unsupported_dict_usage(self):
        def f(x):
            return GLOBAL_DICT[x]

        assert not is_traceable(f)


class TestStatements:
    def test_if_else_return(self):
        def f(x):
            if x > 0:
                return x * 2.0
            else:
                return -x

        assert_traced_matches(f, [3.0, -3.0, 0.0])

    def test_if_without_else(self):
        def f(x):
            if x > 1.0:
                return 1.0
            return x

        assert_traced_matches(f, [0.5, 2.0])

    def test_if_assignment_merge(self):
        def f(x):
            y = 0.0
            if x > 0:
                y = x * 2.0
            else:
                y = -x
            return y + 1.0

        assert_traced_matches(f, [2.0, -2.0])

    def test_elif_chain(self):
        def f(x):
            if x < 0:
                return -1.0
            elif x < 1:
                return 0.0
            else:
                return 1.0

        assert_traced_matches(f, [-0.5, 0.5, 1.5])

    def test_local_variables(self):
        def f(x):
            a = x * 2.0
            b = a + 1.0
            a = b * b
            return a - x

        assert_traced_matches(f, [0.0, 1.5])

    def test_augmented_assign(self):
        def f(x):
            y = x
            y += 2.0
            y *= 3.0
            return y

        assert_traced_matches(f, [1.0])

    def test_while_loop(self):
        def f(x):
            s = 0.0
            while s < x:
                s = s + 1.0
            return s

        assert_traced_matches(f, [0.0, 3.5, 7.0])

    def test_while_vectorizes(self):
        def f(x):
            s = x
            while s > 1.0:
                s = s * 0.5
            return s

        traced = trace_function(f)
        out = jax.vmap(traced)(jnp.array([8.0, 0.5, 3.0], jnp.float32))
        np.testing.assert_allclose(np.asarray(out), [1.0, 0.5, 0.75])

    def test_docstring_ignored(self):
        def f(x):
            """Doc."""
            return x

        assert_traced_matches(f, [1.0])


class TestReturnInLoops:
    """``return`` inside while bodies — the reference transpiler emits a
    WGSL ``return`` there (transpiler.py:561-567 via _visit_while:626-637),
    so it is live user surface; here it lowers to a first-return-wins mask
    carried through ``lax.while_loop``."""

    def test_return_from_while(self):
        def f(x):
            while x < 10.0:
                if x > 5.0:
                    return x
                x = x * 2.0
            return x

        assert_traced_matches(f, [1.0, 3.0, 6.0, 20.0])

    def test_loop_return_vs_trailing_return(self):
        def f(x):
            i = 0.0
            while i < 100.0:
                i = i + 1.0
                if i * i > x:
                    return i
            return -1.0

        assert_traced_matches(f, [0.5, 10.0, 90.0, 1.0e6])

    def test_statements_after_loop_return_are_skipped(self):
        def f(x):
            s = 0.0
            i = 0.0
            while i < 5.0:
                i = i + 1.0
                if i > x:
                    return s
                s = s + 100.0
            return s + 1.0

        assert_traced_matches(f, [0.0, 2.5, 99.0])

    def test_loop_return_inside_if_branch(self):
        def f(x):
            if x > 0.0:
                while x < 8.0:
                    if x > 3.0:
                        return x * 10.0
                    x = x + 1.0
            return -x

        assert_traced_matches(f, [1.0, 5.0, -2.0, 9.0])

    def test_nested_loops_inner_return_exits_function(self):
        def f(x):
            i = 0.0
            while i < 3.0:
                j = 0.0
                while j < 3.0:
                    if i + j > x:
                        return i * 10.0 + j
                    j = j + 1.0
                i = i + 1.0
            return -1.0

        assert_traced_matches(f, [0.5, 2.5, 3.5, 99.0])

    def test_sequential_loops_first_return_wins(self):
        def f(x):
            i = 0.0
            while i < 3.0:
                if x < 1.0:
                    return 111.0
                i = i + 1.0
            j = 0.0
            while j < 3.0:
                if x < 2.0:
                    return 222.0
                j = j + 1.0
            return 333.0

        assert_traced_matches(f, [0.5, 1.5, 2.5])

    def test_loop_return_vectorizes(self):
        def f(x):
            i = 0.0
            while i < 100.0:
                i = i + 1.0
                if i * i > x:
                    return i
            return -1.0

        traced = trace_function(f)
        xs = jnp.array([0.5, 10.0, 90.0, 1.0e6], jnp.float32)
        out = jax.vmap(traced)(xs)
        np.testing.assert_allclose(np.asarray(out), [1.0, 4.0, 10.0, -1.0])

    def test_return_free_loop_after_returning_loop_terminates(self):
        # Regression: a return-free loop AFTER a maybe-returning loop must
        # also stop on returned lanes — its condition can depend on
        # variables the returned lanes froze (here n stays 0.0, so the
        # second loop would spin forever without the mask conjunction).
        def f(x):
            n = 0.0
            while n < 3.0:
                if x > 0.0:
                    return 7.0
                n = n + 1.0
            m = 0.0
            while m < 9.0:
                m = m + n
            return m

        assert_traced_matches(f, [1.0, -1.0])
        traced = trace_function(f)
        out = jax.vmap(traced)(jnp.array([1.0, -1.0], jnp.float32))
        np.testing.assert_allclose(np.asarray(out), [7.0, 9.0])

    def test_partial_return_in_nested_if_branch(self):
        # `if c: return a` as the LAST statement of an if-branch, with the
        # function returning later: the direct evaluation cannot express a
        # maybe-return, so the body re-lowers through the return mask
        # (reference emits this WGSL shape verbatim, transpiler.py:601-620).
        def f(x):
            if x > 0.0:
                if x > 2.0:
                    return 100.0
            s = x * 3.0
            return s

        assert_traced_matches(f, [-1.0, 1.0, 5.0])

    def test_partial_return_with_else_and_loop(self):
        def f(x):
            if x > 0.0:
                while x < 4.0:
                    x = x + 1.0
                if x > 5.0:
                    return x * 10.0
            else:
                return -x
            return x

        assert_traced_matches(f, [-3.0, 1.0, 7.0])

    def test_missing_static_return_still_rejected(self):
        # Only loop-internal returns: no statically-guaranteed return, which
        # the reference's WGSL compiler also rejects (missing return).
        def f(x):
            while x < 10.0:
                return x

        with pytest.raises(TraceError):
            trace_function(f)(np.float32(1.0))


class TestMultipleLambdas:
    def test_two_lambdas_one_line(self):
        fs = [lambda x: x, lambda x: x**2]
        t0, t1 = trace_function(fs[0]), trace_function(fs[1])
        assert float(t0(3.0)) == 3.0
        assert float(t1(3.0)) == 9.0

    def test_three_lambdas_one_line(self):
        fs = [lambda x: x + 1.0, lambda x: x + 2.0, lambda x: x + 3.0]
        for i, f in enumerate(fs):
            assert float(trace_function(f)(0.0)) == i + 1.0


class TestUserHelpers:
    def test_helper_function_call(self):
        def helper(y):
            return y * y

        def f(x):
            return helper(x) + 1.0

        assert_traced_matches(f, [3.0])

    def test_nested_helpers(self):
        def inner(y):
            return y + 1.0

        def mid(y):
            return inner(y) * 2.0

        def f(x):
            return mid(x) - 1.0

        assert_traced_matches(f, [1.0])


class TestErrors:
    """Constructs that must raise TraceError — these drive the
    importance-sampling table-fallback routing."""

    def test_int_cast(self):
        def f(x):
            return float(int(x) % 2) * 0.5 + 0.1

        with pytest.raises(TraceError):
            trace_function(f)

    def test_float_int_combination(self):
        def f(x):
            return float(int(x * 2) % 3) * 0.3 + 0.1

        with pytest.raises(TraceError):
            trace_function(f)

    def test_unknown_module(self):
        import time

        def f(x):
            return time.sleep(x)

        with pytest.raises(TraceError):
            trace_function(f)

    def test_unknown_module_concrete_result_is_superset(self):
        # A call returning a concrete value traces via the direct tier.
        import os

        def f(x):
            return os.getpid() * 0.0 + x

        assert is_traceable(f)

    def test_non_callable(self):
        with pytest.raises(TypeError):
            trace_function(42)

    def test_str_concat(self):
        def f(x):
            return "a" + str(x)

        with pytest.raises(TraceError):
            trace_function(f)

    def test_non_scalar_output(self):
        def f(x):
            return jnp.stack([x, x])

        with pytest.raises(TraceError):
            trace_function(f)

    def test_is_traceable_probe(self):
        assert is_traceable(lambda x: x * 2.0)
        assert not is_traceable(lambda x: float(int(x)))


class TestJaxNativeFunctions:
    """Direct-trace tier: functions already written in jax.numpy."""

    def test_jnp_function(self):
        traced = trace_function(lambda x: jnp.tanh(x) * 2.0)
        assert float(traced(1.0)) == pytest.approx(2.0 * math.tanh(1.0), abs=1e-5)

    def test_already_traced_passthrough(self):
        t1 = trace_function(lambda x: x)
        t2 = trace_function(t1)
        assert t1 is t2


class TestJitAndVmap:
    def test_traced_functions_jit(self):
        traced = trace_function(lambda x: math.exp(-0.5 * x * x))
        jitted = jax.jit(jax.vmap(traced))
        xs = jnp.linspace(-2, 2, 16)
        expected = np.exp(-0.5 * np.asarray(xs) ** 2)
        np.testing.assert_allclose(np.asarray(jitted(xs)), expected, rtol=1e-5)

    def test_grad_through_traced(self):
        # Bonus capability the reference cannot offer: differentiation.
        traced = trace_function(lambda x: x**3)
        g = jax.grad(lambda x: traced(x))(2.0)
        assert float(g) == pytest.approx(12.0, abs=1e-4)


SCALE_NEG_G = -2.5
SCI_G = 1.5e-3
import math as _mma_alias  # file-level aliased import (reference :346-362)


class TestReferenceParityGaps:
    """Cases mirroring reference test_transpiler.py entries that the main
    matrix above did not name explicitly."""

    def test_empty_return_rejected(self):
        # Reference emits a bare `return;` into an f32-returning WGSL
        # function (test_transpiler.py:114-123) — invalid at shader
        # compile; here the equivalent failure surfaces at trace time.
        def step(x):
            return

        with pytest.raises(TraceError):
            trace_function(step)

    def test_local_variable_shadowing(self):
        def f(x):
            y = 3.0
            y = y + x
            return y

        assert trace_function(f)(2.0) == pytest.approx(5.0)

    def test_file_level_import_as(self):
        def f(x):
            return _mma_alias.sqrt(x * x + 1.0)

        assert trace_function(f)(1.0) == pytest.approx(math.sqrt(2.0))

    def test_global_variable_negative(self):
        assert trace_function(lambda x: x * SCALE_NEG_G)(2.0) == pytest.approx(
            -5.0
        )

    def test_global_variable_scientific_notation(self):
        assert trace_function(lambda x: x + SCI_G)(1.0) == pytest.approx(
            1.0015
        )

    def test_unknown_constant_error(self):
        with pytest.raises(TraceError):
            trace_function(lambda x: x + math.gibberish)

    def test_global_with_math_functions(self):
        v = trace_function(lambda x: math.sin(x * SCALE_NEG_G))(0.5)
        assert v == pytest.approx(math.sin(-1.25), abs=1e-6)

    def test_mixed_constant_and_function(self):
        v = trace_function(lambda x: np.exp(-x) + np.pi)(0.0)
        assert v == pytest.approx(1.0 + math.pi, abs=1e-6)


class TestReferenceBuiltinMatrix:
    """Every builtin in the reference README's transpiler table must trace
    (reference README.md:207-227); the WGSL-only helpers are covered by
    the WGSL-string frontend (test_wgsl_frontend.py)."""

    @pytest.mark.parametrize("name,fn", [
        ("sin", lambda x: math.sin(x)), ("cos", lambda x: math.cos(x)),
        ("tan", lambda x: math.tan(x)), ("asin", lambda x: math.asin(x * 0.5)),
        ("acos", lambda x: math.acos(x * 0.5)), ("atan", lambda x: math.atan(x)),
        ("sinh", lambda x: math.sinh(x)), ("cosh", lambda x: math.cosh(x)),
        ("tanh", lambda x: math.tanh(x)), ("sqrt", lambda x: math.sqrt(abs(x))),
        ("exp", lambda x: math.exp(x)), ("exp2", lambda x: np.exp2(x)),
        ("log", lambda x: math.log(abs(x) + 1)),
        ("log2", lambda x: np.log2(abs(x) + 1)),
        ("floor", lambda x: math.floor(x)), ("ceil", lambda x: math.ceil(x)),
        ("round", lambda x: round(x)), ("trunc", lambda x: math.trunc(x)),
        ("sign", lambda x: np.sign(x)), ("min", lambda x: min(x, 0.5)),
        ("max", lambda x: max(x, 0.5)), ("abs", lambda x: abs(x)),
        ("pow", lambda x: pow(x, 2.0)), ("power", lambda x: np.power(x, 2.0)),
        ("clip", lambda x: np.clip(x, 0.0, 1.0)), ("mod", lambda x: x % 2.0),
    ])
    def test_builtin_traces(self, name, fn):
        traced = trace_function(fn)
        v = float(traced(0.7))
        assert math.isfinite(v)
