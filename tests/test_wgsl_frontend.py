"""WGSL string front-end: the reference accepted raw WGSL scalar functions
wherever it accepted Python callables (reference
python/wgpu_montecarlo/__init__.py:734-747); here those strings are parsed
and traced to JAX.  Covers the statement/expression subset the reference's
shader generator emitted and consumed."""

import math

import numpy as np
import pytest

from tpu_montecarlo import WgslError, trace_wgsl_function


def _ev(src, x):
    f = trace_wgsl_function(src)
    return float(f(np.float32(x)))


class TestBasics:
    def test_identity(self):
        assert _ev("fn f(x: f32) -> f32 { return x; }", 2.5) == 2.5

    def test_arithmetic(self):
        src = "fn f(x: f32) -> f32 { return (x + 1.0) * 2.0 - x / 4.0; }"
        assert _ev(src, 4.0) == pytest.approx((4 + 1) * 2 - 1)

    def test_numeric_suffixes(self):
        assert _ev("fn f(x: f32) -> f32 { return x + 1f; }", 1.0) == 2.0

    def test_let_var_locals(self):
        src = """
        fn f(x: f32) -> f32 {
            let a = x * 2.0;
            var b: f32 = a + 1.0;
            b = b * b;
            return b;
        }
        """
        assert _ev(src, 1.0) == pytest.approx(9.0)

    def test_compound_assignment(self):
        src = """
        fn f(x: f32) -> f32 {
            var acc: f32 = x;
            acc += 2.0;
            acc *= 3.0;
            return acc;
        }
        """
        assert _ev(src, 1.0) == pytest.approx(9.0)

    def test_comments_stripped(self):
        src = """
        // line comment
        fn f(x: f32) -> f32 {
            /* block
               comment */
            return x; // trailing
        }
        """
        assert _ev(src, 3.0) == 3.0


class TestControlFlow:
    def test_if_else(self):
        src = """
        fn f(x: f32) -> f32 {
            if (x > 0.0) { return 1.0; } else { return -1.0; }
        }
        """
        assert _ev(src, 2.0) == 1.0
        assert _ev(src, -2.0) == -1.0

    def test_if_without_parens(self):
        src = "fn f(x: f32) -> f32 { if x > 0.0 { return x; } return 0.0; }"
        assert _ev(src, 3.0) == 3.0
        assert _ev(src, -3.0) == 0.0

    def test_while_loop(self):
        src = """
        fn f(x: f32) -> f32 {
            var v: f32 = x;
            while (v < 10.0) { v = v * 2.0; }
            return v;
        }
        """
        assert _ev(src, 1.0) == 16.0

    def test_select(self):
        src = "fn f(x: f32) -> f32 { return select(0.0, 1.0, x > 0.0); }"
        assert _ev(src, 5.0) == 1.0
        assert _ev(src, -5.0) == 0.0

    def test_for_loop_counted(self):
        # for desugars to init + while(cond){body; update} — the last
        # string-surface gap vs the reference's compile-anything WGSL
        # acceptance (__init__.py:738-747).
        src = """
        fn f(x: f32) -> f32 {
            var s: f32 = 0.0;
            for (var i: f32 = 0.0; i < 4.0; i = i + 1.0) {
                s = s + x;
            }
            return s;
        }
        """
        assert _ev(src, 2.5) == 10.0

    def test_for_loop_increment_update(self):
        src = """
        fn f(x: f32) -> f32 {
            var s: f32 = 1.0;
            for (var i: f32 = 0.0; i < 3.0; i++) { s = s * x; }
            return s;
        }
        """
        assert _ev(src, 2.0) == 8.0

    def test_for_loop_compound_update_and_body_decrement(self):
        src = """
        fn f(x: f32) -> f32 {
            var n: f32 = 4.0;
            var s: f32 = 0.0;
            for (var i: f32 = 0.0; i < n; i += 1.0) {
                s += x;
                n--;
            }
            return s + n;
        }
        """
        # iterations: i=0 (n 4->3), i=1 (n 3->2): loop exits at i=2 >= n=2.
        assert _ev(src, 1.0) == 4.0

    def test_for_loop_empty_init_and_update(self):
        src = """
        fn f(x: f32) -> f32 {
            var i: f32 = 0.0;
            var s: f32 = 0.0;
            for (; i < 3.0;) { s = s + x; i = i + 1.0; }
            return s;
        }
        """
        assert _ev(src, 1.5) == 4.5

    def test_for_geometric_series_taylor_exp(self):
        # A hand-written WGSL function of the kind a reference user might
        # ship: bounded-for Taylor expansion of exp(x).
        src = """
        fn f(x: f32) -> f32 {
            var term: f32 = 1.0;
            var s: f32 = 1.0;
            for (var i: f32 = 1.0; i < 12.0; i = i + 1.0) {
                term = term * x / i;
                s = s + term;
            }
            return s;
        }
        """
        assert _ev(src, 1.0) == pytest.approx(np.e, rel=1e-6)

    def test_for_without_condition_or_break_rejected(self):
        with pytest.raises(WgslError):
            trace_wgsl_function(
                "fn f(x: f32) -> f32 { for (;;) {} return x; }"
            )


class TestStructuredJumps:
    """break/continue in every loop form, WGSL ``loop``/``continuing``/
    ``break if``, and ``switch`` — all desugared to flag-guarded dataflow
    (no early exit under lax.while_loop).  The reference fed user WGSL to a
    real compiler, so all of these are live surface there
    (__init__.py:738-747)."""

    def test_while_break(self):
        src = """
        fn f(x: f32) -> f32 {
            var s: f32 = 0.0;
            var i: f32 = 0.0;
            while (i < 100.0) {
                i = i + 1.0;
                if (i > 6.0) { break; }
                s = s + i;
            }
            return s + x;
        }
        """
        # adds i = 1..6 = 21
        assert _ev(src, 0.5) == 21.5

    def test_while_continue(self):
        src = """
        fn f(x: f32) -> f32 {
            var s: f32 = 0.0;
            var i: f32 = 0.0;
            while (i < 6.0) {
                i = i + 1.0;
                if (i == 3.0) { continue; }
                s = s + i;
            }
            return s;
        }
        """
        # adds 1+2+4+5+6 = 18
        assert _ev(src, 0.0) == 18.0

    def test_for_continue_still_runs_update(self):
        # C/WGSL semantics: continue jumps TO the for-update, so the loop
        # variable still advances — the desugaring guards the update on the
        # break flag only.
        src = """
        fn f(x: f32) -> f32 {
            var s: f32 = 0.0;
            for (var i: f32 = 0.0; i < 5.0; i++) {
                if (i == 2.0) { continue; }
                s = s + x;
            }
            return s;
        }
        """
        assert _ev(src, 1.0) == 4.0

    def test_for_break_skips_update(self):
        src = """
        fn f(x: f32) -> f32 {
            var i: f32 = 0.0;
            for (; i < 10.0; i++) {
                if (i == 3.0) { break; }
            }
            return i + x;
        }
        """
        # i stays 3.0: the update must not run after the break.
        assert _ev(src, 0.25) == 3.25

    def test_for_infinite_header_with_break(self):
        src = """
        fn f(x: f32) -> f32 {
            var s: f32 = 0.0;
            for (;;) {
                s = s + x;
                if (s > 5.0) { break; }
            }
            return s;
        }
        """
        assert _ev(src, 2.0) == 6.0

    def test_loop_with_break(self):
        src = """
        fn f(x: f32) -> f32 {
            var s: f32 = 0.0;
            var i: f32 = 0.0;
            loop {
                if (i >= 4.0) { break; }
                s = s + x;
                i = i + 1.0;
            }
            return s;
        }
        """
        assert _ev(src, 2.0) == 8.0

    def test_loop_continuing_break_if(self):
        # continue jumps to the continuing block, which still advances the
        # counter; break-if terminates from inside continuing.
        src = """
        fn f(x: f32) -> f32 {
            var s: f32 = 0.0;
            var i: f32 = 0.0;
            loop {
                if (i == 2.0) { continue; }
                s = s + x;
                continuing {
                    i = i + 1.0;
                    break if i >= 5.0;
                }
            }
            return s;
        }
        """
        # i = 0,1,3,4 accumulate; i == 2 skipped
        assert _ev(src, 1.0) == 4.0

    def test_nested_loops_break_binds_inner(self):
        src = """
        fn f(x: f32) -> f32 {
            var s: f32 = 0.0;
            for (var i: f32 = 0.0; i < 3.0; i++) {
                for (var j: f32 = 0.0; j < 10.0; j++) {
                    if (j == 2.0) { break; }
                    s = s + x;
                }
            }
            return s;
        }
        """
        # inner contributes 2 per outer iteration
        assert _ev(src, 1.0) == 6.0

    def test_statement_after_conditional_break_is_guarded(self):
        src = """
        fn f(x: f32) -> f32 {
            var s: f32 = 0.0;
            var i: f32 = 0.0;
            while (i < 10.0) {
                i = i + 1.0;
                if (i > 3.0) { break; }
                s = s + 100.0;
                s = s + x;
            }
            return s + i;
        }
        """
        # 3 full iterations, exits with i = 4 (post-break adds skipped)
        assert _ev(src, 1.0) == 303.0 + 4.0

    def test_loop_without_break_rejected(self):
        with pytest.raises(WgslError):
            trace_wgsl_function(
                "fn f(x: f32) -> f32 { loop { x = x + 1.0; } return x; }"
            )

    def test_jumps_outside_loops_rejected(self):
        with pytest.raises(WgslError):
            trace_wgsl_function("fn f(x: f32) -> f32 { break; return x; }")
        with pytest.raises(WgslError):
            trace_wgsl_function("fn f(x: f32) -> f32 { continue; return x; }")

    def test_bare_break_in_continuing_rejected(self):
        with pytest.raises(WgslError):
            trace_wgsl_function(
                "fn f(x: f32) -> f32 { var i: f32 = 0.0;"
                " loop { continuing { break; } } return x; }"
            )

    def test_continue_in_switch_in_continuing_rejected(self):
        # continue binds to the loop even through a switch — from inside
        # the continuing block it would re-enter the continuing, which
        # WGSL forbids (previously a silently-dropped no-op).
        src = """
        fn f(x: f32) -> f32 {
            var i: f32 = 0.0;
            loop {
                i = i + 1.0;
                continuing {
                    switch (i) { default: { continue; } }
                    break if i >= 5.0;
                }
            }
            return i;
        }
        """
        with pytest.raises(WgslError):
            trace_wgsl_function(src)

    def test_return_in_continuing_rejected(self):
        src = """
        fn f(x: f32) -> f32 {
            var i: f32 = 0.0;
            loop {
                i = i + 1.0;
                if (i > 10.0) { break; }
                continuing { return 42.0; }
            }
            return i;
        }
        """
        with pytest.raises(WgslError):
            trace_wgsl_function(src)

    def test_break_bound_to_switch_inside_continuing_allowed(self):
        # A break that binds to a switch opened WITHIN the continuing
        # cannot exit the continuing block, so WGSL allows it.
        src = """
        fn f(x: f32) -> f32 {
            var i: f32 = 0.0;
            var t: f32 = 0.0;
            loop {
                i = i + 1.0;
                continuing {
                    switch (i) {
                        case 2.0: { t = t + 10.0; break; }
                        default: { t = t + 1.0; }
                    }
                    break if i >= 4.0;
                }
            }
            return t;
        }
        """
        assert _ev(src, 0.0) == 13.0

    def test_discard_rejected(self):
        with pytest.raises(WgslError):
            trace_wgsl_function(
                "fn f(x: f32) -> f32 { discard; return x; }"
            )


class TestSwitch:
    def test_switch_value_dispatch(self):
        src = """
        fn f(x: f32) -> f32 {
            var r: f32 = 0.0;
            switch (x) {
                case 1.0: { r = 10.0; }
                case 2.0, 3.0: { r = 20.0; }
                default: { r = -1.0; }
            }
            return r;
        }
        """
        assert _ev(src, 1.0) == 10.0
        assert _ev(src, 3.0) == 20.0
        assert _ev(src, 9.0) == -1.0

    def test_switch_returns_from_cases(self):
        src = """
        fn f(x: f32) -> f32 {
            switch (x) {
                case 1.0: { return 11.0; }
                default: { return -3.0; }
            }
        }
        """
        assert _ev(src, 1.0) == 11.0
        assert _ev(src, 4.0) == -3.0

    def test_break_inside_case_exits_the_switch(self):
        # WGSL binding rules: break inside switch ends the switch (cases
        # never fall through), so the trailing assignment must not run.
        src = """
        fn f(x: f32) -> f32 {
            var r: f32 = 0.0;
            switch (x) {
                case 1.0: { r = 5.0; if (r > 0.0) { break; } r = 99.0; }
                default: { r = 7.0; }
            }
            return r;
        }
        """
        assert _ev(src, 1.0) == 5.0
        assert _ev(src, 2.0) == 7.0

    def test_continue_inside_switch_binds_to_loop(self):
        src = """
        fn f(x: f32) -> f32 {
            var s: f32 = 0.0;
            for (var i: f32 = 0.0; i < 5.0; i++) {
                switch (i) {
                    case 2.0: { continue; }
                    default: { }
                }
                s = s + x;
            }
            return s;
        }
        """
        assert _ev(src, 1.0) == 4.0

    def test_switch_requires_exactly_one_default(self):
        with pytest.raises(WgslError):
            trace_wgsl_function(
                "fn f(x: f32) -> f32 {"
                " switch (x) { case 1.0: { return 1.0; } } }"
            )


class TestReturnInLoop:
    def test_wgsl_return_inside_while(self):
        src = """
        fn first_square_above(x: f32) -> f32 {
            var i: f32 = 0.0;
            while (i < 100.0) {
                i = i + 1.0;
                if (i * i > x) { return i; }
            }
            return -1.0;
        }
        """
        assert _ev(src, 0.5) == 1.0
        assert _ev(src, 10.0) == 4.0
        assert _ev(src, 90.0) == 10.0

    def test_wgsl_return_inside_for(self):
        src = """
        fn f(x: f32) -> f32 {
            for (var i: f32 = 0.0; i < 10.0; i++) {
                if (i >= x) { return i * 2.0; }
            }
            return -1.0;
        }
        """
        assert _ev(src, 2.5) == 6.0
        assert _ev(src, 50.0) == -1.0

    def test_loop_terminated_only_by_return(self):
        # Valid WGSL: control cannot fall out of a break-less loop, so no
        # trailing return is required (naga accepts this shape).
        src = """
        fn f(x: f32) -> f32 {
            var i: f32 = 0.0;
            loop {
                i = i + 1.0;
                if (i * i > x) { return i; }
            }
        }
        """
        assert _ev(src, 10.0) == 4.0
        assert _ev(src, 0.5) == 1.0

    def test_infinite_for_terminated_only_by_return(self):
        src = """
        fn f(x: f32) -> f32 {
            for (;;) {
                if (x > 1.0) { return x; }
                x = x + 1.0;
            }
        }
        """
        assert _ev(src, 0.25) == 1.25
        assert _ev(src, 5.0) == 5.0


class TestJumpsEndToEnd:
    def test_integrate_wgsl_loop_with_break(self):
        # A convergence-controlled WGSL integrand (Taylor exp with an
        # error-threshold break) straight through integrate(): the
        # sample-dependent trip count routes to the vmapped XLA backend
        # via the block-traceability gate.  E[exp(X)] over U(0,1) = e - 1.
        from tpu_montecarlo import Distribution, integrate

        src = """
        fn taylor_exp(x: f32) -> f32 {
            var term: f32 = 1.0;
            var s: f32 = 1.0;
            var i: f32 = 1.0;
            loop {
                term = term * x / i;
                s = s + term;
                if (abs(term) < 1.0e-6) { break; }
                continuing {
                    i = i + 1.0;
                    break if i > 30.0;
                }
            }
            return s;
        }
        """
        dist = Distribution.uniform(0.0, 1.0)
        result = integrate([src], dist, n_samples=200_000, seed=42)
        assert abs(result.values[0] - (np.e - 1.0)) < 0.01


class TestBuiltinsAndOps:
    def test_math_builtins(self):
        src = "fn f(x: f32) -> f32 { return sqrt(abs(x)) + exp(0.0); }"
        assert _ev(src, -4.0) == pytest.approx(3.0)

    def test_trig(self):
        src = "fn f(x: f32) -> f32 { return sin(x) * sin(x) + cos(x) * cos(x); }"
        assert _ev(src, 0.7) == pytest.approx(1.0, abs=1e-6)

    def test_pow(self):
        assert _ev("fn f(x: f32) -> f32 { return pow(x, 3.0); }", 2.0) == 8.0

    def test_min_max_clamp(self):
        src = "fn f(x: f32) -> f32 { return clamp(x, 0.0, 1.0) + min(x, 0.5) + max(x, 2.0); }"
        assert _ev(src, 0.75) == pytest.approx(0.75 + 0.5 + 2.0)

    def test_mix_step_smoothstep_fract(self):
        assert _ev("fn f(x: f32) -> f32 { return mix(0.0, 10.0, x); }", 0.25) == 2.5
        assert _ev("fn f(x: f32) -> f32 { return step(1.0, x); }", 2.0) == 1.0
        assert _ev("fn f(x: f32) -> f32 { return fract(x); }", 2.75) == pytest.approx(0.75)

    def test_logical_ops(self):
        src = "fn f(x: f32) -> f32 { return select(0.0, 1.0, x > 0.0 && x < 1.0); }"
        assert _ev(src, 0.5) == 1.0
        assert _ev(src, 1.5) == 0.0

    def test_negation(self):
        assert _ev("fn f(x: f32) -> f32 { return -x; }", 3.0) == -3.0


class TestMultiFunction:
    def test_first_function_is_entry(self):
        """The FIRST function is the entry point, matching the reference's
        first-match rename (_rename_wgsl_function, __init__.py:1123-1135)."""
        src = """
        fn entry(x: f32) -> f32 { return helper(x) * 2.0; }
        fn helper(x: f32) -> f32 { return x + 1.0; }
        """
        assert _ev(src, 1.0) == 4.0

    def test_is_wrapper_shape(self):
        """The shape the reference's IS path generates: weight folded into
        a wrapper calling renamed user/pdf helpers (__init__.py:893-905)."""
        src = """
        fn _is_wrapper_0(x: f32) -> f32 {
            return user_f(x) * p_pdf(x) / q_pdf(x);
        }
        fn user_f(x: f32) -> f32 { return x * x; }
        fn p_pdf(x: f32) -> f32 { return exp(-0.5 * x * x); }
        fn q_pdf(x: f32) -> f32 { return exp(-0.25 * x * x); }
        """
        x = 1.3
        want = (x * x) * math.exp(-0.5 * x * x) / math.exp(-0.25 * x * x)
        assert _ev(src, x) == pytest.approx(want, rel=1e-5)


class TestErrors:
    def test_empty_source(self):
        with pytest.raises(WgslError):
            trace_wgsl_function("")

    def test_garbage(self):
        with pytest.raises(WgslError):
            trace_wgsl_function("this is not wgsl")

    def test_unknown_builtin(self):
        from tpu_montecarlo import TraceError

        # Unknown calls surface as TraceError (the class that drives the
        # IS table fallback); WgslError is its parse-level subclass.
        with pytest.raises(TraceError):
            f = trace_wgsl_function(
                "fn f(x: f32) -> f32 { return frobnicate(x); }"
            )
            f(np.float32(1.0))

    def test_bad_type(self):
        with pytest.raises(WgslError):
            trace_wgsl_function("fn f(x: vec4) -> f32 { return 0.0; }")

    def test_wgsl_error_is_trace_error(self):
        from tpu_montecarlo import TraceError

        assert issubclass(WgslError, TraceError)


class TestVectorised:
    def test_traced_wgsl_vmaps(self):
        import jax
        import jax.numpy as jnp

        f = trace_wgsl_function(
            "fn f(x: f32) -> f32 { if (x > 0.0) { return x; } return 0.0; }"
        )
        out = jax.vmap(f)(jnp.asarray([-1.0, 2.0, 3.0], jnp.float32))
        np.testing.assert_allclose(np.asarray(out), [0.0, 2.0, 3.0])


class TestForLoopScoping:
    def test_header_var_shadows_without_clobbering(self):
        # WGSL scopes a for-header declaration to the loop: the body sees
        # the loop variable, code after the loop sees the outer one.
        src = """
        fn f(x: f32) -> f32 {
            var i: f32 = 100.0;
            var s: f32 = 0.0;
            for (var i: f32 = 0.0; i < 3.0; i++) { s = s + i; }
            return s + i;
        }
        """
        # s = 0+1+2 = 3; i after the loop is the OUTER i = 100.
        assert _ev(src, 0.0) == 103.0

    def test_nested_for_loops_independent_vars(self):
        src = """
        fn f(x: f32) -> f32 {
            var s: f32 = 0.0;
            for (var i: f32 = 0.0; i < 3.0; i++) {
                for (var j: f32 = 0.0; j < 2.0; j++) { s = s + x; }
            }
            return s;
        }
        """
        assert _ev(src, 1.0) == 6.0

    def test_assignment_init_updates_outer(self):
        # A plain-assignment init (no declaration) writes the OUTER
        # variable, per WGSL semantics.
        src = """
        fn f(x: f32) -> f32 {
            var i: f32 = 100.0;
            for (i = 0.0; i < 4.0; i++) { }
            return i;
        }
        """
        assert _ev(src, 0.0) == 4.0
