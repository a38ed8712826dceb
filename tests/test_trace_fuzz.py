"""Differential fuzzing of the tracing front-end against CPython.

Generates random programs in the restricted subset the tracer accepts
(assignments, arithmetic, comparisons, nested if/else, bounded while
loops, and ``return`` anywhere — including inside loops, which lowers to
the first-return-wins mask) and asserts the traced JAX evaluation equals
plain CPython execution of the same source, with every operation kept in
float32 on both sides so results are bit-comparable.

This is the safety net for the control-flow lowering: ``if`` merges,
``lax.while_loop`` carries, the return mask, and their compositions are
exactly the places where a structural bug produces silently wrong values
rather than an exception (reference semantics anchor: the transpiler
emits WGSL with real early returns, transpiler.py:561-567).
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_montecarlo.tracing import trace_function

_CONSTS = ["0.0", "0.5", "1.0", "2.0", "3.0", "-1.0", "-2.0"]
_BINOPS = ["+", "-", "*"]
_CMPS = ["<", ">", "<=", ">=", "==", "!="]


class _ProgramGen:
    """Random restricted-subset program generator.

    Guarantees validity: whiles always advance a fresh pre-declared
    counter (termination + the modifies-a-variable rule), new variables
    are only introduced at points where they stay in scope, and the
    function always ends with a trailing return (static-return rule)."""

    def __init__(self, rng: random.Random):
        self.rng = rng
        self.counter = 0

    def expr(self, vars_, depth=0):
        if depth > 2 or self.rng.random() < 0.4:
            if self.rng.random() < 0.6:
                return self.rng.choice(vars_)
            return self.rng.choice(_CONSTS)
        op = self.rng.choice(_BINOPS)
        left = self.expr(vars_, depth + 1)
        right = self.expr(vars_, depth + 1)
        return f"({left} {op} {right})"

    def cond(self, vars_):
        op = self.rng.choice(_CMPS)
        return f"({self.expr(vars_, 2)} {op} {self.expr(vars_, 2)})"

    def block(self, read_vars, write_vars, indent, depth):
        """Statement lines for one block.  Loop counters are readable but
        never assignment targets (``write_vars``), so every generated
        while provably terminates on both executors."""
        lines = []
        for _ in range(self.rng.randint(1, 3)):
            roll = self.rng.random()
            if roll < 0.40 or depth >= 3:
                v = self.rng.choice(write_vars)
                lines.append(f"{indent}{v} = {self.expr(read_vars)}")
            elif roll < 0.62:
                lines.append(f"{indent}if {self.cond(read_vars)}:")
                lines += self.block(
                    read_vars, write_vars, indent + "    ", depth + 1
                )
                if self.rng.random() < 0.6:
                    lines.append(f"{indent}else:")
                    lines += self.block(
                        read_vars, write_vars, indent + "    ", depth + 1
                    )
            elif roll < 0.78:
                lines.append(f"{indent}return {self.expr(read_vars)}")
                return lines  # anything after is dead code
            else:
                self.counter += 1
                c = f"c{self.counter}"
                bound = self.rng.choice(["2.0", "3.0", "4.0"])
                lines.append(f"{indent}{c} = 0.0")
                lines.append(f"{indent}while {c} < {bound}:")
                lines.append(f"{indent}    {c} = {c} + 1.0")
                lines += self.block(
                    read_vars + [c], write_vars, indent + "    ", depth + 1
                )
        return lines

    def program(self, idx):
        self.counter = 0
        lines = [f"def fuzz_{idx}(x):", "    a = x + 1.0", "    b = 0.0"]
        lines += self.block(["x", "a", "b"], ["a", "b"], "    ", 0)
        lines.append(f"    return {self.expr(['x', 'a', 'b'])}")
        return "\n".join(lines) + "\n", f"fuzz_{idx}"


def _compile_both(src, name):
    """CPython version (run in float32 via NEP50 weak promotion) and the
    traced version of the same source."""
    namespace = {}
    exec(compile(src, f"<fuzz:{name}>", "exec"), namespace)
    py_fn = namespace[name]
    # trace_function recovers the AST from linecache — register the source
    # so inspect.getsource works for exec'd code.
    import linecache

    linecache.cache[f"<fuzz:{name}>"] = (
        len(src),
        None,
        src.splitlines(keepends=True),
        f"<fuzz:{name}>",
    )
    return py_fn, trace_function(py_fn)


_INPUTS = [-2.5, -1.0, 0.0, 0.75, 1.5, 3.0]


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_traced_matches_cpython(seed):
    rng = random.Random(1234 + seed)
    gen = _ProgramGen(rng)
    for idx in range(25):
        src, name = gen.program(f"{seed}_{idx}")
        py_fn, traced = _compile_both(src, name)
        want = np.asarray(
            [py_fn(np.float32(x)) for x in _INPUTS], np.float32
        )
        got = np.asarray(
            [np.asarray(traced(np.float32(x))) for x in _INPUTS], np.float32
        )
        # assert_array_equal treats NaN == NaN (overflow chains can reach
        # inf-inf identically on both float32 sides).
        np.testing.assert_array_equal(
            got, want, err_msg=f"scalar mismatch\n{src}"
        )


def test_fuzz_vmap_matches_scalar():
    """The batched path (how integrands actually run on the XLA backend):
    vmap over inputs must agree with per-scalar evaluation."""
    rng = random.Random(777)
    gen = _ProgramGen(rng)
    xs = np.asarray(_INPUTS, np.float32)
    checked = 0
    for idx in range(40):
        src, name = gen.program(f"v{idx}")
        if "while" not in src:
            continue  # focus the budget on loop-bearing programs
        py_fn, traced = _compile_both(src, name)
        want = np.asarray(
            [float(py_fn(np.float32(x))) for x in _INPUTS], np.float32
        )
        got = np.asarray(jax.vmap(traced)(jnp.asarray(xs)))
        np.testing.assert_array_equal(
            got, want, err_msg=f"vmap mismatch\n{src}"
        )
        checked += 1
    assert checked >= 10
