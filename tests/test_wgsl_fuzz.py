"""Differential fuzzing of the WGSL front-end's control-flow desugaring.

Random programs are built in a tiny statement IR and rendered twice from
the same tree:

  * as WGSL source — parsed and traced by ``wgsl_frontend`` (structured
    jumps become flag-guarded ``lax.while_loop`` dataflow), and
  * as Python source where every loop/switch gets its own exception
    class (``break`` → ``raise _BrkN``, ``continue`` → ``raise _ContN``,
    switch-break → ``raise _SwN``) — CPython's real non-local control
    flow, an oracle that cannot share bugs with the flag machinery.

The oracle rounds every binary operation to float32 (``f32(...)``
wrappers emitted per op), so both sides perform the identical IEEE f32
op sequence and results must agree exactly.  WGSL binding rules fall out
naturally on the oracle side: a continue raised inside a switch passes
through the switch's handler to the enclosing loop's.

Termination is guaranteed by construction: while counters advance as the
first body statement (a continue cannot stall progress), for-updates
always run under both semantics, and ``loop`` counters advance inside
``continuing`` ahead of its ``break if``; counters are never assignment
targets.
"""

import random

import numpy as np
import pytest

from tpu_montecarlo import trace_wgsl_function

_CONSTS = ["0.0", "0.5", "1.0", "2.0", "3.0", "-1.0", "-2.0"]
_BINOPS = ["+", "-", "*"]
_CMPS = ["<", ">", "<=", ">=", "==", "!="]


def _render_w(tree):
    if tree[0] == "leaf":
        return tree[1]
    _, op, left, right = tree
    return f"({_render_w(left)} {op} {_render_w(right)})"


def _render_p(tree):
    """Python rendering with an f32 round at every op, so the oracle's
    IEEE op sequence matches the traced f32 computation bit-for-bit."""
    if tree[0] == "leaf":
        return tree[1]
    _, op, left, right = tree
    return f"f32({_render_p(left)} {op} {_render_p(right)})"


class _Gen:
    def __init__(self, rng):
        self.rng = rng
        self.uid = 0
        self.preamble = []  # exception class definitions for the oracle

    def fresh(self, base):
        self.uid += 1
        return f"{base}{self.uid}"

    def expr(self, read_vars, depth=0):
        if depth > 2 or self.rng.random() < 0.4:
            if self.rng.random() < 0.6:
                return ("leaf", self.rng.choice(read_vars))
            return ("leaf", f"f32({self.rng.choice(_CONSTS)})")
        return (
            "bin",
            self.rng.choice(_BINOPS),
            self.expr(read_vars, depth + 1),
            self.expr(read_vars, depth + 1),
        )

    def cond(self, read_vars):
        op = self.rng.choice(_CMPS)
        return ("bin", op, self.expr(read_vars, 2), self.expr(read_vars, 2))

    def _both(self, tree):
        # WGSL has no f32() leaf wrapper — strip it for the WGSL side.
        w = _render_w(tree).replace("f32(", "(")
        return w, _render_p(tree)

    # Each emitter returns (wgsl_lines, py_lines).  ``ctx`` carries the
    # innermost loop's exception names (loop_brk, loop_cont) and the
    # innermost switch's (sw_brk) when a jump is currently legal.

    def block(self, read_vars, write_vars, wi, pi, depth, ctx):
        w, p = [], []
        for _ in range(self.rng.randint(1, 3)):
            roll = self.rng.random()
            if roll < 0.34 or depth >= 3:
                v = self.rng.choice(write_vars)
                ew, ep = self._both(self.expr(read_vars))
                w.append(f"{wi}{v} = {ew};")
                p.append(f"{pi}{v} = {ep}")
            elif roll < 0.50:
                cw, cp = self._both(self.cond(read_vars))
                w.append(f"{wi}if ({cw}) {{")
                p.append(f"{pi}if {cp}:")
                bw, bp = self.block(
                    read_vars, write_vars, wi + "    ", pi + "    ",
                    depth + 1, ctx,
                )
                w += bw
                p += bp or [f"{pi}    pass"]
                if self.rng.random() < 0.5:
                    w.append(f"{wi}}} else {{")
                    p.append(f"{pi}else:")
                    ew_, ep_ = self.block(
                        read_vars, write_vars, wi + "    ", pi + "    ",
                        depth + 1, ctx,
                    )
                    w += ew_
                    p += ep_ or [f"{pi}    pass"]
                w.append(f"{wi}}}")
            elif roll < 0.58 and ctx.get("loop_cont"):
                w.append(f"{wi}continue;")
                p.append(f"{pi}raise {ctx['loop_cont']}()")
                return w, p  # dead code after
            elif roll < 0.66 and (ctx.get("sw_brk") or ctx.get("loop_brk")):
                exc = ctx.get("sw_brk") or ctx.get("loop_brk")
                w.append(f"{wi}break;")
                p.append(f"{pi}raise {exc}()")
                return w, p
            elif roll < 0.74:
                ew, ep = self._both(self.expr(read_vars))
                w.append(f"{wi}return {ew};")
                p.append(f"{pi}return {ep}")
                return w, p
            elif roll < 0.86:
                sw, sp = self.switch(
                    read_vars, write_vars, wi, pi, depth, ctx
                )
                w += sw
                p += sp
            else:
                lw, lp = self.loop(
                    read_vars, write_vars, wi, pi, depth, ctx
                )
                w += lw
                p += lp
        return w, p

    def loop(self, read_vars, write_vars, wi, pi, depth, ctx):
        kind = self.rng.choice(["while", "for", "loop"])
        c = self.fresh("c")
        brk, cont = self.fresh("_Brk"), self.fresh("_Cont")
        self.preamble += [
            f"class {brk}(Exception): pass",
            f"class {cont}(Exception): pass",
        ]
        bound = self.rng.choice(["2.0", "3.0", "4.0"])
        inner_ctx = {"loop_brk": brk, "loop_cont": cont, "sw_brk": None}
        inner_reads = read_vars + [c]
        w, p = [], []
        if kind == "while":
            # counter advances FIRST, so a continue cannot stall progress
            w.append(f"{wi}var {c}: f32 = 0.0;")
            w.append(f"{wi}while ({c} < {bound}) {{")
            w.append(f"{wi}    {c} = {c} + 1.0;")
            p.append(f"{pi}{c} = f32(0.0)")
            p.append(f"{pi}try:")
            p.append(f"{pi}    while {c} < {bound}:")
            p.append(f"{pi}        try:")
            p.append(f"{pi}            {c} = f32({c} + 1.0)")
            bw, bp = self.block(
                inner_reads, write_vars, wi + "    ", pi + "            ",
                depth + 1, inner_ctx,
            )
            w += bw
            w.append(f"{wi}}}")
            p += bp
            p.append(f"{pi}        except {cont}: pass")
            p.append(f"{pi}except {brk}: pass")
        elif kind == "for":
            w.append(f"{wi}for (var {c}: f32 = 0.0; {c} < {bound}; "
                     f"{c} = {c} + 1.0) {{")
            p.append(f"{pi}{c} = f32(0.0)")
            p.append(f"{pi}try:")
            p.append(f"{pi}    while {c} < {bound}:")
            p.append(f"{pi}        try:")
            bw, bp = self.block(
                inner_reads, write_vars, wi + "    ", pi + "            ",
                depth + 1, inner_ctx,
            )
            w += bw
            w.append(f"{wi}}}")
            p += bp or [f"{pi}            pass"]
            p.append(f"{pi}        except {cont}: pass")
            p.append(f"{pi}        {c} = f32({c} + 1.0)")  # update always runs
            p.append(f"{pi}except {brk}: pass")
        else:
            # loop { body continuing { c += 1; break if c >= bound; } }
            w.append(f"{wi}var {c}: f32 = 0.0;")
            w.append(f"{wi}loop {{")
            p.append(f"{pi}{c} = f32(0.0)")
            p.append(f"{pi}try:")
            p.append(f"{pi}    while True:")
            p.append(f"{pi}        try:")
            bw, bp = self.block(
                inner_reads, write_vars, wi + "    ", pi + "            ",
                depth + 1, inner_ctx,
            )
            w += bw
            w.append(f"{wi}    continuing {{")
            w.append(f"{wi}        {c} = {c} + 1.0;")
            w.append(f"{wi}        break if {c} >= {bound};")
            w.append(f"{wi}    }}")
            w.append(f"{wi}}}")
            p += bp or [f"{pi}            pass"]
            p.append(f"{pi}        except {cont}: pass")
            p.append(f"{pi}        {c} = f32({c} + 1.0)")
            p.append(f"{pi}        if {c} >= {bound}: raise {brk}()")
            p.append(f"{pi}except {brk}: pass")
        return w, p

    def switch(self, read_vars, write_vars, wi, pi, depth, ctx):
        sel_w, sel_p = self._both(self.expr(read_vars, 2))
        sw = self.fresh("_Sw")
        self.preamble.append(f"class {sw}(Exception): pass")
        tmp = self.fresh("sel")
        inner_ctx = dict(ctx)
        inner_ctx["sw_brk"] = sw
        # continue stays legal through a switch (binds to the loop);
        # loop_brk is shadowed: a bare break now binds to this switch.
        inner_ctx["loop_brk"] = None
        values = sorted(self.rng.sample(["0.0", "1.0", "2.0", "3.0"], 2))
        w = [f"{wi}switch ({sel_w}) {{"]
        p = [f"{pi}{tmp} = {sel_p}", f"{pi}try:"]
        first = True
        for v in values:
            cw, cp = self.block(
                read_vars, write_vars, wi + "        ", pi + "        ",
                depth + 1, inner_ctx,
            )
            w.append(f"{wi}    case {v}: {{")
            w += cw
            w.append(f"{wi}    }}")
            key = "if" if first else "elif"
            p.append(f"{pi}    {key} {tmp} == {v}:")
            p += cp or [f"{pi}        pass"]
            first = False
        dw, dp = self.block(
            read_vars, write_vars, wi + "        ", pi + "        ",
            depth + 1, inner_ctx,
        )
        w.append(f"{wi}    default: {{")
        w += dw
        w.append(f"{wi}    }}")
        w.append(f"{wi}}}")
        p.append(f"{pi}    else:")
        p += dp or [f"{pi}        pass"]
        p.append(f"{pi}except {sw}: pass")
        return w, p

    def program(self, idx):
        self.uid = 0
        self.preamble = []
        name = f"wf_{idx}"
        ctx = {"loop_brk": None, "loop_cont": None, "sw_brk": None}
        bw, bp = self.block(
            ["x", "a", "b"], ["a", "b"], "    ", "    ", 0, ctx
        )
        tail_w, tail_p = self._both(self.expr(["x", "a", "b"]))
        wgsl = "\n".join(
            [f"fn {name}(x: f32) -> f32 {{",
             "    var a: f32 = 0.0;",
             "    var b: f32 = 1.0;"]
            + bw
            + [f"    return {tail_w};", "}"]
        )
        py = "\n".join(
            self.preamble
            + [f"def {name}(x):", "    a = f32(0.0)", "    b = f32(1.0)"]
            + bp
            + [f"    return {tail_p}"]
        )
        return wgsl, py, name


_INPUTS = [-2.5, -1.0, 0.0, 0.75, 1.5, 3.0]


@pytest.mark.parametrize("seed", range(6))
def test_wgsl_fuzz_matches_exception_oracle(seed):
    rng = random.Random(4321 + seed)
    gen = _Gen(rng)
    for idx in range(20):
        wgsl, py, name = gen.program(f"{seed}_{idx}")
        namespace = {"f32": np.float32}
        exec(compile(py, f"<wgslfuzz:{name}>", "exec"), namespace)
        oracle = namespace[name]
        traced = trace_wgsl_function(wgsl)
        with np.errstate(all="ignore"):  # overflow chains are fair game
            want = np.asarray(
                [oracle(np.float32(x)) for x in _INPUTS], np.float32
            )
        got = np.asarray(
            [np.asarray(traced(np.float32(x))) for x in _INPUTS],
            np.float32,
        )
        np.testing.assert_array_equal(
            got, want,
            err_msg=f"WGSL/oracle mismatch\n--- wgsl ---\n{wgsl}\n"
                    f"--- oracle ---\n{py}",
        )
