"""WGSL string front-end: WGSL compute functions -> jittable JAX functions.

The reference API accepts raw WGSL source strings wherever it accepts
Python callables (reference: python/wgpu_montecarlo/__init__.py:734-747,
tests/test_integrator.py:48-68).  To keep that surface working on TPU —
where there is no WGSL compiler — this module parses the WGSL *function*
subset the reference emits and consumes (scalar ``fn name(x: f32) -> f32``
definitions with let/var, if/else, while, ``for`` — desugared to while,
including ``i++``/``i--`` updates — arithmetic, comparisons,
``&&``/``||``/``!``, ``select`` and the WGSL math builtins) into Python AST
nodes, then evaluates them with the same symbolic interpreter the Python
tracer uses (tracing.py).  A string may contain several functions that call
each other (the reference's importance-sampling wrappers are shaped that
way, __init__.py:893-905); the FIRST function is the entry point, matching
``_rename_wgsl_function``'s first-match rename (__init__.py:1123-1135).
"""

from __future__ import annotations

import ast
import re
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .tracing import TraceError, _FUNC_MAP, _Interpreter, _as_scalar_f32

__all__ = ["WgslError", "trace_wgsl_function"]


class WgslError(TraceError):
    """Raised when a WGSL string cannot be parsed/traced."""


def _inverse_sqrt(x):
    return jax.lax.rsqrt(jnp.asarray(x, jnp.float32))


def _trunc_mod(a, b):
    """WGSL '%' semantics: remainder with the sign of the dividend."""
    return jnp.fmod(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))


def _wgsl_mod_call(left: ast.expr, right: ast.expr) -> ast.expr:
    return _loc(
        ast.Call(
            func=_loc(ast.Name(id="__wgsl_mod__", ctx=ast.Load())),
            args=[left, right],
            keywords=[],
        )
    )


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<num>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?[fhui]?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>->|&&|\|\||==|!=|<=|>=|\+\+|--|\+=|-=|\*=|/=|%=|[-+*/%<>=!(){},;:.&|@\[\]])
    """,
    re.VERBOSE | re.DOTALL,
)

_KEYWORDS = {"fn", "let", "var", "return", "if", "else", "while", "for", "loop",
             "break", "continue", "true", "false", "const", "discard"}

_TYPES = {"f32", "f16", "u32", "i32", "bool"}


def _tokenize(src: str) -> List[Tuple[str, str]]:
    tokens: List[Tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise WgslError(f"Unexpected character in WGSL source: {src[pos]!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        tokens.append((m.lastgroup, m.group()))
    tokens.append(("eof", ""))
    return tokens


class _Parser:
    """Recursive-descent parser for the scalar WGSL function subset,
    producing Python ``ast`` nodes consumed by the tracing interpreter."""

    def __init__(self, tokens: List[Tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    # -- token helpers -------------------------------------------------------

    def peek(self) -> Tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> Tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, value: str) -> None:
        kind, val = self.next()
        if val != value:
            raise WgslError(f"Expected {value!r}, got {val!r}")

    def accept(self, value: str) -> bool:
        if self.peek()[1] == value:
            self.i += 1
            return True
        return False

    # -- grammar --------------------------------------------------------------

    def parse_program(self) -> List[Tuple[str, List[str], List[ast.stmt]]]:
        fns = []
        while self.peek()[0] != "eof":
            if self.peek()[1] != "fn":
                raise WgslError(
                    f"Expected 'fn' at top level, got {self.peek()[1]!r}"
                )
            fns.append(self.parse_fn())
        if not fns:
            raise WgslError("No WGSL functions found")
        return fns

    def parse_fn(self):
        self.expect("fn")
        kind, name = self.next()
        if kind != "name":
            raise WgslError(f"Expected function name, got {name!r}")
        self.expect("(")
        params: List[str] = []
        while not self.accept(")"):
            k, pname = self.next()
            if k != "name":
                raise WgslError(f"Expected parameter name, got {pname!r}")
            self.expect(":")
            self._parse_type()
            params.append(pname)
            if self.peek()[1] == ",":
                self.next()
        self.expect("->")
        self._parse_type()
        body = self.parse_block()
        return name, params, body

    def _parse_type(self):
        kind, val = self.next()
        if val not in _TYPES:
            raise WgslError(f"Unsupported WGSL type: {val!r}")

    def parse_block(self) -> List[ast.stmt]:
        self.expect("{")
        stmts: List[ast.stmt] = []
        while not self.accept("}"):
            stmts.extend(self.parse_stmt())
        return stmts

    def parse_stmt(self) -> List[ast.stmt]:
        kind, val = self.peek()

        if val in ("let", "var", "const"):
            stmt = self.parse_decl()
            self.expect(";")
            return [stmt]

        if val == "return":
            self.next()
            value = self.parse_expr()
            self.expect(";")
            return [_loc(ast.Return(value=value))]

        if val == "if":
            return [self.parse_if()]

        if val == "while":
            self.next()
            test = self.parse_paren_or_bare_expr()
            body = self.parse_block()
            return [_loc(ast.While(test=test, body=body, orelse=[]))]

        if val == "for":
            return self.parse_for()

        if val in ("loop", "break", "continue", "discard"):
            raise WgslError(f"WGSL '{val}' statements are not supported")

        if kind == "name":
            stmt = self.parse_assign_stmt()
            self.expect(";")
            return [stmt]

        raise WgslError(f"Unsupported WGSL statement starting at {val!r}")

    def parse_decl(self) -> ast.stmt:
        """``let/var/const name (: type)? (= expr)?`` without the ';'."""
        self.next()
        _, name = self.next()
        if self.accept(":"):
            self._parse_type()
        if self.accept("="):
            value = self.parse_expr()
        else:
            value = ast.Constant(value=0.0)
        return self._assign(name, value)

    def parse_assign_stmt(self) -> ast.stmt:
        """``name = expr`` / ``name op= expr`` / ``name++`` / ``name--``
        without the trailing ';'."""
        _, name = self.next()
        _, op = self.next()
        lhs = _loc(ast.Name(id=name, ctx=ast.Load()))
        if op == "=":
            return self._assign(name, self.parse_expr())
        if op in ("++", "--"):
            delta = _loc(ast.Constant(value=1.0))
            node_op = ast.Add() if op == "++" else ast.Sub()
            return self._assign(
                name, _loc(ast.BinOp(left=lhs, op=node_op, right=delta))
            )
        if op in ("+=", "-=", "*=", "/=", "%="):
            value = self.parse_expr()
            if op == "%=":
                return self._assign(name, _wgsl_mod_call(lhs, value))
            binop = {
                "+=": ast.Add,
                "-=": ast.Sub,
                "*=": ast.Mult,
                "/=": ast.Div,
            }[op]
            return self._assign(
                name,
                _loc(ast.BinOp(left=lhs, op=binop(), right=value)),
            )
        raise WgslError(f"Unexpected token after identifier: {op!r}")

    def parse_for(self) -> List[ast.stmt]:
        """Desugar ``for (init; cond; update) { body }`` into
        ``init; while (cond) { body; update }`` — the tracing
        interpreter already lowers ``while`` (closing the last
        string-surface gap vs the reference's compile-anything WGSL
        acceptance, reference __init__.py:738-747).

        WGSL scopes a ``var``/``let`` declared in the for-header to the
        loop; the flat desugared scope would let it clobber a same-named
        outer variable, so header-declared loop variables are renamed to
        a unique internal name throughout the header and body (shadow
        semantics preserved: body references resolve to the loop
        variable, post-loop references to the outer one)."""
        self.expect("for")
        self.expect("(")
        init: List[ast.stmt] = []
        decl_name = None
        if not self.accept(";"):
            kind, val = self.peek()
            if val in ("let", "var", "const"):
                decl = self.parse_decl()
                decl_name = decl.targets[0].id
                init = [decl]
            else:
                init = [self.parse_assign_stmt()]
            self.expect(";")
        if self.peek()[1] == ";":
            raise WgslError(
                "WGSL 'for' without a condition cannot terminate"
            )
        cond = self.parse_expr()
        self.expect(";")
        update: List[ast.stmt] = []
        if self.peek()[1] != ")":
            update = [self.parse_assign_stmt()]
        self.expect(")")
        body = self.parse_block()
        stmts = init + [
            _loc(ast.While(test=cond, body=body + update, orelse=[]))
        ]
        if decl_name is not None:
            self._loop_seq = getattr(self, "_loop_seq", 0) + 1
            renamer = _RenameVar(
                decl_name, f"__wgsl_for_{decl_name}_{self._loop_seq}"
            )
            stmts = [renamer.visit(s) for s in stmts]
        return stmts

    def parse_if(self) -> ast.stmt:
        self.expect("if")
        test = self.parse_paren_or_bare_expr()
        body = self.parse_block()
        orelse: List[ast.stmt] = []
        if self.accept("else"):
            if self.peek()[1] == "if":
                orelse = [self.parse_if()]
            else:
                orelse = self.parse_block()
        return _loc(ast.If(test=test, body=body, orelse=orelse))

    def parse_paren_or_bare_expr(self) -> ast.expr:
        if self.accept("("):
            e = self.parse_expr()
            self.expect(")")
            return e
        return self.parse_expr()

    @staticmethod
    def _assign(name: str, value: ast.expr) -> ast.stmt:
        return _loc(
            ast.Assign(
                targets=[_loc(ast.Name(id=name, ctx=ast.Store()))], value=value
            )
        )

    # -- expressions ------------------------------------------------------------

    def parse_expr(self) -> ast.expr:
        return self.parse_or()

    def parse_or(self) -> ast.expr:
        left = self.parse_and()
        vals = [left]
        while self.accept("||"):
            vals.append(self.parse_and())
        if len(vals) == 1:
            return left
        return _loc(ast.BoolOp(op=ast.Or(), values=vals))

    def parse_and(self) -> ast.expr:
        left = self.parse_cmp()
        vals = [left]
        while self.accept("&&"):
            vals.append(self.parse_cmp())
        if len(vals) == 1:
            return left
        return _loc(ast.BoolOp(op=ast.And(), values=vals))

    _CMP_OPS = {
        "<": ast.Lt,
        ">": ast.Gt,
        "<=": ast.LtE,
        ">=": ast.GtE,
        "==": ast.Eq,
        "!=": ast.NotEq,
    }

    def parse_cmp(self) -> ast.expr:
        left = self.parse_add()
        op = self.peek()[1]
        if op in self._CMP_OPS:
            self.next()
            right = self.parse_add()
            return _loc(
                ast.Compare(
                    left=left, ops=[self._CMP_OPS[op]()], comparators=[right]
                )
            )
        return left

    def parse_add(self) -> ast.expr:
        left = self.parse_mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            right = self.parse_mul()
            left = _loc(
                ast.BinOp(
                    left=left,
                    op=ast.Add() if op == "+" else ast.Sub(),
                    right=right,
                )
            )
        return left

    def parse_mul(self) -> ast.expr:
        left = self.parse_unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            right = self.parse_unary()
            if op == "%":
                # WGSL '%' is trunc-mod (sign of the dividend), not
                # Python's floor-mod — route through the helper so WGSL
                # strings with negative operands keep reference semantics.
                left = _wgsl_mod_call(left, right)
            else:
                node_op = {"*": ast.Mult, "/": ast.Div}[op]()
                left = _loc(ast.BinOp(left=left, op=node_op, right=right))
        return left

    def parse_unary(self) -> ast.expr:
        tok = self.peek()[1]
        if tok == "-":
            self.next()
            return _loc(ast.UnaryOp(op=ast.USub(), operand=self.parse_unary()))
        if tok == "+":
            self.next()
            return self.parse_unary()
        if tok == "!":
            self.next()
            return _loc(ast.UnaryOp(op=ast.Not(), operand=self.parse_unary()))
        return self.parse_primary()

    def parse_primary(self) -> ast.expr:
        kind, val = self.next()
        if kind == "num":
            text = val.rstrip("fhui")
            num = float(text) if ("." in text or "e" in text or "E" in text) else float(int(text))
            return _loc(ast.Constant(value=num))
        if val == "true":
            return _loc(ast.Constant(value=1.0))
        if val == "false":
            return _loc(ast.Constant(value=0.0))
        if val == "(":
            e = self.parse_expr()
            self.expect(")")
            return e
        if kind == "name":
            if self.peek()[1] == "(":
                self.next()
                args: List[ast.expr] = []
                while not self.accept(")"):
                    args.append(self.parse_expr())
                    if self.peek()[1] == ",":
                        self.next()
                return _loc(
                    ast.Call(
                        func=_loc(ast.Name(id=val, ctx=ast.Load())),
                        args=args,
                        keywords=[],
                    )
                )
            return _loc(ast.Name(id=val, ctx=ast.Load()))
        raise WgslError(f"Unexpected token in expression: {val!r}")


class _RenameVar(ast.NodeTransformer):
    """Rename every ``Name`` occurrence of one identifier (loop-variable
    scoping for desugared for-headers; WGSL has no nested function
    scopes, so a subtree-wide rename is exact shadow semantics)."""

    def __init__(self, old: str, new: str):
        self.old = old
        self.new = new

    def visit_Name(self, node):
        if node.id == self.old:
            node.id = self.new
        return node


def _loc(node):
    node.lineno = 1
    node.col_offset = 0
    node.end_lineno = 1
    node.end_col_offset = 0
    return node


def trace_wgsl_function(code: str) -> Callable:
    """Parse a WGSL string (one or more scalar functions) and return a
    jittable JAX scalar function for the FIRST definition.

    Raises:
        WgslError: on unsupported syntax or constructs.
    """
    fns = _Parser(_tokenize(code)).parse_program()

    # Late-bound registry so functions can call each other regardless of
    # definition order (the reference IS wrappers call later-defined fns).
    registry: Dict[str, Callable] = {}

    def make_callable(params: List[str], body: List[ast.stmt]) -> Callable:
        fdef = _loc(
            ast.FunctionDef(
                name="wgsl_fn",
                args=ast.arguments(
                    posonlyargs=[],
                    args=[ast.arg(arg=p) for p in params],
                    kwonlyargs=[],
                    kw_defaults=[],
                    defaults=[],
                ),
                body=body,
                decorator_list=[],
            )
        )

        def call(*args):
            # WGSL builtins (sqrt/sin/select/mix/clamp/…) resolve from the
            # shared FUNC_MAP; user-defined functions shadow them.
            namespace = dict(_FUNC_MAP)
            namespace["inverseSqrt"] = _inverse_sqrt
            namespace["__wgsl_mod__"] = _trunc_mod
            namespace.update(registry)
            interp = _Interpreter(captured=namespace)
            return interp.run(fdef, args)

        return call

    for name, params, body in fns:
        registry[name] = make_callable(params, body)

    entry_name, entry_params, _ = fns[0]
    entry = registry[entry_name]

    def traced(*args):
        return _as_scalar_f32(entry(*args))

    # Validate by abstract evaluation on scalar f32 inputs.
    probe = [jax.ShapeDtypeStruct((), jnp.float32)] * len(entry_params)
    try:
        out = jax.eval_shape(traced, *probe)
    except TraceError:
        raise
    except Exception as e:
        raise WgslError(f"Failed to trace WGSL function: {e}") from e
    if out.shape != ():
        raise WgslError("WGSL function must be scalar->scalar")

    traced.__tpu_mc_traced__ = True
    traced.__tpu_mc_key__ = ("wgsl", code)
    traced.__name__ = entry_name
    return traced
