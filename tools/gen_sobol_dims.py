#!/usr/bin/env python3
"""Generate additional Sobol dimensions for ops/qmc.py.

The first 16 dimensions use the classic published recurrences
(ops/qmc._JOE_KUO).  This tool extends the table: it enumerates the
remaining primitive polynomials over GF(2) of degrees 6-7 (primitivity
VERIFIED by computing the multiplicative order of x modulo p(x)) and,
for each new dimension, searches random odd initial values m_1..m_s
(m_i < 2^i) scoring PAIRWISE dyadic equidistribution against every
previously accepted dimension — the same t-value criterion Joe & Kuo
optimized for their published table ("Constructing Sobol sequences with
better two-dimensional projections", SIAM J. Sci. Comput. 30, 2008),
reconstructed here because this environment has no network access to
the published initial values.  The output rows are baked into
ops/qmc._JOE_KUO_EXT; tests/test_nd.py::TestSobolPoints asserts the
resulting per-dimension and pairwise balance for every dimension.

Run:  python tools/gen_sobol_dims.py [--dims 32] [--cands 4000]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

N_POINTS_LOG2 = 12
N_POINTS = 1 << N_POINTS_LOG2


def poly_order(poly_bits: int, degree: int) -> int:
    """Multiplicative order of x modulo the GF(2) polynomial encoded as
    ``poly_bits`` (bit i = coefficient of x^i, bit degree always set)."""
    mod = poly_bits
    # Repeated squaring of x in GF(2)[x]/(mod).
    max_order = (1 << degree) - 1

    def mulmod(a: int, b: int) -> int:
        r = 0
        while b:
            if b & 1:
                r ^= a
            b >>= 1
            a <<= 1
            if a >> degree & 1:
                a ^= mod
        return r

    # order divides 2^degree - 1; check divisors.
    order = max_order
    # factor max_order
    n, fac = max_order, []
    d = 2
    while d * d <= n:
        while n % d == 0:
            fac.append(d)
            n //= d
        d += 1
    if n > 1:
        fac.append(n)

    def powmod(e: int) -> int:
        r, base = 1, 2  # 2 encodes the polynomial "x"
        while e:
            if e & 1:
                r = mulmod(r, base)
            base = mulmod(base, base)
            e >>= 1
        return r

    if powmod(max_order) != 1:
        # x's order does not divide 2^degree - 1: p(x) is reducible (for
        # an irreducible p, the residue ring is GF(2^degree) and every
        # nonzero element's order divides the group order).
        return 0
    for p in set(fac):
        while order % p == 0 and powmod(order // p) == 1:
            order //= p
    return order


def primitive_polys(degree: int):
    """All primitive polynomials of the given degree, as (s, a) rows in
    the table encoding: a's bits are the coefficients of
    x^(s-1)..x^1."""
    out = []
    for a in range(1 << (degree - 1)):
        # poly = x^s + sum_i a_i x^(s-i) + 1
        bits = (1 << degree) | 1
        for i in range(1, degree):
            if (a >> (degree - 1 - i)) & 1:
                bits |= 1 << (degree - i)
        if poly_order(bits, degree) == (1 << degree) - 1:
            out.append(a)
    return out


def direction_numbers(s: int, a: int, m_init) -> np.ndarray:
    m = list(m_init)
    for k in range(s, 32):
        value = m[k - s] ^ (m[k - s] << s)
        for i in range(1, s):
            if (a >> (s - 1 - i)) & 1:
                value ^= m[k - i] << i
        m.append(value)
    v = np.zeros(32, np.uint32)
    for k in range(32):
        v[k] = np.uint32((m[k] << (31 - k)) & 0xFFFFFFFF)
    return v


def sobol_bits(idx: np.ndarray, v: np.ndarray) -> np.ndarray:
    out = np.zeros_like(idx)
    g = idx ^ (idx >> 1)  # Gray code: same point set, order-free scoring
    for k in range(32):
        out ^= np.where((g >> k) & 1, v[k], 0).astype(np.uint32)
    return out


def pair_t(bits_a: np.ndarray, bits_b: np.ndarray) -> int:
    """12 - B where B is the largest total bit budget whose every
    (b1, b2) split is perfectly balanced over the 2^12 points — the
    pairwise t-value restricted to this point count."""
    for budget in range(N_POINTS_LOG2, 0, -1):
        ok = True
        for b1 in range(1, budget):
            b2 = budget - b1
            cells = (bits_a >> (32 - b1)).astype(np.int64) * (1 << b2) + (
                bits_b >> (32 - b2)
            ).astype(np.int64)
            counts = np.bincount(cells, minlength=1 << budget)
            if counts.min() != counts.max():
                ok = False
                break
        if ok:
            return N_POINTS_LOG2 - budget
    return N_POINTS_LOG2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, default=32)
    ap.add_argument("--cands", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from tpu_montecarlo.ops import qmc

    rng = np.random.default_rng(args.seed)
    idx = np.arange(N_POINTS, dtype=np.uint32)

    # Existing dims' bit columns.
    existing_rows = list(qmc._JOE_KUO)
    used_polys = {(s, a) for s, a, _ in existing_rows}
    cols = []
    for dim in range(min(qmc.SOBOL_MAX_DIMS, 1 + len(existing_rows))):
        cols.append(sobol_bits(idx, qmc.sobol_direction_numbers(dim)))

    # Candidate polynomials: remaining primitives of degree 6, then 7.
    pool = []
    for deg in (6, 7):
        for a in primitive_polys(deg):
            if (deg, a) not in used_polys:
                pool.append((deg, a))

    new_rows = []
    while len(cols) < args.dims and pool:
        s, a = pool.pop(0)
        best = None
        for _ in range(args.cands):
            m = tuple(
                int(rng.integers(0, 1 << max(i - 1, 0))) * 2 + 1
                for i in range(1, s + 1)
            )
            v = direction_numbers(s, a, m)
            bits = sobol_bits(idx, v)
            ts = sorted(
                (pair_t(bits, c) for c in cols), reverse=True
            )
            score = (ts[0], sum(ts))  # minimize worst, then total
            if best is None or score < best[0]:
                best = (score, m, bits)
        score, m, bits = best
        print(
            f"dim {len(cols)}: s={s} a={a} m={m} "
            f"worst_t={score[0]} sum_t={score[1]}",
            flush=True,
        )
        new_rows.append((s, a, m))
        cols.append(bits)

    print("\n# rows for ops/qmc._JOE_KUO_EXT:")
    for s, a, m in new_rows:
        print(f"    ({s}, {a}, {tuple(m)}),")
    return 0


if __name__ == "__main__":
    sys.exit(main())
