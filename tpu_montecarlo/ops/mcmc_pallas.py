"""Independence-sampler Metropolis-Hastings kernel (Pallas TPU backend).

Chains live one-per-lane in a (ROWS, 128) VMEM block; a ``fori_loop`` over
``n_burnin + n_steps`` iterations carries (x, log_p, log_q, K accumulators,
accept count) — the TPU analog of the reference's per-thread
``var<private>`` chain state and sequential MH loop
(src/shader_gen.rs:312-442).  Semantics preserved (see ops/mcmc_xla.py for
the full list): acceptance ``log u < log_p(x') + log_q(x) - log_p(x) -
log_q(x')``, burn-in advanced but not accumulated, f(current_x) added every
sampling step, per-chain mean ``/n_steps`` then unweighted chain average.

Analytic families use closed-form log-PDFs (src/shader_gen.rs:543-571);
CUSTOM families run fully in-kernel too: proposal sampling through the
uniform-u inverse-CDF table and log-PDF evaluation through the uniform-grid
log table (-100 floor outside support, src/distribution.rs:367-475), both
via the segment lane-gather lookup shared with the integrate kernel.
Requires uniform log-pdf x-grids (tables built by this library always are;
non-uniform user grids route to the XLA backend).

RNG: hardware PRNG seeded per (seed, program) — the same stream-separation
idea as the reference's +1000000/+999999 counter offsets
(src/shader_gen.rs:477-536).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from ..sampling import DistKind
from ..tables import LOG_PDF_FLOOR
from .integrate_pallas import (
    LANES,
    CounterRng,
    HardwareRng,
    _table_lookup,
    _uniform_halfopen01,
    _uniform_open01,
    pad_uniform_table,
    prep_inv_table,
    uniform_table_value,
)

__all__ = [
    "build_mcmc_fn_pallas",
    "mcmc_pallas_supports",
    "mcmc_vmem_fits",
    "plan_mcmc_grid",
    "plan_state_chains",
]


def mcmc_pallas_supports(proposal_kind: DistKind, target_kind: DistKind) -> bool:
    """Every family runs in-kernel — the analytic families (including
    the extended closed-form registry) via their transforms/log
    densities, CUSTOM via table lookups; callers must additionally
    ensure CUSTOM log-pdf x-grids are uniform."""
    from ..sampling import ANALYTIC_KINDS

    kinds = ANALYTIC_KINDS + (DistKind.CUSTOM,)
    return proposal_kind in kinds and target_kind in kinds


def plan_mcmc_grid(total_chains: int):
    """(num_programs, rows, chains_actual): chains per program fill a
    (rows, 128) lane block; all rounded-up chains run and enter the final
    average (the reference's round-up-and-run-everything semantics,
    src/engine.rs:860-871)."""
    rows = max(8, min(64, -(-total_chains // LANES)))
    rows = (rows + 7) // 8 * 8
    block = rows * LANES
    programs = -(-total_chains // block)
    return programs, rows, programs * block


def mcmc_vmem_fits(
    k: int,
    rows: int,
    local_programs: int,
    seed_batch: int = 1,
    with_state: bool = False,
    table_bytes: int = 0,
    budget_bytes: int = 16 * 1024 * 1024,
    with_stderr: bool = False,
    hmc: bool = False,
    with_diagnostics: bool = False,
    with_samples: bool = False,
) -> bool:
    """Conservative VMEM estimate for the MH kernel (same model as
    integrate_vmem_fits): carried chain state (x, log_p, log_q, accept
    count) + proposal temporaries + K accumulators, doubled for Mosaic's
    scoped temporaries, plus the VMEM-resident (seed_batch x programs,
    128) sums buffer, the resident custom tables (``table_bytes`` —
    inverse-CDF + padded log-pdf tables, sized by the caller), and, when
    stateful, the four whole-state blocks (x0/logp0 in, x/logp out) the
    kernel keeps resident.  Chain blocks are small (rows <= 64); huge
    seed batches, incompressible giant user tables, or multi-million-
    chain resume states are what this gate routes to the XLA backend."""
    blocks = k + 8  # x/logp/logq/n_acc carried + xp/logp'/logq'/u temps
    if with_stderr:
        blocks += 1  # end-of-kernel chain-means temporary
    if with_diagnostics:
        blocks += 4 * k  # split-half (sum, sum-of-squares) pairs
    if hmc:
        blocks += 3  # leapfrog (position, momentum, gradient) temps
    if with_samples:
        blocks += 1  # draw staging block (DMA-streamed, VMEM-flat in m)
    est = 2 * blocks * rows * LANES * 4
    if with_stderr or with_diagnostics:
        # stats leave through per-grid-step index-mapped (8, LANES)
        # blocks (double-buffered), not a whole resident buffer.
        est += 2 * 8 * LANES * 4
    else:
        est += seed_batch * local_programs * LANES * 4
    est += table_bytes
    if with_state:
        est += 4 * local_programs * rows * LANES * 4
    return est <= budget_bytes


def plan_state_chains(total_chains: int, n_dev: int = 1) -> int:
    """Chain count carried by the Pallas kernel's state buffers: the
    plan_mcmc_grid round-up with programs padded to a device multiple —
    the count ``McmcState`` must have to resume on this backend."""
    programs, rows, _ = plan_mcmc_grid(total_chains)
    programs = -(-programs // n_dev) * n_dev
    return programs * rows * LANES


# Odd 32-bit mix constant folded into the seed word per resume segment so
# continuations draw fresh streams; segment 0 leaves the seed unchanged so
# a fresh stateful run reproduces the stateless kernel bit-for-bit.
_SEGMENT_MIX = np.int32(0x9E3779B1 - (1 << 32))  # 0x9E3779B1 as int32

# Adaptive random-walk log-step clamp (same bounds as the XLA backend):
# steps outside [1e-6, 1e6] mean the adaptation diverged; the clamp keeps
# exp(log_step) finite rather than silently freezing the chain.  Plain
# Python floats — jnp scalars would be captured as kernel constants,
# which pallas_call rejects.
_RW_LS_MIN = -13.815511  # log(1e-6)
_RW_LS_MAX = 13.815511  # log(1e6)

# MH steps per fori_loop iteration.  As in the integrate kernel
# (integrate_pallas.UNROLL_BLOCKS), the dominant compiled-loop cost is
# per-iteration carry store/reload — here the (x, log_p, log_q, K accs,
# accept) blocks — not the step math; evaluating several SERIAL steps
# per iteration keeps the chain state in registers across them and
# divides that overhead.  Streams are unchanged: the step index i passed
# to the counters is the same global value, and the hardware PRNG draws
# in the same order, so estimates are bit-identical to the 1-step loop.
UNROLL_STEPS = 8


def _unrolled_fori_offset(base, count: int, step_fn, carry, unroll: int):
    """``_unrolled_fori`` over ``[base, base + count)`` where ``base`` is
    a TRACED scalar but ``count`` is static — the per-segment inner loop
    of the thinned-draw kernels (each segment's bounds shift with the
    draw index).  Same step_fn calls in the same order as the plain
    form, so streams and accumulation stay bit-identical."""
    main = count // unroll

    def body(t, c):
        i0 = base + t * jnp.int32(unroll)
        for u in range(unroll):
            c = step_fn(i0 + jnp.int32(u), c)
        return c

    carry = jax.lax.fori_loop(0, main, body, carry)
    for u in range(main * unroll, count):
        carry = step_fn(base + jnp.int32(u), carry)
    return carry


def _unrolled_fori(lo: int, hi: int, step_fn, carry, unroll: int):
    """fori_loop running ``step_fn(i, carry)`` for i in [lo, hi) with
    ``unroll`` steps inlined per iteration, plus a short remainder loop —
    bit-identical to the plain fori_loop at any (lo, hi)."""
    n = hi - lo
    if n <= 0:
        return carry
    unroll = max(1, min(unroll, n))
    main = n // unroll

    def body(j, c):
        base = jnp.int32(lo) + j * jnp.int32(unroll)
        for u in range(unroll):
            c = step_fn(base + jnp.int32(u), c)
        return c

    carry = jax.lax.fori_loop(0, main, body, carry)
    return jax.lax.fori_loop(lo + main * unroll, hi, step_fn, carry)


def _sample_chain_block(
    kind: DistKind, p1, p2, rows, rng, counter, inv=None, tag=0,
    with_logq=False,
):
    """One (rows, 128) proposal block.  ``tag`` separates the streams of
    different dimensions in the nd kernel (the counter RNG folds it in;
    the hardware PRNG is sequential so tags are naturally distinct);
    1-D callers leave it 0, keeping their streams unchanged.

    ``with_logq=True`` (CUSTOM only, non-gapped tables): returns
    ``(x, logq)`` where ``logq`` is the EXACT log-density of this
    sampler at the drawn point, ``-log((m-1) * dx_i)`` — the
    piecewise-linear-in-u inverse makes q piecewise-constant in x, and
    the segment slope ``dx_i`` is already gathered for the draw itself,
    so the proposal log-density costs ONE log instead of an x-space
    log-table segment scan.  Same convention as the sampler-mode IS
    weights (integrate_pallas.prep_inv_table_stratified(with_pdf=True));
    with it the MH acceptance uses the sampler's true density, keeping
    the chain exactly invariant for the target at ANY table
    resolution."""
    if kind == DistKind.UNIFORM:
        from ..sampling import next_below_f32

        u = _uniform_halfopen01(rng, (rows, LANES), counter, tag)
        x = p1 + u * (p2 - p1)
        # Clamp below max: f32 rounding may land on the half-open boundary
        # (Mosaic bitcast is vector-only, so decrement the offending lanes).
        return jnp.where(x >= p2, next_below_f32(jnp.full_like(x, p2)), x)
    if kind == DistKind.NORMAL:
        # Inverse-CDF normal (sampling.normal_from_u01): one uniform +
        # one erf_inv per proposal instead of the two uniforms +
        # log/sqrt/cos of the half-discarded Box-Muller pair.  Same
        # sampler as the integrate kernels; measured chain-steps/s is
        # within tunnel run-to-run variance of Box-Muller (the MH step
        # is dominated by the two log-pdf evaluations, not the draw).
        from ..sampling import normal_from_u01

        u = _uniform_halfopen01(rng, (rows, LANES), counter, tag)
        return p1 + p2 * normal_from_u01(u)
    if kind == DistKind.EXPONENTIAL:
        u = _uniform_open01(rng, (rows, LANES), counter, tag)
        return -jnp.log(jnp.maximum(u, 1e-7)) / p1
    if kind == DistKind.CUSTOM:
        inv_t, inv_dx = inv
        m = inv_t.shape[0] * LANES
        u = _uniform_halfopen01(rng, (rows, LANES), counter, tag)
        pos = u * jnp.float32(m - 1)
        i0 = jnp.clip(pos.astype(jnp.int32), 0, m - 2)
        frac = pos - i0.astype(jnp.float32)
        if with_logq:
            x, dx = _table_lookup(
                inv_t, inv_dx, i0, frac, rows, with_slope=True
            )
            # Sanitised CDF tables are strictly increasing, but guard
            # the log anyway (a zero slope would be an atom: infinite
            # density, clamped to a large finite logq).
            logq = -jnp.log(
                jnp.maximum(dx, jnp.float32(1e-30))
            ) - jnp.float32(np.log(float(m - 1)))
            return x, logq
        return _table_lookup(inv_t, inv_dx, i0, frac, rows)
    from ..sampling import ANALYTIC_EXT

    ext = ANALYTIC_EXT.get(kind)
    if ext is not None:
        u = _uniform_halfopen01(rng, (rows, LANES), counter, tag)
        return ext.inv_cdf(u, p1, p2).astype(jnp.float32)
    raise ValueError(f"Pallas MCMC does not support {kind}")


def _log_pdf(kind: DistKind, p1, p2, x, rows, log_tab=None):
    """Log densities in-kernel: the shared closed forms for analytic
    families (sampling.analytic_log_pdf — same expressions as the XLA
    backend, so acceptance conventions cannot drift); uniform-x-grid
    table lookup with the -100 floor for CUSTOM (reference conventions:
    src/shader_gen.rs:543-571, src/distribution.rs:367-475).  Small
    (<= 4-segment) tables unroll the segment scan — the MCMC kernels'
    per-step lookup is dominated by the fori_loop carry otherwise."""
    if kind == DistKind.CUSTOM:
        return uniform_table_value(
            x, log_tab, rows, LOG_PDF_FLOOR, max_unroll_segments=4
        )
    from ..sampling import analytic_log_pdf

    return analytic_log_pdf(kind, p1, p2, x)


def _pad_log_table(lx, lp):
    return pad_uniform_table(lx, lp, LOG_PDF_FLOOR)


def _splithalf_add(i, halves, vals, n_burnin: int, n1: int):
    """Split-half sums and squares update (pilot-shifted ``vals`` —
    variances are shift-invariant): the XLA backend's split-R-hat
    ingredients (ops/mcmc_xla.py), gated by the scalar iteration index.
    Shared by the 1-D and nd MCMC kernels (the statistics live in
    function-value space, so the chain dimensionality never enters)."""
    acc1, sq1, acc2, sq2 = halves
    h1 = jnp.logical_and(i >= n_burnin, i < n_burnin + n1)
    h2 = jnp.logical_and(i >= n_burnin + n1, i < n_burnin + 2 * n1)
    acc1 = tuple(a + jnp.where(h1, v, 0.0) for a, v in zip(acc1, vals))
    sq1 = tuple(
        a + jnp.where(h1, v * v, 0.0) for a, v in zip(sq1, vals)
    )
    acc2 = tuple(a + jnp.where(h2, v, 0.0) for a, v in zip(acc2, vals))
    sq2 = tuple(
        a + jnp.where(h2, v * v, 0.0) for a, v in zip(sq2, vals)
    )
    return (acc1, sq1, acc2, sq2)


def _diag_stat_rows(halves, pilots, k: int, n1: int, n_block, col):
    """Per-program split-half sequence statistics, reduced to the four
    (1, LANES) stat-block rows (rows 3-6): sequence-mean sums
    (pilot-restored), SS around the program's sequence centroid, the
    centroid, and the summed within-sequence variance — Chan-recombined
    across programs/devices by :func:`_diag_combine` exactly like the
    chain-mean stats (the XLA backend's reduction, ops/mcmc_xla.py)."""
    acc1, sq1, acc2, sq2 = halves
    n1f = jnp.float32(max(n1, 1))
    inv_n1 = jnp.float32(1.0) / n1f
    denom_w = jnp.float32(max(n1 - 1, 1))
    r_seq_sum = jnp.zeros((1, LANES), jnp.float32)
    r_seq_ss = jnp.zeros((1, LANES), jnp.float32)
    r_seq_mb = jnp.zeros((1, LANES), jnp.float32)
    r_w = jnp.zeros((1, LANES), jnp.float32)
    for i in range(k):
        m1 = acc1[i] * inv_n1
        m2 = acc2[i] * inv_n1
        s_m = jnp.sum(m1) + jnp.sum(m2)
        s_msq = jnp.sum(m1 * m1) + jnp.sum(m2 * m2)
        w = (jnp.sum(sq1[i]) + jnp.sum(sq2[i]) - n1f * s_msq) / denom_w
        mbs = s_m / (2.0 * n_block)
        ss_seq = jnp.maximum(s_msq - 2.0 * n_block * mbs * mbs, 0.0)
        mb_seq = mbs + pilots[i]
        r_seq_sum = jnp.where(col == i, 2.0 * n_block * mb_seq, r_seq_sum)
        r_seq_ss = jnp.where(col == i, ss_seq, r_seq_ss)
        r_seq_mb = jnp.where(col == i, mb_seq, r_seq_mb)
        r_w = jnp.where(col == i, w, r_w)
    return [r_seq_sum, r_seq_ss, r_seq_mb, r_w]


def _diag_combine(
    seq_sums, seq_ss, seq_mb, w_sums,
    chains_f, block_f, chains_actual: int, n_steps: int, psum=None,
):
    """Split-R-hat/ESS from the per-program sequence stats (stat-block
    rows 3-6): Chan-recombine the 2*block_f sequence means per program
    around the global sequence mean, then the XLA backend's
    split_rhat_ess on the totals.  ``psum``: the cross-device reducer
    on a mesh (identity off-mesh)."""
    from .mcmc_xla import split_rhat_ess

    if psum is None:
        psum = lambda v: v  # noqa: E731
    m_seq = psum(seq_sums) / (2.0 * chains_f)  # (R, K) global mean
    corr = (2.0 * block_f) * (seq_mb - m_seq[:, None, :]) ** 2
    ss_tot = psum(jnp.sum(seq_ss + corr, axis=1))
    w_tot = psum(w_sums)
    return split_rhat_ess(
        w_tot[0], ss_tot[0], 2 * chains_actual, n_steps // 2
    )


def _log_pdf_grad(kind: DistKind, p1, p2, x, rows, log_tab=None):
    """d/dx of :func:`_log_pdf` — the HMC position gradient, in-kernel.

    Analytic families trace ``jax.grad`` of the closed form (pure
    elementwise Mosaic ops); CUSTOM table targets gather the
    piecewise-linear interpolant's slope from the same uniform-grid
    (values, dx) pair the log-pdf lookup reads (zero outside support) —
    matching the XLA backend's autodiff of its interp lookup, so both
    backends follow the same gradient field."""
    if kind == DistKind.CUSTOM:
        from .integrate_pallas import uniform_table_slope

        return uniform_table_slope(x, log_tab, rows, max_unroll_segments=4)
    from ..sampling import analytic_log_pdf

    return jax.grad(
        lambda v: jnp.sum(analytic_log_pdf(kind, p1, p2, v))
    )(x)




def build_mcmc_fn_pallas(
    eval_fns: Sequence[Callable],
    proposal_kind: DistKind,
    target_kind: DistKind,
    n_steps: int,
    n_burnin: int,
    total_chains: int,
    mesh: Optional[jax.sharding.Mesh] = None,
    axis_name: str = "mc",
    interpret: bool = False,
    with_state: bool = False,
    use_init_state: bool = False,
    prop_gapped: bool = False,
    seed_batch: int = 1,
    param_batch: bool = False,
    with_stderr: bool = False,
    random_walk: bool = False,
    rw_adapt: bool = False,
    hmc_leapfrog: int = 0,
    with_diagnostics: bool = False,
    with_samples: int = 0,
):
    """Build a jitted MH program.

    Signature of the returned function (matches the XLA backend)::

        (seed, proposal_params, target_params,
         prop_inv_cdf_table, prop_cdf_table(gapped slope table when
         prop_gapped=True, unused otherwise),
         targ_logpdf_x, targ_logpdf, prop_logpdf_x, prop_logpdf)
        -> ((K,) float32 estimates, () float32 acceptance_rate)

    Analytic families ignore their tables (dummy 1-element arrays).  CUSTOM
    log-pdf x-grids must be uniform (the host-built ones are).

    ``with_state=True`` appends trailing args ``(x0, logp0, segment)`` —
    per-chain state of shape (plan_state_chains(total_chains),) plus an
    int32 segment counter mixed into the seed word so continuations draw
    fresh streams — and returns ``(values, acceptance, x_final,
    logp_final)``.  Chain state stays in VMEM for the whole sweep (the
    reference holds it in GPU registers, src/shader_gen.rs:390-392); only
    the final (x, log_p) blocks are written out.  The incoming state is
    consumed when ``use_init_state=True``; logq at the resume point is
    recomputed from x (it is a deterministic function of x).

    ``prop_gapped=True``: the (prop_inv_cdf_table, prop_cdf_table) runtime
    args are host-built gap-respecting (value, slope) tables from
    ``tables.gapped_inverse_tables`` — a zero-density-span proposal then
    samples in-kernel without ever landing inside a gap.

    ``seed_batch=R`` (stateless only): the seed arg becomes an (R,) vector
    and the program returns ((R, K), (R,)) — R independent MCMC runs
    batched as a leading grid dimension (traced once), each seeded exactly
    like its unbatched call.

    ``param_batch=True`` (stateless, analytic target; analytic or
    random-walk proposal): the proposal/target params args become
    (seed_batch, 2) — or (seed_batch, 4) walk rows under
    ``random_walk=True`` — each batch element running its OWN
    (proposal, target) parameter pair, so one compiled program serves a
    whole posterior/tempering/step-size sweep per dispatch.  The whole
    param arrays stay resident in SMEM; each grid rep reads its row.

    ``random_walk=True``: random-walk MH in-kernel (see
    distributions.RandomWalk / ops/mcmc_xla.py — a proposal family
    beyond the reference's independence-only sampler).  The proposal
    params arg becomes the (4,) row ``(step, init_lo, init_hi,
    target_accept)``; ``proposal_kind`` and the proposal-side tables
    are ignored.  Each iteration draws the same two uniform blocks as
    the independence kernel (one feeds ``normal_from_u01`` for the
    step, one the accept test), so the stream structure is unchanged.
    ``rw_adapt=True`` carries a per-chain log-step block through
    burn-in, Robbins-Monro-updating it toward ``target_accept``
    (``gamma_i = i^-0.6``, computed vectorially — Mosaic has no scalar
    int->float casts) and freezing it for the sampling phase.

    ``hmc_leapfrog=L`` (with ``random_walk=True``; distributions.HMC):
    the step becomes an L-step leapfrog trajectory through
    ``H(x, p) = -log p(x) + p^2/2`` with the exact Metropolis energy
    correction — Hamiltonian Monte Carlo fully IN-KERNEL.  The position
    gradient is ``jax.grad`` of the closed-form analytic log-density,
    traced at kernel-build time into elementwise Mosaic ops; CUSTOM
    table targets gather the log-table interpolant's slope instead
    (``_log_pdf_grad`` — the same piecewise-constant gradient field the
    XLA backend's autodiff follows).  Stream structure per iteration is
    the random walk's (one
    uniform block feeds the momentum via ``normal_from_u01``, one the
    accept test); step adaptation reuses the ``rw_adapt`` machinery.

    ``with_stderr=True`` (stateless, unbatched): the program returns
    ``(values, acceptance, stderrs)`` with stderr from the BETWEEN-CHAIN
    variance of per-chain means.  Accumulators are pilot-shifted (pilot =
    per-program mean of f over the init draw, as on the XLA backend) so
    the between-chain signal survives float32 at any |E[f]|; each
    program reports (chain-mean sum, sum of squared deviations from its
    own centroid, centroid), and programs/devices recombine exactly via
    Chan's parallel-variance formula around the global mean.

    ``with_samples=m`` (stateless; ``1 <= m <= n_steps``): the program
    additionally returns — LAST in the tuple — an ``(m, chains_actual)``
    float32 array of thinned post-burn-in draws (an ``(R, m,
    chains_actual)`` array under seed/param batching, one slab per grid
    rep), the chain states at sampling steps ``n_burnin + j * (n_steps
    // m)`` (the XLA backend's thinning grid, ops/mcmc_xla.py).  The
    draws STREAM to HBM: each hit stages the (rows, 128) chain block in
    a VMEM scratch and async-DMAs it to the kernel's ANY-space output
    at the (draw, program) row offset, so VMEM stays flat in ``m`` and
    the chain loop — and therefore the estimates — is bit-identical to
    the samples-free kernel (the RNG never sees the extra stores).
    The reference's chains never leave the GPU at all
    (src/shader_gen.rs:390-392); this raw-draw surface is beyond it.

    ``with_diagnostics=True`` (stateless, unbatched): the program
    additionally returns ``(r_hat, ess)`` split-half convergence
    diagnostics (the XLA backend's split-R-hat semantics,
    ops/mcmc_xla.split_rhat_ess).  The kernel carries four extra
    pilot-shifted accumulator sets (first/second-half sums and squares)
    and writes per-program sequence statistics — within-sequence
    variance sum, sequence-mean sums/SS/centroid — into the same
    per-grid-step (8, 128) stat block the error bars use (rows 3-6);
    programs and devices recombine via Chan's formula exactly as the
    XLA tiers do, so values match within f32 tolerance.
    """
    if seed_batch != 1 and with_state:
        raise ValueError("seed_batch applies to stateless MCMC programs only")
    if with_stderr and with_state:
        # (Seed AND param batches work: each rep gets its own output
        # rows, and the in-kernel pilots are computed from the rep's own
        # init draw/params.)
        raise ValueError(
            "with_stderr applies to stateless MCMC programs only"
        )
    if use_init_state and not with_state:
        raise ValueError(
            "use_init_state requires with_state=True (the stateless "
            "program has no state inputs)"
        )
    if with_diagnostics and (
        with_state or seed_batch != 1 or param_batch
    ):
        raise ValueError(
            "with_diagnostics applies to stateless unbatched MCMC "
            "programs only"
        )
    if with_diagnostics and n_steps < 4:
        raise ValueError("with_diagnostics needs n_steps >= 4")
    if with_samples:
        # Seed/param batches compose (round 5): the draw DMA offset
        # gains the grid-rep index and the output grows a leading (R,)
        # axis; with_state stays excluded (resumed segments would need
        # a draw-count ledger across segments).
        if with_state:
            raise ValueError(
                "with_samples applies to stateless MCMC programs only"
            )
        if not 1 <= int(with_samples) <= n_steps:
            raise ValueError(
                f"with_samples must be in [1, n_steps={n_steps}], got "
                f"{with_samples}"
            )
    sample_stride = n_steps // with_samples if with_samples else 0
    if param_batch:
        from ..sampling import ensure_param_batch_family

        if with_state:
            raise ValueError(
                "param_batch applies to stateless MCMC programs only"
            )
        if not random_walk:
            # A random walk's "proposal params" are its (step, init_lo,
            # init_hi, target_accept) row — always runtime words, so any
            # walk batches; only density-backed proposals are gated to
            # analytic families.
            ensure_param_batch_family(proposal_kind, "proposal")
        ensure_param_batch_family(target_kind, "target")
    if random_walk and use_init_state and rw_adapt:
        raise ValueError("rw_adapt is stateless-only (steps not resumable)")
    k = len(eval_fns)
    if k >= LANES:
        raise ValueError(f"at most {LANES - 1} fused functions supported")
    if hmc_leapfrog and not random_walk:
        raise ValueError("hmc_leapfrog requires random_walk=True")
    if random_walk:
        if not mcmc_pallas_supports(target_kind, target_kind):
            raise ValueError(
                "Unsupported target distribution family for Pallas MCMC"
            )
    elif not mcmc_pallas_supports(proposal_kind, target_kind):
        raise ValueError("Unsupported distribution family for Pallas MCMC")
    # In-kernel trig -> polynomial kernels (see integrate_pallas /
    # fast_math): covers the K integrand evaluations and the stderr
    # pilots, which both trace inside the kernel.
    from .fast_math import kernelize

    eval_fns = tuple(kernelize(f) for f in eval_fns)
    prop_custom = (not random_walk) and proposal_kind == DistKind.CUSTOM
    targ_custom = target_kind == DistKind.CUSTOM
    # Sampler-mode proposal log-density (stateless CUSTOM proposals,
    # non-gapped tables): logq comes from the draw's own gathered slope
    # (see _sample_chain_block), replacing the per-step x-space log-table
    # segment scan — the dominant cost of table-proposal chains (measured
    # 11.6x at a 2048-knot q-table + 4096-entry inverse).  Stateful runs
    # keep the table path: a resumed chain recomputes logq from x alone,
    # which must match how the minting program computed it.
    sampler_logq = prop_custom and not prop_gapped and not (
        with_state or use_init_state
    )

    # HMC inlines L leapfrog grad evals per MH step; dividing the step
    # unroll by L keeps the inlined kernel body (and its scoped-VMEM
    # temporaries) at the plain walk's scale.
    unroll_steps = (
        max(1, UNROLL_STEPS // hmc_leapfrog)
        if hmc_leapfrog
        else UNROLL_STEPS
    )
    n_dev = 1 if mesh is None else mesh.size
    programs, rows, chains_actual = plan_mcmc_grid(total_chains)
    programs = -(-programs // n_dev) * n_dev
    chains_actual = programs * rows * LANES
    local_programs = programs // n_dev
    n_iters = n_burnin + n_steps

    rng_factory = CounterRng if interpret else HardwareRng

    def kernel(seed_ref, prop_ref, targ_ref, pid_base_ref, *rest):
        rest = list(rest)
        seg_ref = rest.pop(0) if with_state else None
        inv = (rest.pop(0), rest.pop(0)) if prop_custom else None
        targ_tab = (
            (rest.pop(0), rest.pop(0), rest.pop(0)) if targ_custom else None
        )
        # Sampler-mode programs never read a q-table (logq rides the
        # draw), so none is staged.
        prop_tab = (
            (rest.pop(0), rest.pop(0), rest.pop(0))
            if prop_custom and not sampler_logq
            else None
        )
        if use_init_state:
            x0_ref = rest.pop(0)
            logp0_ref = rest.pop(0)
        if with_state:
            out_ref, x_out_ref, logp_out_ref = rest
        elif with_samples:
            out_ref, samp_ref, samp_stage, samp_sem = rest
        else:
            (out_ref,) = rest

        rep = pl.program_id(0)
        pid = pl.program_id(1)
        rng = rng_factory()
        # Hardware seeding takes at most two words: distinguish the MCMC
        # stream family from the integrate kernel's via a seed-word XOR.
        seed_word = seed_ref[0, rep] ^ 0x5BD1E995
        if with_state:
            # Segment 0 multiplies to 0: a fresh stateful run reproduces
            # the stateless kernel's streams exactly.
            seed_word = seed_word ^ (seg_ref[0, 0] * _SEGMENT_MIX)
        rng.seed(seed_word, pid_base_ref[0, 0] + pid)
        prow = rep if param_batch else 0
        q1 = prop_ref[prow, 0]
        q2 = prop_ref[prow, 1]
        t1 = targ_ref[prow, 0]
        t2 = targ_ref[prow, 1]
        if random_walk:
            # (step, init_lo, init_hi, target_accept) — see RandomWalk.
            rw_lo = prop_ref[prow, 1]
            rw_hi = prop_ref[prow, 2]
            rw_target = prop_ref[prow, 3]

        def sample(counter):
            # Sampler mode returns (x, logq) — logq gathered with the
            # draw; otherwise x alone (logq via the lp_q table scan).
            return _sample_chain_block(
                proposal_kind, q1, q2, rows, rng, counter, inv,
                with_logq=sampler_logq,
            )

        def lp_t(v):
            return _log_pdf(target_kind, t1, t2, v, rows, targ_tab)

        def lp_q(v):
            return _log_pdf(proposal_kind, q1, q2, v, rows, prop_tab)

        if use_init_state:
            x0 = x0_ref[pl.ds(pid * rows, rows), :]
            logp0 = logp0_ref[pl.ds(pid * rows, rows), :]
        elif random_walk:
            # Overdispersed uniform init over (init_lo, init_hi): there
            # is no proposal distribution to draw a start from.
            u0 = _uniform_halfopen01(rng, (rows, LANES), 0, 0)
            x0 = rw_lo + u0 * (rw_hi - rw_lo)
            logp0 = lp_t(x0)
        elif sampler_logq:
            x0, logq0 = sample(0)
            logp0 = lp_t(x0)
        else:
            x0 = sample(0)
            logp0 = lp_t(x0)
        if not random_walk and not sampler_logq:
            logq0 = lp_q(x0)

        n_block = jnp.float32(rows * LANES)
        stat_mode = with_stderr or with_diagnostics
        n1 = n_steps // 2  # split-half length (odd last step excluded)
        if stat_mode:
            # Accumulation pilot per program: f evaluated at the init
            # draw is on the right scale, and shifting the accumulators
            # by it keeps the between-chain signal out of the f32 ulp of
            # a large |E[f]| (same design as the XLA backend's pilot).
            # Per-program pilots recombine exactly via Chan's formula in
            # the wrapper (each program also reports its centroid).
            pilots = [
                jnp.sum(f(x0).astype(jnp.float32)) / n_block
                for f in eval_fns
            ]

        def accumulate(i, accs, halves, x):
            vals = [f(x).astype(jnp.float32) for f in eval_fns]
            if stat_mode:
                vals = [v - p for v, p in zip(vals, pilots)]
            accs = tuple(a + v for a, v in zip(accs, vals))
            if with_diagnostics:
                halves = _splithalf_add(i, halves, vals, n_burnin, n1)
            return accs, halves

        if with_samples:

            def write_draw(j, x):
                # Thinned draw: the post-step state at sampling step
                # n_burnin + j*stride (the states the accumulators
                # integrate; XLA-backend grid).  Staged in VMEM and
                # DMA-streamed to the ANY-space output at the
                # (batch rep, draw, program) row offset — no resident
                # (m, ...) buffer, no RNG interaction, estimates
                # bit-identical.
                samp_stage[...] = x
                cp = pltpu.make_async_copy(
                    samp_stage,
                    samp_ref.at[
                        pl.ds(
                            (
                                (rep * with_samples + j)
                                * local_programs
                                + pid
                            )
                            * rows,
                            rows,
                        ),
                        :,
                    ],
                    samp_sem,
                )
                cp.start()
                cp.wait()

        def run_sampling(body, carry0, unroll):
            """The sampling-phase loop.  Plain runs take one unrolled
            fori; thinned-draw runs SEGMENT it — each of the m segments
            runs its draw step, DMAs the post-step state block
            unconditionally, then runs the remaining stride-1 steps at
            full unroll — so the hot loop carries NO per-step draw
            conditional (a pl.when'd DMA inside the step body measured
            ~20x slower: the conditional semaphore ops serialize the
            whole unrolled iteration).  Step indices and op order are
            identical to the plain loop, so streams and estimates stay
            bit-equal."""
            if not with_samples:
                return _unrolled_fori(
                    n_burnin, n_iters, body, carry0, unroll
                )

            def seg(j, c):
                base = jnp.int32(n_burnin) + j * jnp.int32(sample_stride)
                c = body(base, c)
                write_draw(j, c[0])
                return _unrolled_fori_offset(
                    base + 1, sample_stride - 1, body, c, unroll
                )

            carry = jax.lax.fori_loop(0, with_samples, seg, carry0)
            done = n_burnin + with_samples * sample_stride
            if done < n_iters:
                carry = _unrolled_fori(
                    done, n_iters, body, carry, unroll
                )
            return carry

        zero_accs = tuple(
            jnp.zeros((rows, LANES), jnp.float32) for _ in range(k)
        )
        zero_block = jnp.zeros((rows, LANES), jnp.float32)
        zero_halves = (
            (zero_accs, zero_accs, zero_accs, zero_accs)
            if with_diagnostics
            else ()
        )

        # Burn-in advances the chains WITHOUT evaluating the K integrands
        # or the accept counter (the reference's burn-in loop runs only
        # mcmc_step, shader_gen.rs:409-411); the iteration index keeps
        # running through both phases, and each phase draws the same two
        # blocks per iteration, so the RNG streams — and therefore the
        # estimates — are bit-identical to the fused single-loop form.
        if random_walk:
            from ..sampling import normal_from_u01

            if hmc_leapfrog:
                # Position gradient of the target log-density: jax.grad
                # of the closed form for analytic families (elementwise
                # Mosaic ops); the table interpolant's gathered slope for
                # CUSTOM targets (see _log_pdf_grad).
                def grad_lp(v):
                    return _log_pdf_grad(
                        target_kind, t1, t2, v, rows, targ_tab
                    )

                def rw_move(i, x, logp, step_sz):
                    # L kick-drift-kick leapfrog steps from a fresh
                    # momentum, then the exact energy-corrected accept.
                    # Same two blocks per iteration as the plain walk.
                    u = _uniform_halfopen01(
                        rng, (rows, LANES), 3 * i + 1, 0
                    )
                    p0 = normal_from_u01(u)
                    xq, p, g = x, p0, grad_lp(x)
                    for _ in range(hmc_leapfrog):
                        p = p + 0.5 * step_sz * g
                        xq = xq + step_sz * p
                        g = grad_lp(xq)
                        p = p + 0.5 * step_sz * g
                    logp_prop = lp_t(xq)
                    log_alpha = (logp_prop - 0.5 * p * p) - (
                        logp - 0.5 * p0 * p0
                    )
                    # Diverged trajectories (f32 inf - inf) must reject,
                    # not NaN-poison the adaptation (NaN != NaN).
                    log_alpha = jnp.where(
                        log_alpha != log_alpha,
                        jnp.float32(-3.0e38),
                        log_alpha,
                    )
                    u2 = _uniform_open01(
                        rng, (rows, LANES), 3 * i + 2, 0
                    )
                    accept = jnp.log(u2) < log_alpha
                    x = jnp.where(accept, xq, x)
                    logp = jnp.where(accept, logp_prop, logp)
                    return x, logp, accept, log_alpha

            else:

                def rw_move(i, x, logp, step_sz):
                    # Symmetric Gaussian step: the q terms cancel from
                    # the acceptance ratio.  Same two uniform blocks per
                    # iteration as the independence kernel.
                    u = _uniform_halfopen01(
                        rng, (rows, LANES), 3 * i + 1, 0
                    )
                    xp = x + step_sz * normal_from_u01(u)
                    logp_prop = lp_t(xp)
                    log_alpha = logp_prop - logp
                    u2 = _uniform_open01(
                        rng, (rows, LANES), 3 * i + 2, 0
                    )
                    accept = jnp.log(u2) < log_alpha
                    x = jnp.where(accept, xp, x)
                    logp = jnp.where(accept, logp_prop, logp)
                    return x, logp, accept, log_alpha

            rw_step = q1  # (4,) row slot 0
            if rw_adapt:
                # Per-chain Robbins-Monro on the log step, burn-in only
                # (frozen for sampling, so the sampling chain is exact
                # MH).  gamma_i = i^-0.6, computed as a vector block —
                # Mosaic has no scalar int->float casts.
                ls0 = jnp.log(rw_step) + zero_block

                def burn_body(i, carry):
                    x, logp, ls = carry
                    x, logp, _, log_alpha = rw_move(
                        i, x, logp, jnp.exp(ls)
                    )
                    alpha_p = jnp.exp(jnp.minimum(log_alpha, 0.0))
                    i_f = jnp.full(
                        (rows, LANES), i + 1, jnp.int32
                    ).astype(jnp.float32)
                    gamma = jnp.exp(jnp.float32(-0.6) * jnp.log(i_f))
                    ls = jnp.clip(
                        ls + gamma * (alpha_p - rw_target),
                        _RW_LS_MIN,
                        _RW_LS_MAX,
                    )
                    return (x, logp, ls)

                x0, logp0, ls_f = _unrolled_fori(
                    0, n_burnin, burn_body, (x0, logp0, ls0), unroll_steps
                )
                step_fin = jnp.exp(ls_f)
            else:

                def burn_body(i, carry):
                    x, logp = carry
                    x, logp, _, _ = rw_move(i, x, logp, rw_step)
                    return (x, logp)

                x0, logp0 = _unrolled_fori(
                    0, n_burnin, burn_body, (x0, logp0), unroll_steps
                )
                step_fin = rw_step

            def body(i, carry):
                x, logp, accs, halves, n_acc = carry
                x, logp, accept, _ = rw_move(i, x, logp, step_fin)
                accs, halves = accumulate(i, accs, halves, x)
                n_acc = n_acc + accept.astype(jnp.float32)
                return (x, logp, accs, halves, n_acc)

            x_f, logp_f, accs, halves, n_acc = run_sampling(
                body,
                (x0, logp0, zero_accs, zero_halves, zero_block),
                unroll_steps,
            )
        else:

            def mh_move(i, x, logp, logq):
                # The chain's own log-densities are carried, not
                # recomputed (they only change on acceptance).  Distinct
                # counters per draw purpose — the reference's stream
                # separation via +1000000/+999999 offsets
                # (shader_gen.rs:477-536).
                if sampler_logq:
                    xp, logq_prop = sample(3 * i + 1)
                else:
                    xp = sample(3 * i + 1)
                    logq_prop = lp_q(xp)
                logp_prop = lp_t(xp)
                log_alpha = logp_prop + logq - logp - logq_prop
                u = _uniform_open01(rng, (rows, LANES), 3 * i + 2, 0)
                accept = jnp.log(u) < log_alpha
                x = jnp.where(accept, xp, x)
                logp = jnp.where(accept, logp_prop, logp)
                logq = jnp.where(accept, logq_prop, logq)
                return x, logp, logq, accept

            def burn_body(i, carry):
                x, logp, logq = carry
                x, logp, logq, _ = mh_move(i, x, logp, logq)
                return (x, logp, logq)

            x0, logp0, logq0 = _unrolled_fori(
                0, n_burnin, burn_body, (x0, logp0, logq0), UNROLL_STEPS
            )

            def body(i, carry):
                x, logp, logq, accs, halves, n_acc = carry
                x, logp, logq, accept = mh_move(i, x, logp, logq)
                accs, halves = accumulate(i, accs, halves, x)
                n_acc = n_acc + accept.astype(jnp.float32)
                return (x, logp, logq, accs, halves, n_acc)

            x_f, logp_f, _, accs, halves, n_acc = run_sampling(
                body,
                (x0, logp0, logq0, zero_accs, zero_halves, zero_block),
                UNROLL_STEPS,
            )

        col = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        row_out = jnp.zeros((1, LANES), jnp.float32)
        if stat_mode:
            # Per-program between-chain statistics from the pilot-shifted
            # accumulators: chain means, program centroid, sum of squared
            # deviations.  The shift cancels inside the deviations and is
            # restored exactly once in the centroid; the sums row carries
            # CHAIN-MEAN sums (n_block * centroid), the second row block
            # the SS values, the third the centroids — the wrapper
            # recombines programs with Chan's formula around the global
            # mean.
            inv_steps = jnp.float32(1.0) / jnp.float32(max(n_steps, 1))
            row_ss = jnp.zeros((1, LANES), jnp.float32)
            row_mb = jnp.zeros((1, LANES), jnp.float32)
            for i, acc in enumerate(accs):
                cm = acc * inv_steps
                s1 = jnp.sum(cm)
                s2 = jnp.sum(cm * cm)
                mbs = s1 / n_block
                # Shifted-data SS (safe: cm is pilot-shifted, so mbs is
                # near zero and the subtraction loses no precision).
                ss = jnp.maximum(s2 - n_block * mbs * mbs, 0.0)
                mb = mbs + pilots[i]
                row_out = jnp.where(col == i, n_block * mb, row_out)
                row_ss = jnp.where(col == i, ss, row_ss)
                row_mb = jnp.where(col == i, mb, row_mb)
            row_out = jnp.where(col == k, jnp.sum(n_acc), row_out)
            extra_rows = []
            if with_diagnostics:
                # Split-half sequence statistics — rows 3-6 of the stat
                # block, Chan-recombined in the wrapper (_diag_combine).
                extra_rows = _diag_stat_rows(
                    halves, pilots, k, n1, n_block, col
                )
            # Static full-block store into this grid step's own
            # index-mapped (8, 128) block: 3 (+4 diagnostic) stat rows
            # padded to 8 (Mosaic requires sublane block sizes divisible
            # by 8).  Per-step output blocks let Mosaic stream each
            # program's stats out by DMA instead of keeping a whole
            # (8*R*P, 128) buffer resident for the full sweep.
            out_ref[:, :] = jnp.concatenate(
                [row_out, row_ss, row_mb, *extra_rows,
                 jnp.zeros((5 - len(extra_rows), LANES), jnp.float32)],
                axis=0,
            )
        else:
            for i, acc in enumerate(accs):
                row_out = jnp.where(col == i, jnp.sum(acc), row_out)
            row_out = jnp.where(col == k, jnp.sum(n_acc), row_out)
            out_ref[pl.ds(rep * local_programs + pid, 1), :] = row_out
        if with_state:
            x_out_ref[pl.ds(pid * rows, rows), :] = x_f
            logp_out_ref[pl.ds(pid * rows, rows), :] = logp_f

    smem_seeds = pl.BlockSpec(
        (1, seed_batch), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    smem_scalar = pl.BlockSpec((1, 1), lambda r, i: (0, 0), memory_space=pltpu.SMEM)
    # Param-batched programs keep the WHOLE (R, 2) arrays resident in SMEM
    # and index by rep inside the kernel (Mosaic requires SMEM blocks to
    # span the array, like the seed vector).
    def _smem_params(width):
        return pl.BlockSpec(
            (seed_batch if param_batch else 1, width),
            lambda r, i: (0, 0),
            memory_space=pltpu.SMEM,
        )

    smem_prop = _smem_params(4 if random_walk else 2)
    smem_targ = _smem_params(2)
    smem_grid = pl.BlockSpec((1, 4), lambda r, i: (0, 0), memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    state_rows = local_programs * rows
    state_block = pl.BlockSpec(
        (state_rows, LANES), lambda r, i: (0, 0), memory_space=pltpu.VMEM
    )

    def pallas_sweep(seed, prop, targ, pid_base, *rest):
        in_specs = [smem_seeds, smem_prop, smem_targ, smem_scalar]
        if with_state:
            in_specs += [smem_scalar]  # segment
        if prop_custom:
            in_specs += [vmem, vmem]  # inverse-CDF table + dx
        if targ_custom:
            in_specs += [vmem, vmem, smem_grid]  # log table, dx, grid
        if prop_custom and not sampler_logq:
            in_specs += [vmem, vmem, smem_grid]
        if use_init_state:
            in_specs += [state_block, state_block]  # x0, logp0
        out_rows = seed_batch * local_programs
        stat_mode = with_stderr or with_diagnostics
        total_rows = 8 * out_rows if stat_mode else out_rows
        if stat_mode:
            # Each grid step owns its own (8, LANES) output block
            # (block index r*P + i → rows [8*(r*P+i), 8*(r*P+i)+8)):
            # the kernel stores the whole block statically and Mosaic
            # DMAs it out per step.
            sums_spec = pl.BlockSpec(
                (8, LANES),
                lambda r, i: (r * local_programs + i, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            sums_spec = pl.BlockSpec(
                (total_rows, LANES), lambda r, i: (0, 0),
                memory_space=pltpu.VMEM,
            )
        sums_shape = jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32)
        state_shape = jax.ShapeDtypeStruct((state_rows, LANES), jnp.float32)
        scratch_shapes = ()
        if with_state:
            out_specs = (sums_spec, state_block, state_block)
            out_shape = (sums_shape, state_shape, state_shape)
        elif with_samples:
            # Thinned draws stream by DMA into an ANY-space (HBM)
            # output; only the (rows, LANES) staging block costs VMEM.
            # Batched programs (seed/param reps) get one (m, chains)
            # slab per rep, leading axis R.
            out_specs = (sums_spec, pl.BlockSpec(memory_space=pl.ANY))
            out_shape = (
                sums_shape,
                jax.ShapeDtypeStruct(
                    (
                        seed_batch
                        * with_samples
                        * local_programs
                        * rows,
                        LANES,
                    ),
                    jnp.float32,
                ),
            )
            scratch_shapes = (
                pltpu.VMEM((rows, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
            )
        else:
            out_specs = sums_spec
            out_shape = sums_shape
        out = pl.pallas_call(
            kernel,
            grid=(seed_batch, local_programs),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(seed, prop, targ, pid_base, *rest)
        samp = ()
        if with_state:
            out, x_f, logp_f = out
        elif with_samples:
            # (R * m * P * rows, LANES) -> (m, local_chains) unbatched
            # / (R, m, local_chains) batched; row-major chain order
            # matches the state path's reshape(-1).
            out, samp_raw = out
            if seed_batch == 1 and not param_batch:
                samp = (samp_raw.reshape(with_samples, -1),)
            else:
                samp = (
                    samp_raw.reshape(seed_batch, with_samples, -1),
                )
        if stat_mode:
            # Program-major layout: program slot = rep*P + pid owns rows
            # [8*slot, 8*slot + 8) = (chain-mean sums + accept col k,
            # per-program SS, per-program centroids[, 4 diagnostic
            # rows], padding).
            grouped = out.reshape(seed_batch, local_programs, 8, LANES)
            sums = jnp.sum(grouped[:, :, 0, :], axis=1)  # (R, LANES)
            ret = (
                sums[:, :k],
                sums[:, k],
                grouped[:, :, 1, :k],  # (R, P, K)
                grouped[:, :, 2, :k],
            )
            if with_diagnostics:
                ret = ret + (
                    jnp.sum(grouped[:, :, 3, :k], axis=1),  # seq sums
                    grouped[:, :, 4, :k],  # per-program seq SS
                    grouped[:, :, 5, :k],  # per-program seq centroids
                    jnp.sum(grouped[:, :, 6, :k], axis=1),  # within-var
                )
            return ret + samp
        # (R, LANES): per-batch-element sums over that element's programs.
        totals = jnp.sum(
            out.reshape(seed_batch, local_programs, LANES), axis=1
        )
        if with_state:
            return (
                totals[0, :k], totals[0, k],
                x_f.reshape(-1), logp_f.reshape(-1),
            )
        return (totals[:, :k], totals[:, k]) + samp

    denom_vals = jnp.float32(chains_actual) * jnp.float32(n_steps)
    denom_acc = jnp.float32(chains_actual) * jnp.float32(max(n_steps, 1))
    chains_f = jnp.float32(chains_actual)
    block_f = jnp.float32(rows * LANES)  # chains per program

    def _stderr_of(ss_total):
        # Standard error of the mean of chains_actual independent chains
        # (ddof=1; matches the XLA backend's convention).
        var = ss_total / jnp.maximum(chains_f - 1.0, 1.0)
        return jnp.sqrt(var / chains_f)

    def _chan_combine(values, ss, mb):
        # Total SS around the global mean M: sum_p [SS_p + n_p (mb_p - M)^2]
        # over this device's programs (cross-device psum happens outside).
        # Batched shapes: values (R, K), ss/mb (R, P, K).
        corr = block_f * (mb - values[:, None, :]) ** 2
        return jnp.sum(ss + corr, axis=1)

    def _diag_of(values, seq_sums, seq_ss, seq_mb, w_sums, psum=None):
        # Shared split-R-hat/ESS recombination (module-level helper,
        # also used by the nd kernel).
        del values  # (the sequence mean differs from the full-run mean)
        return _diag_combine(
            seq_sums, seq_ss, seq_mb, w_sums,
            chains_f, block_f, chains_actual, n_steps, psum=psum,
        )

    def _shape_stderr(values, acc, se):
        if seed_batch == 1 and not param_batch:
            return values[0], acc[0], se[0]
        return values, acc, se

    def _shape_stateless(sums, n_acc):
        # sums (R, K), n_acc (R,); single-seed programs keep ((K,), scalar)
        # (param-batched programs always keep the batch axis, even at R=1).
        if seed_batch == 1 and not param_batch:
            return sums[0], n_acc[0]
        return sums, n_acc

    def _prep(seed, prop_params, targ_params, tables):
        (prop_inv, prop_cdf, targ_lx, targ_lp, prop_lx, prop_lp) = tables
        prepped = []
        if prop_custom:
            if prop_gapped:
                # (value, slope) pair built host-side with gap jumps
                # snapped to knots (tables.gapped_inverse_tables); the
                # second runtime slot carries the slope table.
                t = jnp.asarray(prop_inv, jnp.float32)
                dt = jnp.asarray(prop_cdf, jnp.float32)
                prepped += [
                    t.reshape(-1, LANES), dt.reshape(-1, LANES)
                ]
            else:
                prepped += list(prep_inv_table(prop_inv))
        if targ_custom:
            prepped += list(
                _pad_log_table(
                    jnp.asarray(targ_lx, jnp.float32),
                    jnp.asarray(targ_lp, jnp.float32),
                )
            )
        if prop_custom and not sampler_logq:
            prepped += list(
                _pad_log_table(
                    jnp.asarray(prop_lx, jnp.float32),
                    jnp.asarray(prop_lp, jnp.float32),
                )
            )
        pw = 4 if random_walk else 2
        prop_shape = (seed_batch, pw) if param_batch else (1, pw)
        targ_shape = (seed_batch, 2) if param_batch else (1, 2)
        return (
            jnp.asarray(seed, jnp.int32).reshape(1, seed_batch),
            jnp.asarray(prop_params, jnp.float32).reshape(prop_shape),
            jnp.asarray(targ_params, jnp.float32).reshape(targ_shape),
            tuple(prepped),
        )

    def _prep_state(state_args):
        """(x0, logp0, segment) host args -> kernel-ordered extras:
        segment (1,1) SMEM scalar first, state blocks last."""
        x0, logp0, segment = state_args
        seg_a = jnp.asarray(segment, jnp.int32).reshape(1, 1)
        pre = (seg_a,)
        post = ()
        if use_init_state:
            post = (
                jnp.asarray(x0, jnp.float32).reshape(-1, LANES),
                jnp.asarray(logp0, jnp.float32).reshape(-1, LANES),
            )
        return pre, post

    if mesh is None:
        if with_state:

            @jax.jit
            def run(seed, prop_params, targ_params, *tables_state):
                tables = tables_state[:-3]
                pre, post = _prep_state(tables_state[-3:])
                seed_a, prop_a, targ_a, prepped = _prep(
                    seed, prop_params, targ_params, tables
                )
                base = jnp.zeros((1, 1), jnp.int32)
                sums, n_acc, x_f, logp_f = pallas_sweep(
                    seed_a, prop_a, targ_a, base, *pre, *prepped, *post
                )
                return sums / denom_vals, n_acc / denom_acc, x_f, logp_f

            return run

        if with_diagnostics:

            @jax.jit
            def run(seed, prop_params, targ_params, *tables):
                seed_a, prop_a, targ_a, prepped = _prep(
                    seed, prop_params, targ_params, tables
                )
                base = jnp.zeros((1, 1), jnp.int32)
                out = pallas_sweep(seed_a, prop_a, targ_a, base, *prepped)
                samp = ()
                if with_samples:
                    out, samp = out[:-1], (out[-1],)
                sums, n_acc, ss, mb = out[:4]
                seq_sums, seq_ss, seq_mb, w_sums = out[4:]
                values = sums / chains_f  # chain-MEAN sums (stat mode)
                res = (values[0], (n_acc / denom_acc)[0])
                if with_stderr:
                    ss_total = _chan_combine(values, ss, mb)
                    res = res + (_stderr_of(ss_total)[0],)
                res = res + _diag_of(
                    values, seq_sums, seq_ss, seq_mb, w_sums
                )
                return res + samp

            return run

        if with_stderr:

            @jax.jit
            def run(seed, prop_params, targ_params, *tables):
                seed_a, prop_a, targ_a, prepped = _prep(
                    seed, prop_params, targ_params, tables
                )
                base = jnp.zeros((1, 1), jnp.int32)
                out = pallas_sweep(
                    seed_a, prop_a, targ_a, base, *prepped
                )
                samp = ()
                if with_samples:
                    out, samp = out[:-1], (out[-1],)
                sums, n_acc, ss, mb = out
                values = sums / chains_f  # sums are chain-MEAN sums here
                ss_total = _chan_combine(values, ss, mb)
                return _shape_stderr(
                    values, n_acc / denom_acc, _stderr_of(ss_total)
                ) + samp

            return run

        @jax.jit
        def run(seed, prop_params, targ_params, *tables):
            seed_a, prop_a, targ_a, prepped = _prep(
                seed, prop_params, targ_params, tables
            )
            base = jnp.zeros((1, 1), jnp.int32)
            out = pallas_sweep(seed_a, prop_a, targ_a, base, *prepped)
            samp = ()
            if with_samples:
                out, samp = out[:-1], (out[-1],)
            sums, n_acc = out
            return _shape_stateless(
                sums / denom_vals, n_acc / denom_acc
            ) + samp

        return run

    replicated = P()
    sharded = P(axis_name)
    n_extra = ((2 if sampler_logq else 5) if prop_custom else 0) + (
        3 if targ_custom else 0
    )

    def sharded_body(seed_a, prop_a, targ_a, *rest):
        d = jax.lax.axis_index(axis_name)
        base = (d * local_programs).astype(jnp.int32).reshape(1, 1)
        if use_init_state:
            # Shard-local flat (local_chains,) state -> kernel blocks.
            rest = rest[:-2] + tuple(
                a.reshape(-1, LANES) for a in rest[-2:]
            )
        if with_diagnostics:
            out = pallas_sweep(seed_a, prop_a, targ_a, base, *rest)
            samp = ()
            if with_samples:
                out, samp = out[:-1], (out[-1],)
            sums, n_acc, ss, mb = out[:4]
            seq_sums, seq_ss, seq_mb, w_sums = out[4:]
            values = jax.lax.psum(sums, axis_name) / chains_f
            acc = jax.lax.psum(n_acc, axis_name) / denom_acc
            res = (values[0], acc[0])
            if with_stderr:
                ss_total = jax.lax.psum(
                    _chan_combine(values, ss, mb), axis_name
                )
                res = res + (_stderr_of(ss_total)[0],)
            return res + _diag_of(
                values, seq_sums, seq_ss, seq_mb, w_sums,
                psum=lambda v: jax.lax.psum(v, axis_name),
            ) + samp
        if with_stderr:
            out = pallas_sweep(
                seed_a, prop_a, targ_a, base, *rest
            )
            samp = ()
            if with_samples:
                out, samp = out[:-1], (out[-1],)
            sums, n_acc, ss, mb = out
            values = jax.lax.psum(sums, axis_name) / chains_f
            n_acc = jax.lax.psum(n_acc, axis_name) / denom_acc
            # Chan recombination around the GLOBAL mean, then psum the
            # per-device totals (each device contributes its programs).
            ss_total = jax.lax.psum(
                _chan_combine(values, ss, mb), axis_name
            )
            return _shape_stderr(values, n_acc, _stderr_of(ss_total)) + samp
        out = pallas_sweep(seed_a, prop_a, targ_a, base, *rest)
        samp = ()
        if with_samples:
            out, samp = out[:-1], (out[-1],)
        sums, n_acc, *state = out
        sums = jax.lax.psum(sums, axis_name)
        n_acc = jax.lax.psum(n_acc, axis_name)
        sums = sums / denom_vals
        n_acc = n_acc / denom_acc
        if not with_state:
            sums, n_acc = _shape_stateless(sums, n_acc)
        return (sums, n_acc, *state) + samp

    body_in_specs = (replicated,) * (3 + n_extra)
    body_out_specs = (replicated, replicated)
    if with_stderr:
        body_out_specs = body_out_specs + (replicated,)
    if with_diagnostics:
        body_out_specs = body_out_specs + (replicated, replicated)
    if with_samples:
        # Thinned draws: (m, local_chains) per device, chain-sharded
        # on the last axis (leading (R,) axis when batched).
        if seed_batch == 1 and not param_batch:
            body_out_specs = body_out_specs + (P(None, axis_name),)
        else:
            body_out_specs = body_out_specs + (
                P(None, None, axis_name),
            )
    if with_state:
        # segment scalar (replicated, right after params) + per-chain state
        # blocks (sharded over the chain axis, trailing).
        body_in_specs = (
            body_in_specs[:3] + (replicated,) + body_in_specs[3:]
        )
        if use_init_state:
            body_in_specs = body_in_specs + (sharded, sharded)
        body_out_specs = body_out_specs + (sharded, sharded)

    shard_mapped = jax.shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=body_in_specs,
        out_specs=body_out_specs,
        check_vma=False,
    )

    if with_state:

        @jax.jit
        def run(seed, prop_params, targ_params, *tables_state):
            tables = tables_state[:-3]
            x0, logp0, segment = tables_state[-3:]
            seed_a, prop_a, targ_a, prepped = _prep(
                seed, prop_params, targ_params, tables
            )
            seg_a = jnp.asarray(segment, jnp.int32).reshape(1, 1)
            post = ()
            if use_init_state:
                post = (
                    jnp.asarray(x0, jnp.float32),
                    jnp.asarray(logp0, jnp.float32),
                )
            out = shard_mapped(seed_a, prop_a, targ_a, seg_a, *prepped, *post)
            sums, n_acc, x_f, logp_f = out
            return sums, n_acc, x_f, logp_f

        return run

    @jax.jit
    def run(seed, prop_params, targ_params, *tables):
        seed_a, prop_a, targ_a, prepped = _prep(
            seed, prop_params, targ_params, tables
        )
        return shard_mapped(seed_a, prop_a, targ_a, *prepped)

    return run
