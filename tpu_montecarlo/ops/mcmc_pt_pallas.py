"""Parallel tempering (replica exchange) MCMC kernel — Pallas/Mosaic.

The kernel-speed tier of the tempering family (ops/mcmc_pt.py is the
portable XLA sweep; see its docstring for the algorithm).  The ladder
maps onto the TPU even more directly than the XLA path's flat
``T * chains`` lane ensemble: T is a small compile-time constant, so
each program carries the T rungs of its chain block as T SEPARATE
(rows, 128) VMEM state blocks, unrolled in Python.  A replica exchange
between adjacent rungs is then a pure ELEMENTWISE select between two
resident blocks — no lane permutation, no gather, no scatter, and the
pair's shared uniform is just one block both rungs read.  Nothing about
a swap leaves the VPU.

Per iteration, every rung advances with the tempered random-walk / HMC
MH update of ops/mcmc_pallas.py (acceptance ``beta_t * (logp' - logp)``;
HMC integrates the tempered Hamiltonian, feeling ``beta_t * grad``), and
the alternating even/odd adjacent pairings attempt exchanges with the
symmetric rule ``log v < (beta_t - beta_u) (logp_u - logp_t)`` (both
parities' pairs are computed every step and gated by the iteration
parity — pairs are disjoint within a parity, so the inactive parity's
selects are no-ops).  Estimates and the acceptance counter come from the
COLD (beta=1) rung only; the accepted-swap counter covers the whole run
(the attempted count is deterministic and divided out host-side).  The
per-lane step scale adapted in burn-in stays with its RUNG — rung state
blocks swap (x, log_p) but never the scale, matching ops/mcmc_pt.py.

Targets: a product of analytic per-dimension families, a traced joint
log-density, or (1-D) a CUSTOM uniform-grid log table (the shared
segment lane-gather lookup).  Proposals: RandomWalk / HMC only —
tempering repairs LOCAL samplers (validated at the API layer).

RNG streams: rung t's dimension-j proposal draws ride tag ``t*d + j``,
its accept draw tag ``t``, and pair t's swap uniform tag ``t`` under a
third per-iteration counter — the PT extension of the reference's
+1000000/+999999 stream separation (src/shader_gen.rs:477-536).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from ..sampling import DistKind
from .integrate_pallas import (
    LANES,
    CounterRng,
    HardwareRng,
    _uniform_halfopen01,
    _uniform_open01,
    pad_uniform_table,
    prep_inv_table,
)
from ..tables import LOG_PDF_FLOOR
from .mcmc_pallas import (
    UNROLL_STEPS,
    _RW_LS_MAX,
    _RW_LS_MIN,
    _diag_combine,
    _diag_stat_rows,
    _log_pdf,
    _log_pdf_grad,
    _splithalf_add,
    _unrolled_fori,
)

__all__ = [
    "build_pt_mcmc_fn_pallas",
    "pt_attempted_swaps",
    "pt_vmem_fits",
]

from ..sampling import ANALYTIC_KINDS as _ANALYTIC

# Seed-word mix distinguishing the tempered stream family from the plain
# MCMC kernels' (0x5BD1E995 / 0x27D4EB2F) and the integrate kernels'.
_PT_STREAM_MIX = 0x165667B1


def pt_vmem_fits(
    k: int,
    d: int,
    rows: int,
    local_programs: int,
    n_temps: int,
    rw_adapt: bool = False,
    hmc: bool = False,
    table_bytes: int = 0,
    budget_bytes: int = 16 * 1024 * 1024,
    with_samples: bool = False,
    with_stderr: bool = False,
    with_diagnostics: bool = False,
    independence: bool = False,
) -> bool:
    """Conservative VMEM estimate, same model as the plain MCMC gates
    (mcmc_pallas.mcmc_vmem_fits): T rungs of (d state + log_p [+ log
    step scale]) carried blocks + K accumulators + accept/swap counters
    + one rung's move temporaries + a swap pair's temporaries, doubled
    for Mosaic's scoped temporaries, plus the output buffer and any
    VMEM-resident target tables."""
    carried = n_temps * (d + 1 + (1 if rw_adapt else 0)) + k + 2
    if independence:
        carried += n_temps + 1  # per-rung logq blocks + logq' temp
    if with_stderr:
        carried += 1  # end-of-kernel chain-means temporary
    if with_diagnostics:
        carried += 4 * k  # split-half (sum, sum-of-squares) pairs
    temps = d + 3  # xp tuple, logp', u, u2
    if hmc:
        temps += 3 * d  # leapfrog (position, momentum, gradient) tuples
    temps += 2  # swap v + delta
    if with_samples:
        temps += 1  # draw staging block (DMA-streamed, VMEM-flat in m*d)
    est = 2 * (carried + temps) * rows * LANES * 4
    if with_stderr or with_diagnostics:
        est += 2 * 8 * LANES * 4  # double-buffered per-step stat blocks
    else:
        est += local_programs * LANES * 4
    est += table_bytes
    return est <= budget_bytes


def pt_attempted_swaps(n_temps: int, n_iters: int, chains: int) -> int:
    """Total attempted adjacent exchanges over the run (deterministic):
    even iterations attempt the (0,1),(2,3),... pairs, odd the
    (1,2),(3,4),... pairs, every chain column, burn-in included — the
    XLA builder's counting (ops/mcmc_pt.py)."""
    n_pairs_even = n_temps // 2
    n_pairs_odd = (n_temps - 1) // 2
    n_even = (n_iters + 1) // 2
    n_odd = n_iters // 2
    return chains * (n_even * n_pairs_even + n_odd * n_pairs_odd)


def build_pt_mcmc_fn_pallas(
    eval_fns: Sequence[Callable],
    d: int,
    betas: Sequence[float],
    n_steps: int,
    n_burnin: int,
    total_chains: int,
    targ_kinds: Optional[Sequence[DistKind]] = None,
    target_logpdf_fn: Optional[Callable] = None,
    targ_custom_1d: bool = False,
    mesh: Optional[jax.sharding.Mesh] = None,
    axis_name: str = "mc",
    interpret: bool = False,
    rw_adapt: bool = False,
    hmc_leapfrog: int = 0,
    seed_batch: int = 1,
    with_samples: int = 0,
    with_stderr: bool = False,
    with_diagnostics: bool = False,
    prop_kinds: Optional[Sequence[DistKind]] = None,
):
    """Build a jitted in-kernel parallel-tempering MH program.

    Returned signature (the kernel subset of ops/mcmc_pt.py's)::

        (seed, prop_params, targ_params, targ_lx, targ_lp)
        -> ((K,) estimates, () cold acceptance, () swap rate)

    ``prop_params``: the (d, 4) RandomWalk rows; ``targ_params`` a
    (d, 2) array of analytic family words (dummy (1, 2) for joint-fn /
    table targets); ``targ_lx``/``targ_lp`` the 1-D CUSTOM log table
    when ``targ_custom_1d`` (dummy (1,) arrays otherwise).
    ``total_chains`` counts COLD-RUNG chains; each program runs its
    block's full ladder.  ``betas`` must start at 1.0 and strictly
    decrease (API-validated).

    ``seed_batch=R``: the seed arg becomes an (R,) vector and the
    program returns ((R, K), (R,), (R,)) — R independent tempered runs
    batched as a leading grid dimension (traced once), each seeded
    exactly like its unbatched call (the plain MCMC kernel's serving
    design, ops/mcmc_pallas.py).

    ``with_samples=m`` (unbatched; ``1 <= m <= n_steps``): additionally
    returns — LAST — an ``(m, d, chains_actual)`` float32 array of
    thinned post-burn-in COLD-RUNG draws, the post-swap cold states at
    sampling steps ``n_burnin + j * (n_steps // m)`` (the XLA tempering
    sweep's convention, ops/mcmc_pt.py).  Draw blocks DMA-stream from a
    VMEM staging block to the ANY-space output, so VMEM stays flat in
    ``m * d`` and the estimates are bit-identical to the samples-free
    kernel (the plain kernels' streaming design, ops/mcmc_pallas.py).

    ``prop_kinds`` (a d-tuple of ANALYTIC families): INDEPENDENCE
    tempering — every rung draws fresh per-dimension proposals through
    the closed-form inverse CDFs (dimension j of rung t rides stream
    tag ``t*d + j``, the walk's layout) and accepts with
    ``beta (logp' - logp) + logq(x) - logq(x')`` (q is
    rung-independent, so its terms stay untempered); the ``prop_params``
    arg is then the (d, 2) family rows and each rung carries its logq
    block, which EXCHANGES with the state on a swap (logq is a function
    of x, unlike a walk's per-rung step scale).  CUSTOM proposal dims
    route to the XLA sweep (ops/mcmc_pt.py) at the call site.

    ``with_stderr=True``: appends (K,) between-chain error bars on the
    COLD-rung chain means — the plain kernels' pilot-shifted
    per-program stat rows, Chan-recombined (ops/mcmc_pallas.py); the
    pilot comes from f at the cold rung's init draw.  Composes with
    ``seed_batch``.  ``with_diagnostics=True`` (unbatched): appends
    cold-rung split-R-hat/ESS — the shared split-half machinery, rows
    3-6 of the per-grid-step stat block.  Return order matches the XLA
    tempering sweep: (values, acceptance, swap_rate[, stderr]
    [, r_hat, ess][, samples]).
    """
    n_modes = sum(
        x is not None
        for x in (targ_kinds, target_logpdf_fn)
    ) + int(targ_custom_1d)
    if n_modes != 1:
        raise ValueError(
            "exactly one of targ_kinds / target_logpdf_fn / "
            "targ_custom_1d must be given"
        )
    betas = tuple(float(b) for b in betas)
    n_temps = len(betas)
    if n_temps < 2:
        raise ValueError("parallel tempering needs >= 2 temperatures")
    if betas[0] != 1.0 or any(
        b2 >= b1 for b1, b2 in zip(betas, betas[1:])
    ):
        raise ValueError(
            f"betas must start at 1.0 and strictly decrease, got {betas}"
        )
    if targ_custom_1d:
        # Legacy 1-D table-target flag: the round-5 generic per-dim
        # CUSTOM machinery subsumes it.
        if d != 1:
            raise ValueError("targ_custom_1d is the 1-D flag")
        if targ_kinds is not None:
            raise ValueError(
                "give either targ_kinds or targ_custom_1d, not both"
            )
        targ_kinds = (DistKind.CUSTOM,)
    if targ_kinds is not None:
        targ_kinds = tuple(targ_kinds)
        if len(targ_kinds) != d:
            raise ValueError("targ_kinds must have one entry per dim")
        if not all(
            kk in _ANALYTIC + (DistKind.CUSTOM,) for kk in targ_kinds
        ):
            raise ValueError(
                "product targets must be analytic or CUSTOM table "
                "families in-kernel"
            )
    targ_custom_dims = tuple(
        j
        for j, kk in enumerate(targ_kinds or ())
        if kk == DistKind.CUSTOM
    )
    independence = prop_kinds is not None
    prop_custom_dims = ()
    if independence:
        prop_kinds = tuple(prop_kinds)
        if len(prop_kinds) != d:
            raise ValueError("prop_kinds must have one entry per dim")
        if not all(
            kk in _ANALYTIC + (DistKind.CUSTOM,) for kk in prop_kinds
        ):
            raise ValueError(
                "independence tempering supports analytic or CUSTOM "
                "(non-gapped) proposal dims in-kernel"
            )
        # CUSTOM proposal dims run sampler-mode logq (round 5): the
        # draw's own gathered inverse slope is the exact sampling
        # density, so no q-table is staged and the logq values swap
        # between rungs exactly like the analytic closed forms (q is
        # rung-independent).  Gapped/heavy-tail dims are gated to the
        # XLA sweep by the api layer.
        prop_custom_dims = tuple(
            j
            for j, kk in enumerate(prop_kinds)
            if kk == DistKind.CUSTOM
        )
        if rw_adapt or hmc_leapfrog:
            raise ValueError(
                "independence tempering has no step to adapt or "
                "integrate (rw_adapt/hmc_leapfrog are walk-only)"
            )
    if with_samples:
        if seed_batch != 1:
            raise ValueError(
                "with_samples applies to unbatched tempered programs only"
            )
        if not 1 <= int(with_samples) <= n_steps:
            raise ValueError(
                f"with_samples must be in [1, n_steps={n_steps}], got "
                f"{with_samples}"
            )
    sample_stride = n_steps // with_samples if with_samples else 0
    if with_diagnostics:
        if seed_batch != 1:
            raise ValueError(
                "with_diagnostics applies to unbatched tempered "
                "programs only"
            )
        if n_steps < 4:
            raise ValueError("with_diagnostics needs n_steps >= 4")
    k = len(eval_fns)
    if k >= LANES - 1:
        # Columns k and k+1 carry the accept and swap counters.
        raise ValueError(f"at most {LANES - 2} fused functions supported")
    from .fast_math import kernelize

    eval_fns = tuple(kernelize(f) for f in eval_fns)
    if target_logpdf_fn is not None:
        target_logpdf_fn = kernelize(target_logpdf_fn)

    # Each iteration advances T rungs (x hmc_leapfrog gradient evals);
    # scale the step unroll down accordingly, as the plain kernels do.
    per_step = n_temps * max(1, hmc_leapfrog)
    unroll_steps = max(1, UNROLL_STEPS // per_step)
    n_dev = 1 if mesh is None else mesh.size
    from .mcmc_pallas import plan_mcmc_grid

    programs, rows, chains_actual = plan_mcmc_grid(total_chains)
    programs = -(-programs // n_dev) * n_dev
    chains_actual = programs * rows * LANES
    local_programs = programs // n_dev
    n_iters = n_burnin + n_steps
    attempted = float(
        pt_attempted_swaps(n_temps, n_iters, chains_actual)
    )

    rng_factory = CounterRng if interpret else HardwareRng

    def kernel(seed_ref, prop_ref, targ_ref, pid_base_ref, *rest):
        rest = list(rest)
        # CUSTOM proposal dims' inverse-CDF (value, dx) pairs first,
        # then per-CUSTOM-target-dim uniform log-table trios, dim order
        # (the nd MCMC kernel's staging, round 5 — any mix of analytic
        # and table dims runs tempered in-kernel).
        prop_invs = {}
        for j in prop_custom_dims:
            prop_invs[j] = (rest.pop(0), rest.pop(0))
        targ_tabs = {}
        for j in targ_custom_dims:
            targ_tabs[j] = (rest.pop(0), rest.pop(0), rest.pop(0))
        if with_samples:
            out_ref, samp_ref, samp_stage, samp_sem = rest
        else:
            (out_ref,) = rest

        rep = pl.program_id(0)
        pid = pl.program_id(1)
        rng = rng_factory()
        rng.seed(
            seed_ref[0, rep] ^ _PT_STREAM_MIX, pid_base_ref[0, 0] + pid
        )
        if independence:
            qp = [
                (prop_ref[j, 0], prop_ref[j, 1]) for j in range(d)
            ]
        else:
            rw_steps = [prop_ref[j, 0] for j in range(d)]
            rw_los = [prop_ref[j, 1] for j in range(d)]
            rw_his = [prop_ref[j, 2] for j in range(d)]
            rw_target = prop_ref[0, 3]
        if targ_kinds is not None:
            tp = [
                (targ_ref[j, 0], targ_ref[j, 1]) for j in range(d)
            ]

        def lp_t(xs):
            if target_logpdf_fn is not None:
                return jnp.broadcast_to(
                    target_logpdf_fn(*xs).astype(jnp.float32),
                    (rows, LANES),
                )
            tot = None
            for j in range(d):
                lp = _log_pdf(
                    targ_kinds[j], *tp[j], xs[j], rows, targ_tabs.get(j)
                )
                tot = lp if tot is None else tot + lp
            return tot

        from ..sampling import normal_from_u01

        if hmc_leapfrog:
            if target_logpdf_fn is not None:
                grad_lp = jax.grad(lambda xv: jnp.sum(lp_t(xv)))
            else:
                # Per-dimension gradients — closed forms for analytic
                # dims, gathered interpolant slopes for CUSTOM dims
                # (mcmc_pallas._log_pdf_grad): tempered HMC on table
                # targets rides the kernel too (round 5).
                def grad_lp(xv):
                    return tuple(
                        _log_pdf_grad(
                            targ_kinds[j], *tp[j], xv[j], rows,
                            targ_tabs.get(j),
                        )
                        for j in range(d)
                    )

        if independence:
            from .mcmc_pallas import _sample_chain_block

            def lp_q_rest(xs):
                """Analytic dims' proposal log-density; sampler-mode
                (CUSTOM) dims' terms ride in from the draw itself."""
                tot = None
                for j in range(d):
                    if j in prop_custom_dims:
                        continue
                    lq = _log_pdf(prop_kinds[j], *qp[j], xs[j], rows)
                    tot = lq if tot is None else tot + lq
                return tot

            def _addq(lq_draw, lq_rest):
                if lq_draw is None:
                    return lq_rest
                if lq_rest is None:
                    return lq_draw
                return lq_draw + lq_rest

            def sample_prop(counter, t):
                """(xs, summed sampler-mode logq or None) for rung t."""
                xs, lq = [], None
                for j in range(d):
                    if j in prop_custom_dims:
                        x, l = _sample_chain_block(
                            prop_kinds[j], *qp[j], rows, rng, counter,
                            inv=prop_invs[j], tag=t * d + j,
                            with_logq=True,
                        )
                        lq = l if lq is None else lq + l
                    else:
                        x = _sample_chain_block(
                            prop_kinds[j], *qp[j], rows, rng, counter,
                            tag=t * d + j,
                        )
                    xs.append(x)
                return tuple(xs), lq

            def ind_move(i, t, xs, logp, logq):
                """Tempered independence MH for rung t: q is
                rung-independent, so its log terms stay untempered."""
                beta = betas[t]
                xp, lq_draw = sample_prop(3 * i + 1, t)
                logp_prop = lp_t(xp)
                logq_prop = _addq(lq_draw, lp_q_rest(xp))
                log_alpha = beta * (logp_prop - logp) + logq - logq_prop
                u2 = _uniform_open01(rng, (rows, LANES), 3 * i + 2, t)
                accept = jnp.log(u2) < log_alpha
                xs = tuple(
                    jnp.where(accept, xp_j, x_j)
                    for xp_j, x_j in zip(xp, xs)
                )
                logp = jnp.where(accept, logp_prop, logp)
                logq = jnp.where(accept, logq_prop, logq)
                return xs, logp, logq, accept

        def rung_move(i, t, xs, logp, scale):
            """One tempered MH step for rung t (beta = betas[t]): the
            plain kernels' random-walk / HMC move with the acceptance
            (and, for HMC, the force) scaled by the rung's beta."""
            beta = betas[t]
            if hmc_leapfrog:
                z = tuple(
                    normal_from_u01(
                        _uniform_halfopen01(
                            rng, (rows, LANES), 3 * i + 1, t * d + j
                        )
                    )
                    for j in range(d)
                )
                eps = [scale * rw_steps[j] for j in range(d)]
                # Tempered Hamiltonian H_t = -beta log pi + |p|^2/2:
                # the leapfrog force is beta * grad log pi.
                xq, p = xs, z
                g = grad_lp(xs)
                for _ in range(hmc_leapfrog):
                    p = tuple(
                        p[j] + (0.5 * beta) * eps[j] * g[j]
                        for j in range(d)
                    )
                    xq = tuple(xq[j] + eps[j] * p[j] for j in range(d))
                    g = grad_lp(xq)
                    p = tuple(
                        p[j] + (0.5 * beta) * eps[j] * g[j]
                        for j in range(d)
                    )
                logp_prop = lp_t(xq)
                kin0 = z[0] * z[0]
                kinf = p[0] * p[0]
                for j in range(1, d):
                    kin0 = kin0 + z[j] * z[j]
                    kinf = kinf + p[j] * p[j]
                log_alpha = (beta * logp_prop - 0.5 * kinf) - (
                    beta * logp - 0.5 * kin0
                )
                # Diverged trajectories (f32 inf - inf) reject rather
                # than NaN-poison the adaptation (NaN != NaN).
                log_alpha = jnp.where(
                    log_alpha != log_alpha,
                    jnp.float32(-3.0e38),
                    log_alpha,
                )
                xp = xq
            else:
                xp = tuple(
                    xs[j]
                    + scale
                    * rw_steps[j]
                    * normal_from_u01(
                        _uniform_halfopen01(
                            rng, (rows, LANES), 3 * i + 1, t * d + j
                        )
                    )
                    for j in range(d)
                )
                logp_prop = lp_t(xp)
                # Symmetric proposal against the rung's tempered target.
                log_alpha = beta * (logp_prop - logp)
            u2 = _uniform_open01(rng, (rows, LANES), 3 * i + 2, t)
            accept = jnp.log(u2) < log_alpha
            xs = tuple(
                jnp.where(accept, xp_j, x_j)
                for xp_j, x_j in zip(xp, xs)
            )
            logp = jnp.where(accept, logp_prop, logp)
            return xs, logp, accept, log_alpha

        def swap_all(i, xs_l, logp_l, logq_l, sw):
            """Alternating even/odd adjacent exchanges.  Both parities'
            pairs are computed and gated by the iteration parity (pairs
            within a parity are disjoint; the inactive parity's selects
            are no-ops), so the traced body draws a fixed number of
            blocks per iteration.  Under independence tempering the
            per-rung logq blocks exchange with the state (logq is a
            function of x); a walk's step scale stays with its rung."""
            for t in range(n_temps - 1):
                v = _uniform_halfopen01(rng, (rows, LANES), 3 * i + 3, t)
                # Pair (t, t+1) is attempted when i and t share parity
                # (even i: pairs starting at even t — ops/mcmc_pt.py's
                # even/odd scheme with swap_every=1).
                active = (i % 2) == (t % 2)
                delta = (betas[t] - betas[t + 1]) * (
                    logp_l[t + 1] - logp_l[t]
                )
                acc_sw = jnp.logical_and(
                    jnp.log(jnp.maximum(v, 1e-38)) < delta, active
                )
                for j in range(d):
                    a, b = xs_l[t][j], xs_l[t + 1][j]
                    xs_l[t][j] = jnp.where(acc_sw, b, a)
                    xs_l[t + 1][j] = jnp.where(acc_sw, a, b)
                pa, pb = logp_l[t], logp_l[t + 1]
                logp_l[t] = jnp.where(acc_sw, pb, pa)
                logp_l[t + 1] = jnp.where(acc_sw, pa, pb)
                if independence:
                    qa, qb = logq_l[t], logq_l[t + 1]
                    logq_l[t] = jnp.where(acc_sw, qb, qa)
                    logq_l[t + 1] = jnp.where(acc_sw, qa, qb)
                sw = sw + acc_sw.astype(jnp.float32)
            return xs_l, logp_l, logq_l, sw

        if independence:
            # Init from the proposal itself, every rung alike (the 1-D
            # independence sampler's init, ops/mcmc_pallas.py).
            draws0 = [sample_prop(0, t) for t in range(n_temps)]
            xs_l = [list(xs) for xs, _ in draws0]
            logq_l = [
                _addq(lq, lp_q_rest(tuple(xs)))
                for xs, lq in draws0
            ]
        else:
            # Overdispersed uniform init over the per-dimension ranges,
            # every rung alike (ops/mcmc_pt.py's init).
            xs_l = [
                [
                    rw_los[j]
                    + (rw_his[j] - rw_los[j])
                    * _uniform_halfopen01(
                        rng, (rows, LANES), 0, t * d + j
                    )
                    for j in range(d)
                ]
                for t in range(n_temps)
            ]
            logq_l = []
        logp_l = [lp_t(tuple(xs_l[t])) for t in range(n_temps)]

        zero_block = jnp.zeros((rows, LANES), jnp.float32)
        zero_accs = tuple(
            jnp.zeros((rows, LANES), jnp.float32) for _ in range(k)
        )
        n_block = jnp.float32(rows * LANES)
        stat_mode = with_stderr or with_diagnostics
        n1 = n_steps // 2  # split-half length (odd last step excluded)
        if stat_mode:
            # Accumulation pilot from f at the COLD rung's init draw —
            # the plain kernels' design (pilot-shift keeps the
            # between-chain signal out of the f32 ulp; restored exactly
            # via Chan recombination in the wrapper).
            pilots = [
                jnp.sum(
                    jnp.broadcast_to(
                        f(*tuple(xs_l[0])).astype(jnp.float32),
                        (rows, LANES),
                    )
                )
                / n_block
                for f in eval_fns
            ]
        zero_hflat = zero_accs * 4 if with_diagnostics else ()

        if with_samples:

            def write_draw(j, cold):
                # Thinned post-swap COLD-rung draw at sampling step
                # n_burnin + j*stride — the same states the accumulators
                # integrate (ops/mcmc_pt.py's convention), DMA-streamed
                # per dimension like the plain kernels'.
                for dim in range(d):
                    samp_stage[...] = cold[dim]
                    cp = pltpu.make_async_copy(
                        samp_stage,
                        samp_ref.at[
                            pl.ds(
                                (
                                    (j * d + dim) * local_programs
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

        def run_sampling(body, carry0):
            """Sampling-phase loop, segmented under with_samples so the
            cold-rung draw DMA runs unconditionally once per stride (a
            per-step pl.when'd DMA measured ~20x slower in the plain
            kernel).  The flat carry leads with rung 0's d state blocks
            (flat() packs xs_l[0] first), so the post-swap cold state is
            carry[:d].  Step order identical; estimates bit-equal."""
            if not with_samples:
                return _unrolled_fori(
                    n_burnin, n_iters, body, carry0, unroll_steps
                )
            from .mcmc_pallas import _unrolled_fori_offset

            def seg(j, c):
                base = jnp.int32(n_burnin) + j * jnp.int32(sample_stride)
                c = body(base, c)
                write_draw(j, tuple(c[:d]))
                return _unrolled_fori_offset(
                    base + 1, sample_stride - 1, body, c, unroll_steps
                )

            carry = jax.lax.fori_loop(0, with_samples, seg, carry0)
            done = n_burnin + with_samples * sample_stride
            if done < n_iters:
                carry = _unrolled_fori(
                    done, n_iters, body, carry, unroll_steps
                )
            return carry

        def flat(xs_l, logp_l, logq_l, ls_l, *extra):
            out = []
            for t in range(n_temps):
                out += list(xs_l[t])
            out += list(logp_l)
            out += list(logq_l)
            out += list(ls_l)
            return tuple(out) + tuple(extra)

        def unflat(carry):
            pos = 0
            xs_l = []
            for _ in range(n_temps):
                xs_l.append(list(carry[pos : pos + d]))
                pos += d
            logp_l = list(carry[pos : pos + n_temps])
            pos += n_temps
            logq_l = (
                list(carry[pos : pos + n_temps]) if independence else []
            )
            pos += len(logq_l)
            ls_l = (
                list(carry[pos : pos + n_temps]) if rw_adapt else []
            )
            pos += len(ls_l)
            return xs_l, logp_l, logq_l, ls_l, carry[pos:]

        # Burn-in: rung moves (+ per-rung Robbins-Monro step adaptation
        # when rw_adapt) and exchanges, no accumulation — the plain
        # kernels' split-loop shape.
        def advance_rungs(i, xs_l, logp_l, logq_l, ls_l, count_cold=None):
            """Advance every rung one MH step (walk/HMC or independence)
            in place; returns the cold-rung accept block when asked."""
            cold_accept = None
            for t in range(n_temps):
                if independence:
                    xs, logp, logq, accept = ind_move(
                        i, t, tuple(xs_l[t]), logp_l[t], logq_l[t]
                    )
                    logq_l[t] = logq
                else:
                    scale = jnp.exp(ls_l[t]) if rw_adapt else 1.0
                    xs, logp, accept, _ = rung_move(
                        i, t, tuple(xs_l[t]), logp_l[t], scale
                    )
                xs_l[t] = list(xs)
                logp_l[t] = logp
                if t == 0:
                    cold_accept = accept
            return cold_accept

        if rw_adapt:
            ls0 = [zero_block for _ in range(n_temps)]

            def burn_body(i, carry):
                xs_l, logp_l, logq_l, ls_l, extra = unflat(carry)
                sw = extra[0]
                i_f = jnp.full((rows, LANES), i + 1, jnp.int32).astype(
                    jnp.float32
                )
                gamma = jnp.exp(jnp.float32(-0.6) * jnp.log(i_f))
                for t in range(n_temps):
                    xs, logp, _, log_alpha = rung_move(
                        i, t, tuple(xs_l[t]), logp_l[t],
                        jnp.exp(ls_l[t]),
                    )
                    xs_l[t] = list(xs)
                    logp_l[t] = logp
                    alpha_p = jnp.exp(jnp.minimum(log_alpha, 0.0))
                    ls_l[t] = jnp.clip(
                        ls_l[t] + gamma * (alpha_p - rw_target),
                        _RW_LS_MIN,
                        _RW_LS_MAX,
                    )
                xs_l, logp_l, logq_l, sw = swap_all(
                    i, xs_l, logp_l, logq_l, sw
                )
                return flat(xs_l, logp_l, logq_l, ls_l, sw)

            carry = _unrolled_fori(
                0, n_burnin, burn_body,
                flat(xs_l, logp_l, [], ls0, zero_block), unroll_steps,
            )
            xs_l, logp_l, logq_l, ls_l, extra = unflat(carry)
            sw0 = extra[0]
            scales = [jnp.exp(ls) for ls in ls_l]
        else:

            def burn_body(i, carry):
                xs_l, logp_l, logq_l, ls_l, extra = unflat(carry)
                sw = extra[0]
                advance_rungs(i, xs_l, logp_l, logq_l, ls_l)
                xs_l, logp_l, logq_l, sw = swap_all(
                    i, xs_l, logp_l, logq_l, sw
                )
                return flat(xs_l, logp_l, logq_l, [], sw)

            carry = _unrolled_fori(
                0, n_burnin, burn_body,
                flat(xs_l, logp_l, logq_l, [], zero_block),
                unroll_steps,
            )
            xs_l, logp_l, logq_l, _, extra = unflat(carry)
            sw0 = extra[0]
            scales = [1.0] * n_temps

        ls_keep = [jnp.log(s) + zero_block for s in scales] if rw_adapt else []

        def body(i, carry):
            xs_l, logp_l, logq_l, ls_l, extra = unflat(carry)
            sw, n_acc = extra[0], extra[1]
            accs = extra[2 : 2 + k]
            hflat = extra[2 + k :]
            cold_accept = advance_rungs(i, xs_l, logp_l, logq_l, ls_l)
            n_acc = n_acc + cold_accept.astype(jnp.float32)
            xs_l, logp_l, logq_l, sw = swap_all(
                i, xs_l, logp_l, logq_l, sw
            )
            # Post-swap cold-rung state feeds the estimates, as on the
            # XLA path (the swap is part of the transition kernel).
            cold = tuple(xs_l[0])
            vals = [
                jnp.broadcast_to(
                    f(*cold).astype(jnp.float32), (rows, LANES)
                )
                for f in eval_fns
            ]
            if stat_mode:
                vals = [v - p for v, p in zip(vals, pilots)]
            accs = tuple(a + v for a, v in zip(accs, vals))
            if with_diagnostics:
                halves = (
                    hflat[0:k],
                    hflat[k : 2 * k],
                    hflat[2 * k : 3 * k],
                    hflat[3 * k : 4 * k],
                )
                halves = _splithalf_add(i, halves, vals, n_burnin, n1)
                hflat = tuple(b for grp in halves for b in grp)
            return flat(
                xs_l, logp_l, logq_l, ls_l, sw, n_acc, *accs, *hflat
            )

        carry = run_sampling(
            body,
            flat(
                xs_l, logp_l, logq_l, ls_keep, sw0, zero_block,
                *zero_accs, *zero_hflat,
            ),
        )
        _, _, _, _, extra = unflat(carry)
        sw, n_acc = extra[0], extra[1]
        accs = extra[2 : 2 + k]
        hflat = extra[2 + k :]

        col = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        row_out = jnp.zeros((1, LANES), jnp.float32)
        if stat_mode:
            # Per-program cold-rung stat block — the plain kernels'
            # layout with the swap count riding column k+1 of row 0.
            inv_steps = jnp.float32(1.0) / jnp.float32(max(n_steps, 1))
            row_ss = jnp.zeros((1, LANES), jnp.float32)
            row_mb = jnp.zeros((1, LANES), jnp.float32)
            for i, acc in enumerate(accs):
                cm = acc * inv_steps
                s1 = jnp.sum(cm)
                s2 = jnp.sum(cm * cm)
                mbs = s1 / n_block
                ss = jnp.maximum(s2 - n_block * mbs * mbs, 0.0)
                mb = mbs + pilots[i]
                row_out = jnp.where(col == i, n_block * mb, row_out)
                row_ss = jnp.where(col == i, ss, row_ss)
                row_mb = jnp.where(col == i, mb, row_mb)
            row_out = jnp.where(col == k, jnp.sum(n_acc), row_out)
            row_out = jnp.where(col == k + 1, jnp.sum(sw), row_out)
            extra_rows = []
            if with_diagnostics:
                halves = (
                    hflat[0:k],
                    hflat[k : 2 * k],
                    hflat[2 * k : 3 * k],
                    hflat[3 * k : 4 * k],
                )
                extra_rows = _diag_stat_rows(
                    halves, pilots, k, n1, n_block, col
                )
            out_ref[:, :] = jnp.concatenate(
                [row_out, row_ss, row_mb, *extra_rows,
                 jnp.zeros((5 - len(extra_rows), LANES), jnp.float32)],
                axis=0,
            )
        else:
            for i, acc in enumerate(accs):
                row_out = jnp.where(col == i, jnp.sum(acc), row_out)
            row_out = jnp.where(col == k, jnp.sum(n_acc), row_out)
            row_out = jnp.where(col == k + 1, jnp.sum(sw), row_out)
            out_ref[pl.ds(rep * local_programs + pid, 1), :] = row_out

    smem_seeds = pl.BlockSpec(
        (1, seed_batch), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    smem_scalar = pl.BlockSpec(
        (1, 1), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    prop_w = 2 if independence else 4
    smem_prop = pl.BlockSpec(
        (d, prop_w), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    td = d if targ_kinds is not None else 1
    smem_targ = pl.BlockSpec(
        (td, 2), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    smem_grid = pl.BlockSpec(
        (1, 4), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    stat_mode_outer = with_stderr or with_diagnostics

    def pallas_sweep(seed_a, prop_a, targ_a, pid_base, tabs):
        in_specs = [smem_seeds, smem_prop, smem_targ, smem_scalar]
        in_specs += [vmem, vmem] * len(prop_custom_dims)
        in_specs += [vmem, vmem, smem_grid] * len(targ_custom_dims)
        out_rows = seed_batch * local_programs
        if stat_mode_outer:
            # Per-grid-step (8, LANES) stat blocks (the plain kernels'
            # streaming layout).
            total_rows = 8 * out_rows
            out_specs = pl.BlockSpec(
                (8, LANES),
                lambda r, i: (r * local_programs + i, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            total_rows = out_rows
            out_specs = pl.BlockSpec(
                (total_rows, LANES),
                lambda r, i: (0, 0),
                memory_space=pltpu.VMEM,
            )
        out_shape = jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32)
        scratch_shapes = ()
        if with_samples:
            # Cold-rung draws stream by DMA into an ANY-space (HBM)
            # output; only the (rows, LANES) staging block costs VMEM.
            out_specs = (out_specs, pl.BlockSpec(memory_space=pl.ANY))
            out_shape = (
                out_shape,
                jax.ShapeDtypeStruct(
                    (with_samples * d * local_programs * rows, LANES),
                    jnp.float32,
                ),
            )
            scratch_shapes = (
                pltpu.VMEM((rows, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
            )
        out = pl.pallas_call(
            kernel,
            grid=(seed_batch, local_programs),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(seed_a, prop_a, targ_a, pid_base, *tabs)
        samp = ()
        if with_samples:
            # (m * d * P * rows, LANES) -> (m, d, local_chains): the XLA
            # tempering sweep's buffer layout (api transposes outside).
            out, samp_raw = out
            samp = (samp_raw.reshape(with_samples, d, -1),)
        if stat_mode_outer:
            grouped = out.reshape(seed_batch, local_programs, 8, LANES)
            sums = jnp.sum(grouped[:, :, 0, :], axis=1)  # (R, LANES)
            ret = (
                sums[:, :k],  # chain-MEAN sums
                sums[:, k],
                sums[:, k + 1],
                grouped[:, :, 1, :k],  # (R, P, K) per-program SS
                grouped[:, :, 2, :k],  # (R, P, K) per-program centroids
            )
            if with_diagnostics:
                ret = ret + (
                    jnp.sum(grouped[:, :, 3, :k], axis=1),  # seq sums
                    grouped[:, :, 4, :k],  # per-program seq SS
                    grouped[:, :, 5, :k],  # per-program seq centroids
                    jnp.sum(grouped[:, :, 6, :k], axis=1),  # within-var
                )
            return ret + samp
        totals = jnp.sum(
            out.reshape(seed_batch, local_programs, LANES), axis=1
        )
        return (totals[:, :k], totals[:, k], totals[:, k + 1]) + samp

    denom_vals = jnp.float32(chains_actual) * jnp.float32(n_steps)
    denom_acc = jnp.float32(chains_actual) * jnp.float32(max(n_steps, 1))
    denom_sw = jnp.float32(max(attempted, 1.0))
    chains_f = jnp.float32(chains_actual)
    block_f = jnp.float32(rows * LANES)

    def _shape(*outs):
        if seed_batch == 1:
            outs = tuple(o[0] for o in outs)
        return outs

    def _stderr_of(ss_total):
        var = ss_total / jnp.maximum(chains_f - 1.0, 1.0)
        return jnp.sqrt(var / chains_f)

    def _chan_combine(values, ss, mb):
        # Total SS around the global mean (this device's programs; psum
        # outside on a mesh).  Batched shapes: values (R, K), ss/mb
        # (R, P, K) — the plain kernels' recombination.
        corr = block_f * (mb - values[:, None, :]) ** 2
        return jnp.sum(ss + corr, axis=1)

    def _stat_outs(out, psum=None):
        """(values, acc, swap[, stderr][, r_hat, ess]) from a stat-mode
        sweep's outputs; psum is the mesh reducer (identity off-mesh)."""
        p = psum if psum is not None else (lambda v: v)
        sums, n_acc, sw, ss, mb = out[:5]
        values = p(sums) / chains_f
        acc = p(n_acc) / denom_acc
        sw_rate = p(sw) / denom_sw
        res = (values, acc, sw_rate)
        if with_stderr:
            ss_total = p(_chan_combine(values, ss, mb))
            res = res + (_stderr_of(ss_total),)
        if with_diagnostics:
            shaped = _shape(*res)
            return shaped + _diag_combine(
                out[5], out[6], out[7], out[8],
                chains_f, block_f, chains_actual, n_steps, psum=psum,
            )
        return _shape(*res)

    def _prep(seed, prop_params, targ_params, targ_lx, targ_lp,
              prop_inv=()):
        seed_a = jnp.asarray(seed, jnp.int32).reshape(1, seed_batch)
        prop_a = jnp.asarray(prop_params, jnp.float32).reshape(d, prop_w)
        targ_a = jnp.asarray(targ_params, jnp.float32).reshape(td, 2)
        tabs = ()
        for t in prop_inv:
            # CUSTOM proposal dims' (value, dx) inverse pairs, dim order
            # (downsampled by the api layer — sampler-mode logq keeps MH
            # exact at any inverse resolution).
            tabs += tuple(
                prep_inv_table(jnp.asarray(t, jnp.float32))
            )
        if targ_custom_dims:
            # One (lx, lp) per CUSTOM dim, dim order; single arrays
            # (the 1-D legacy signature) normalize to 1-tuples.
            lxs = (
                tuple(targ_lx)
                if isinstance(targ_lx, (tuple, list))
                else (targ_lx,)
            )
            lps = (
                tuple(targ_lp)
                if isinstance(targ_lp, (tuple, list))
                else (targ_lp,)
            )
            for lx, lp in zip(lxs, lps):
                tabs += tuple(
                    pad_uniform_table(
                        jnp.asarray(lx, jnp.float32),
                        jnp.asarray(lp, jnp.float32),
                        LOG_PDF_FLOOR,
                    )
                )
        return seed_a, prop_a, targ_a, tabs

    if mesh is None:

        @jax.jit
        def run(seed, prop_params, targ_params, targ_lx, targ_lp,
                prop_inv=()):
            seed_a, prop_a, targ_a, tabs = _prep(
                seed, prop_params, targ_params, targ_lx, targ_lp,
                prop_inv,
            )
            base = jnp.zeros((1, 1), jnp.int32)
            out = pallas_sweep(seed_a, prop_a, targ_a, base, tabs)
            samp = ()
            if with_samples:
                out, samp = out[:-1], (out[-1],)
            if with_stderr or with_diagnostics:
                return _stat_outs(out) + samp
            sums, n_acc, sw = out
            return _shape(
                sums / denom_vals,
                n_acc / denom_acc,
                sw / denom_sw,
            ) + samp

        return run

    replicated = P()

    def sharded_body(seed_a, prop_a, targ_a, *tabs):
        dev = jax.lax.axis_index(axis_name)
        base = (dev * local_programs).astype(jnp.int32).reshape(1, 1)
        out = pallas_sweep(seed_a, prop_a, targ_a, base, tabs)
        samp = ()
        if with_samples:
            out, samp = out[:-1], (out[-1],)
        if with_stderr or with_diagnostics:
            return _stat_outs(
                out, psum=lambda v: jax.lax.psum(v, axis_name)
            ) + samp
        sums, n_acc, sw = out
        return _shape(
            jax.lax.psum(sums, axis_name) / denom_vals,
            jax.lax.psum(n_acc, axis_name) / denom_acc,
            jax.lax.psum(sw, axis_name) / denom_sw,
        ) + samp

    n_tabs = 2 * len(prop_custom_dims) + 3 * len(targ_custom_dims)
    out_specs = (replicated, replicated, replicated)
    if with_stderr:
        out_specs = out_specs + (replicated,)
    if with_diagnostics:
        out_specs = out_specs + (replicated, replicated)
    if with_samples:
        # (m, d, local_chains) per device, chain-sharded on the last axis.
        out_specs = out_specs + (P(None, None, axis_name),)
    shard_mapped = jax.shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(replicated,) * (3 + n_tabs),
        out_specs=out_specs,
        check_vma=False,
    )

    @jax.jit
    def run(seed, prop_params, targ_params, targ_lx, targ_lp,
            prop_inv=()):
        seed_a, prop_a, targ_a, tabs = _prep(
            seed, prop_params, targ_params, targ_lx, targ_lp, prop_inv
        )
        return shard_mapped(seed_a, prop_a, targ_a, *tabs)

    return run
