"""Multi-dimensional independence-sampler MH kernel (Pallas/Mosaic).

The kernel-speed tier of the nd MCMC family (ops/mcmc_nd.py is the
portable XLA sweep): chains live one-per-lane with a d-vector state —
d carried (rows, 128) VMEM blocks plus the cached (log_p, log_q) pair —
and a burn-in/sampling split ``fori_loop`` advances all of them with the
exact MH semantics of the 1-D kernel (ops/mcmc_pallas.py): acceptance
``log u < log_p(x') + log_q(x) - log_p(x) - log_q(x')`` with
``log_q = sum_j log q_j(x_j)`` over independent proposal dimensions,
burn-in advanced but not accumulated, f(current x) added every sampling
step, per-chain mean ``/ n_steps``, unweighted chain average.

Targets: a PRODUCT of per-dimension families (log-densities summed
in-kernel — closed forms for analytic families, uniform-grid log-table
lane-gathers for CUSTOM dims, the 1-D kernel's machinery per dimension)
or an arbitrary traced JOINT log-density f(x_1..x_d) evaluated directly
on the lane blocks — the capability the strictly 1-D reference cannot
express at any speed (its MCMC binds one target Distribution per
program, src/shader_gen.rs:496-509).  CUSTOM proposal dimensions sample
through their inverse-CDF tables (gap-respecting tables for
exact_inverse dims) and evaluate q through the guarded log table, like
the 1-D kernel (reference table conventions:
src/distribution.rs:367-475); callers must ensure uniform log-pdf
x-grids per CUSTOM dim (api/device.py's pipelines).

``with_stderr``: between-chain variance exactly as the 1-D kernel —
pilot-shifted accumulators (pilot = per-program mean of f over the init
draw), per-program (chain-mean sums, SS, centroid) stat rows written to
per-grid-step (8, 128) blocks, Chan-recombined across programs/devices.

RNG: one hardware-PRNG stream per program (CounterRng in the interpreter
tier); dimension j draws under tag j, so counter streams stay distinct
per (step purpose, dimension) — the nd form of the reference's
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
)
from .integrate_pallas import prep_inv_table
from .mcmc_pallas import (
    UNROLL_STEPS,
    _diag_combine,
    _diag_stat_rows,
    _log_pdf,
    _log_pdf_grad,
    _pad_log_table,
    _sample_chain_block,
    _splithalf_add,
    _unrolled_fori,
    plan_mcmc_grid,
)

__all__ = [
    "build_mcmc_nd_pallas",
    "mcmc_nd_pallas_supports",
    "mcmc_nd_vmem_fits",
]

from ..sampling import ANALYTIC_KINDS as _ANALYTIC

# Seed-word mix distinguishing the nd MCMC stream family from both the
# integrate kernels' and the 1-D MCMC kernel's (0x5BD1E995) families.
_ND_STREAM_MIX = 0x27D4EB2F


def mcmc_nd_pallas_supports(
    prop_kinds: Sequence[DistKind],
    targ_kinds: Optional[Sequence[DistKind]],
) -> bool:
    """Every family runs in-kernel per dimension — analytic kinds via
    their closed forms, CUSTOM via the 1-D kernel's table lookups (the
    caller must additionally ensure uniform log-pdf x-grids and
    table fidelity per CUSTOM dim, exactly as for the 1-D kernel); the
    target is either a per-dim product (kinds given) or a joint traced
    fn (kinds None — fn checks happen at the call site)."""
    kinds_ok = _ANALYTIC + (DistKind.CUSTOM,)
    if not all(k in kinds_ok for k in prop_kinds):
        return False
    if targ_kinds is not None and not all(
        k in kinds_ok for k in targ_kinds
    ):
        return False
    return True


def mcmc_nd_vmem_fits(
    k: int,
    d: int,
    rows: int,
    local_programs: int,
    budget_bytes: int = 16 * 1024 * 1024,
    with_stderr: bool = False,
    hmc: bool = False,
    with_samples: bool = False,
    table_bytes: int = 0,
    with_diagnostics: bool = False,
) -> bool:
    """Conservative VMEM estimate, same model as the 1-D gate
    (mcmc_pallas.mcmc_vmem_fits): d carried state blocks + (log_p,
    log_q) + K accumulators + accept count, d proposal temporaries +
    (log_p', log_q', u), doubled for Mosaic's scoped temporaries, plus
    the output buffer and the VMEM-resident CUSTOM-dim tables
    (``table_bytes``, sized by the caller)."""
    blocks = 2 * d + k + 6
    if with_stderr:
        blocks += 1  # end-of-kernel chain-means temporary
    if with_diagnostics:
        blocks += 4 * k  # split-half (sum, sum-of-squares) pairs
    if hmc:
        blocks += 3 * d  # leapfrog (position, momentum, gradient) tuples
    if with_samples:
        blocks += 1  # draw staging block (DMA-streamed, VMEM-flat in m*d)
    est = 2 * blocks * rows * LANES * 4
    if with_stderr or with_diagnostics:
        est += 2 * 8 * LANES * 4  # double-buffered per-step stat blocks
    else:
        est += local_programs * LANES * 4
    est += table_bytes
    return est <= budget_bytes


def build_mcmc_nd_pallas(
    eval_fns: Sequence[Callable],
    prop_kinds: Sequence[DistKind],
    n_steps: int,
    n_burnin: int,
    total_chains: int,
    targ_kinds: Optional[Sequence[DistKind]] = None,
    target_logpdf_fn: Optional[Callable] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    axis_name: str = "mc",
    interpret: bool = False,
    with_stderr: bool = False,
    seed_batch: int = 1,
    param_batch: bool = False,
    random_walk: bool = False,
    rw_adapt: bool = False,
    rw_d: int = 0,
    hmc_leapfrog: int = 0,
    with_samples: int = 0,
    prop_gapped: Sequence[bool] = (),
    with_diagnostics: bool = False,
):
    """Build a jitted nd MH kernel program.

    Returned signature (the kernel subset of the XLA nd builder's —
    api passes only what the kernel consumes)::

        (seed, prop_params_t, targ_params_t,
         prop_inv_tables, targ_log_tables, prop_log_tables)
        -> ((K,) estimates, () acceptance_rate [, (K,) stderr])

    ``prop_params_t``/``targ_params_t`` are d-tuples of (2,) family
    parameter arrays; ``targ_params_t`` is () for joint-fn targets.

    CUSTOM dims run fully in-kernel via the 1-D kernel's table
    machinery (per-dim inverse-CDF sampling + uniform-grid log-table
    lookups, src/distribution.rs:367-475 conventions): the three
    trailing table args carry — in DIMENSION order, one entry per
    CUSTOM dim — the proposal inverse-CDF tables (``(x_table,)``
    flat m-knot arrays, or host-built gap-respecting ``(value, slope)``
    pairs for the dims flagged in ``prop_gapped``), the target-dim
    uniform (log_x, log_pdf) pairs, and the GAPPED proposal dims'
    guarded (log_x, log_pdf) pairs — non-gapped proposal dims run
    sampler-mode logq (the draw's own slope is the exact sampling
    density; see mcmc_pallas._sample_chain_block) and stage no
    q-table.  Analytic dims contribute no entries.
    ``prop_gapped`` has one flag per CUSTOM proposal dim (in dim
    order); HMC product targets take the per-dim gradient — closed
    forms for analytic dims, the table interpolant's gathered slope
    for CUSTOM dims (mcmc_pallas._log_pdf_grad).

    ``seed_batch=R``: the seed arg becomes an (R,) vector and the
    program returns ((R, K), (R,)[, (R, K)]) — R independent nd MCMC
    runs batched as a leading grid dimension (traced once), each seeded
    exactly like its unbatched call (the 1-D kernel's serving design,
    ops/mcmc_pallas.py).

    ``param_batch=True`` (product-analytic targets only): the
    ``prop_params_t``/``targ_params_t`` args become (R, d, 2) arrays —
    each batch element runs its OWN per-dimension (proposal, target)
    parameter rows, SMEM-resident as (R*d, 2) and indexed per grid rep,
    so one program serves a whole d-dimensional posterior/tempering
    sweep per dispatch.  In-kernel error bars compose: each rep's pilot
    comes from its own init draw under its own parameters.  With
    ``random_walk=True`` the prop array is (R, d, 4) RandomWalk rows
    instead — one walk (steps, init ranges, target acceptance) per rep.

    ``random_walk=True`` (see distributions.RandomWalk / ops/mcmc_nd.py):
    random-walk MH in-kernel — ``x'_j = x_j + step_j * z_j`` with
    ``z ~ N(0, I)``, the symmetric density cancelling from the
    acceptance ratio.  ``prop_kinds`` is then ``()`` and ``rw_d`` fixes
    the dimension count; the prop params arg becomes the (d, 4) rows
    ``(step_j, init_lo_j, init_hi_j, target_accept)`` and fresh chains
    initialise uniformly over the per-dimension init ranges.
    ``rw_adapt=True`` carries ONE per-chain log-scale block multiplying
    the whole step vector, Robbins-Monro-updated toward
    ``target_accept`` through burn-in and frozen for sampling (the 1-D
    kernel's update, ops/mcmc_pallas.py).

    ``hmc_leapfrog=L`` (with ``random_walk=True``; distributions.HMC):
    nd Hamiltonian Monte Carlo fully IN-KERNEL — per-chain d-vector
    momenta, L kick-drift-kick leapfrog steps with per-dimension steps
    as a diagonal mass matrix, exact Metropolis energy correction.  The
    position gradient is ``jax.grad`` of the summed log-density traced
    into the kernel — closed forms for analytic product targets AND
    traced joint log-density fns (both gather-free elementwise Mosaic
    ops); table targets route to the XLA sweep at the call site.

    ``with_samples=m`` (unbatched; ``1 <= m <= n_steps``): the program
    additionally returns — LAST — an ``(m, d, chains_actual)`` float32
    array of thinned post-burn-in d-vector draws at sampling steps
    ``n_burnin + j * (n_steps // m)`` (the XLA nd builder's buffer
    layout; the api surfaces it transposed as (m, chains, d)).  Each
    hit DMA-streams the d per-dimension (rows, 128) chain blocks from a
    VMEM staging block to the ANY-space output, so VMEM stays flat in
    ``m * d`` and the estimates are bit-identical to the samples-free
    kernel (the 1-D kernel's streaming design, ops/mcmc_pallas.py).
    """
    if (targ_kinds is None) == (target_logpdf_fn is None):
        raise ValueError(
            "exactly one of targ_kinds (product target) or "
            "target_logpdf_fn (joint target) must be given"
        )
    prop_kinds = tuple(prop_kinds)
    d = rw_d if random_walk else len(prop_kinds)
    if random_walk and d <= 0:
        raise ValueError("random_walk needs rw_d (the dimension count)")
    if targ_kinds is not None:
        targ_kinds = tuple(targ_kinds)
        if len(targ_kinds) != d:
            raise ValueError("targ_kinds must match the proposal dims")
    if not mcmc_nd_pallas_supports(prop_kinds, targ_kinds):
        raise ValueError(
            "nd Pallas MCMC supports analytic and CUSTOM table "
            "families only"
        )
    if param_batch and targ_kinds is None:
        raise ValueError(
            "param_batch needs a product-analytic target (a joint "
            "log-density function carries no runtime parameters)"
        )
    prop_custom_dims = tuple(
        j for j, kk in enumerate(prop_kinds) if kk == DistKind.CUSTOM
    )
    targ_custom_dims = tuple(
        j
        for j, kk in enumerate(targ_kinds or ())
        if kk == DistKind.CUSTOM
    )
    if param_batch and (prop_custom_dims or targ_custom_dims):
        raise ValueError(
            "param_batch applies to analytic families only (CUSTOM "
            "dims carry tables, not runtime parameter words)"
        )
    prop_gapped = tuple(bool(g) for g in prop_gapped) or (False,) * len(
        prop_custom_dims
    )
    if len(prop_gapped) != len(prop_custom_dims):
        raise ValueError(
            "prop_gapped needs one flag per CUSTOM proposal dimension"
        )
    # Sampler-mode proposal log-density for non-gapped CUSTOM dims:
    # these dims' logq contributions come from the draw's own gathered
    # slope (the exact density of the inverse-table sampler — see
    # mcmc_pallas._sample_chain_block) instead of a per-step x-space
    # log-table segment scan.  The nd kernel is stateless-only, so no
    # resume-consistency carve-out is needed (cf. the 1-D builder).
    sampler_dims = frozenset(
        j
        for j, gap in zip(prop_custom_dims, prop_gapped)
        if not gap
    )
    if with_samples:
        # Seed batches compose (round 5): the draw DMA offset gains the
        # grid-rep index and the output grows a leading (R,) axis.
        if param_batch:
            raise ValueError(
                "with_samples does not compose with nd param_batch"
            )
        if not 1 <= int(with_samples) <= n_steps:
            raise ValueError(
                f"with_samples must be in [1, n_steps={n_steps}], got "
                f"{with_samples}"
            )
    if with_diagnostics:
        if seed_batch != 1 or param_batch:
            raise ValueError(
                "with_diagnostics applies to unbatched nd MCMC "
                "programs only"
            )
        if n_steps < 4:
            raise ValueError("with_diagnostics needs n_steps >= 4")
    sample_stride = n_steps // with_samples if with_samples else 0
    k = len(eval_fns)
    if k >= LANES:
        raise ValueError(f"at most {LANES - 1} fused functions supported")
    from .fast_math import kernelize

    eval_fns = tuple(kernelize(f) for f in eval_fns)
    if target_logpdf_fn is not None:
        target_logpdf_fn = kernelize(target_logpdf_fn)

    # HMC inlines L leapfrog grad evals per MH step; dividing the step
    # unroll by L keeps the kernel body at the plain walk's scale
    # (the 1-D kernel's convention).
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
    td = d if targ_kinds is not None else 1  # dummy (1, 2) when joint

    rng_factory = CounterRng if interpret else HardwareRng

    def kernel(seed_ref, prop_ref, targ_ref, pid_base_ref, *rest):
        rest = list(rest)
        # CUSTOM-dim table refs, dim order: proposal inverse-CDF
        # (value, slope/dx) pairs, then target log-table trios, then
        # proposal log-table trios (the 1-D kernel's arg order).
        prop_inv = {}
        for j in prop_custom_dims:
            prop_inv[j] = (rest.pop(0), rest.pop(0))
        targ_tab = {}
        for j in targ_custom_dims:
            targ_tab[j] = (rest.pop(0), rest.pop(0), rest.pop(0))
        prop_tab = {}
        for j in prop_custom_dims:
            # Sampler-mode dims stage no q-table (logq rides the draw).
            if j not in sampler_dims:
                prop_tab[j] = (rest.pop(0), rest.pop(0), rest.pop(0))
        out_ref = rest.pop(0)
        if with_samples:
            samp_ref, samp_stage, samp_sem = rest
        rep = pl.program_id(0)
        pid = pl.program_id(1)
        rng = rng_factory()
        rng.seed(
            seed_ref[0, rep] ^ _ND_STREAM_MIX, pid_base_ref[0, 0] + pid
        )
        pbase = rep * d if param_batch else 0
        if random_walk:
            # Per-dimension (step, init_lo, init_hi, target_accept) rows
            # (this grid rep's own d-row slice when param-batched).
            rw_steps = [prop_ref[pbase + j, 0] for j in range(d)]
            rw_los = [prop_ref[pbase + j, 1] for j in range(d)]
            rw_his = [prop_ref[pbase + j, 2] for j in range(d)]
            rw_target = prop_ref[pbase, 3]
        else:
            qp = [
                (prop_ref[pbase + j, 0], prop_ref[pbase + j, 1])
                for j in range(d)
            ]
        if targ_kinds is not None:
            tp = [
                (targ_ref[pbase + j, 0], targ_ref[pbase + j, 1])
                for j in range(d)
            ]

        def sample_all(counter):
            if random_walk:
                # Overdispersed per-dimension uniform init (only the
                # init draw routes here for a random walk).
                return tuple(
                    rw_los[j]
                    + (rw_his[j] - rw_los[j])
                    * _uniform_halfopen01(
                        rng, (rows, LANES), counter, j
                    )
                    for j in range(d)
                )
            return tuple(
                _sample_chain_block(
                    prop_kinds[j], *qp[j], rows, rng, counter,
                    inv=prop_inv.get(j), tag=j,
                )
                for j in range(d)
            )

        def sample_all_lq(counter):
            """Independence-path draw: (xs, summed sampler-mode logq
            over the sampler dims, or None when there are none).  Same
            RNG calls in the same order as sample_all."""
            xs, lq = [], None
            for j in range(d):
                if j in sampler_dims:
                    x, l = _sample_chain_block(
                        prop_kinds[j], *qp[j], rows, rng, counter,
                        inv=prop_inv.get(j), tag=j, with_logq=True,
                    )
                    lq = l if lq is None else lq + l
                else:
                    x = _sample_chain_block(
                        prop_kinds[j], *qp[j], rows, rng, counter,
                        inv=prop_inv.get(j), tag=j,
                    )
                xs.append(x)
            return tuple(xs), lq

        def lp_t(xs):
            if target_logpdf_fn is not None:
                return jnp.broadcast_to(
                    target_logpdf_fn(*xs).astype(jnp.float32),
                    (rows, LANES),
                )
            tot = None
            for j in range(d):
                lp = _log_pdf(
                    targ_kinds[j], *tp[j], xs[j], rows, targ_tab.get(j)
                )
                tot = lp if tot is None else tot + lp
            return tot

        def lp_q_rest(xs):
            """Proposal log-density over the NON-sampler dims (analytic
            closed forms + gapped-table lookups); sampler dims' terms
            ride in from the draw itself."""
            tot = None
            for j in range(d):
                if j in sampler_dims:
                    continue
                lq = _log_pdf(
                    prop_kinds[j], *qp[j], xs[j], rows, prop_tab.get(j)
                )
                tot = lq if tot is None else tot + lq
            return tot

        def _add_lq(lq_draw, lq_rest):
            if lq_draw is None:
                return lq_rest
            if lq_rest is None:
                return lq_draw
            return lq_draw + lq_rest

        if random_walk:
            xs0 = sample_all(0)
        else:
            xs0, lq0_draw = sample_all_lq(0)
        logp0 = lp_t(xs0)
        if not random_walk:
            logq0 = _add_lq(lq0_draw, lp_q_rest(xs0))

        n_block = jnp.float32(rows * LANES)
        stat_mode = with_stderr or with_diagnostics
        n1 = n_steps // 2  # split-half length (odd last step excluded)
        if stat_mode:
            # Per-program accumulation pilot from the init draw, exactly
            # the 1-D kernel's design (restored via Chan recombination in
            # the wrapper).
            pilots = [
                jnp.sum(
                    jnp.broadcast_to(
                        f(*xs0).astype(jnp.float32), (rows, LANES)
                    )
                )
                / n_block
                for f in eval_fns
            ]

        def accumulate(i, accs, halves, xs):
            vals = [
                jnp.broadcast_to(
                    f(*xs).astype(jnp.float32), (rows, LANES)
                )
                for f in eval_fns
            ]
            if stat_mode:
                vals = [v - p for v, p in zip(vals, pilots)]
            accs = tuple(a + v for a, v in zip(accs, vals))
            if with_diagnostics:
                halves = _splithalf_add(i, halves, vals, n_burnin, n1)
            return accs, halves

        if with_samples:

            def write_draw(j, xs):
                # Thinned d-vector draw at sampling step n_burnin +
                # j*stride: stage each dimension's (rows, 128) chain
                # block and DMA it to the ANY-space output at the
                # (draw, dim, program) row offset (the 1-D kernel's
                # streaming design — VMEM-flat, RNG untouched).
                for dim in range(d):
                    samp_stage[...] = xs[dim]
                    cp = pltpu.make_async_copy(
                        samp_stage,
                        samp_ref.at[
                            pl.ds(
                                (
                                    (
                                        (rep * with_samples + j) * d
                                        + dim
                                    )
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
            """Sampling-phase loop, segmented under with_samples so the
            draw DMA runs unconditionally once per stride instead of a
            per-step pl.when (which measured ~20x slower in the 1-D
            kernel — the conditional semaphore ops serialize the
            unrolled iteration).  Step order identical to the plain
            loop; estimates bit-equal."""
            if not with_samples:
                return _unrolled_fori(
                    n_burnin, n_iters, body, carry0, unroll
                )
            from .mcmc_pallas import _unrolled_fori_offset

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
                carry = _unrolled_fori(done, n_iters, body, carry, unroll)
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

        # Burn-in advances the chains without touching the K integrands
        # or the accept counter; the iteration index runs through both
        # phases and each phase draws the same blocks per iteration, so
        # the streams are identical to a fused single loop.
        if random_walk:
            from ..sampling import normal_from_u01
            from .mcmc_pallas import _RW_LS_MAX, _RW_LS_MIN

            if hmc_leapfrog:
                if target_logpdf_fn is not None:
                    # Elementwise gradient tuple of the traced joint
                    # log-density (gather-free elementwise Mosaic ops).
                    grad_lp = jax.grad(lambda xv: jnp.sum(lp_t(xv)))
                else:
                    # Product target: per-dimension gradients — closed
                    # forms for analytic dims, the log-table
                    # interpolant's gathered slope for CUSTOM dims
                    # (mcmc_pallas._log_pdf_grad, the same gradient
                    # field the XLA backend's autodiff follows).
                    def grad_lp(xv):
                        return tuple(
                            _log_pdf_grad(
                                targ_kinds[j], *tp[j], xv[j], rows,
                                targ_tab.get(j),
                            )
                            for j in range(d)
                        )

                def rw_move(i, xs, logp, scale):
                    # nd leapfrog: fresh d-vector momenta (dimension j
                    # draws under tag j, the walk's stream layout),
                    # per-dimension steps as a diagonal mass matrix,
                    # exact energy-corrected accept.
                    z = tuple(
                        normal_from_u01(
                            _uniform_halfopen01(
                                rng, (rows, LANES), 3 * i + 1, j
                            )
                        )
                        for j in range(d)
                    )
                    eps = [scale * rw_steps[j] for j in range(d)]
                    xq, p, g = xs, z, grad_lp(xs)
                    for _ in range(hmc_leapfrog):
                        p = tuple(
                            p[j] + 0.5 * eps[j] * g[j] for j in range(d)
                        )
                        xq = tuple(
                            xq[j] + eps[j] * p[j] for j in range(d)
                        )
                        g = grad_lp(xq)
                        p = tuple(
                            p[j] + 0.5 * eps[j] * g[j] for j in range(d)
                        )
                    logp_prop = lp_t(xq)
                    kin0 = z[0] * z[0]
                    kinf = p[0] * p[0]
                    for j in range(1, d):
                        kin0 = kin0 + z[j] * z[j]
                        kinf = kinf + p[j] * p[j]
                    log_alpha = (logp_prop - 0.5 * kinf) - (
                        logp - 0.5 * kin0
                    )
                    # Diverged trajectories reject rather than NaN-poison
                    # the adaptation (NaN != NaN).
                    log_alpha = jnp.where(
                        log_alpha != log_alpha,
                        jnp.float32(-3.0e38),
                        log_alpha,
                    )
                    u = _uniform_open01(rng, (rows, LANES), 3 * i + 2, 0)
                    accept = jnp.log(u) < log_alpha
                    xs = tuple(
                        jnp.where(accept, xq_j, x_j)
                        for xq_j, x_j in zip(xq, xs)
                    )
                    logp = jnp.where(accept, logp_prop, logp)
                    return xs, logp, accept, log_alpha

            else:

                def rw_move(i, xs, logp, scale):
                    # Symmetric per-dimension Gaussian steps (dimension j
                    # draws under tag j); the q terms cancel.
                    xp = tuple(
                        x_j
                        + scale
                        * rw_steps[j]
                        * normal_from_u01(
                            _uniform_halfopen01(
                                rng, (rows, LANES), 3 * i + 1, j
                            )
                        )
                        for j, x_j in enumerate(xs)
                    )
                    logp_prop = lp_t(xp)
                    log_alpha = logp_prop - logp
                    u = _uniform_open01(rng, (rows, LANES), 3 * i + 2, 0)
                    accept = jnp.log(u) < log_alpha
                    xs = tuple(
                        jnp.where(accept, xp_j, x_j)
                        for xp_j, x_j in zip(xp, xs)
                    )
                    logp = jnp.where(accept, logp_prop, logp)
                    return xs, logp, accept, log_alpha

            if rw_adapt:
                # ONE per-chain log-scale multiplying the whole step
                # vector (relative per-dim scales preserved), tuned by
                # Robbins-Monro through burn-in and frozen for sampling
                # — the 1-D kernel's update, vector gamma_i = i^-0.6.
                def burn_body(i, carry):
                    xs, logp, ls = carry
                    xs, logp, _, log_alpha = rw_move(
                        i, xs, logp, jnp.exp(ls)
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
                    return (xs, logp, ls)

                xs0, logp0, ls_f = _unrolled_fori(
                    0, n_burnin, burn_body,
                    (xs0, logp0, zero_block), unroll_steps,
                )
                scale_fin = jnp.exp(ls_f)
            else:

                def burn_body(i, carry):
                    xs, logp = carry
                    xs, logp, _, _ = rw_move(i, xs, logp, 1.0)
                    return (xs, logp)

                xs0, logp0 = _unrolled_fori(
                    0, n_burnin, burn_body, (xs0, logp0), unroll_steps
                )
                scale_fin = 1.0

            def body(i, carry):
                xs, logp, accs, halves, n_acc = carry
                xs, logp, accept, _ = rw_move(i, xs, logp, scale_fin)
                accs, halves = accumulate(i, accs, halves, xs)
                n_acc = n_acc + accept.astype(jnp.float32)
                return (xs, logp, accs, halves, n_acc)

            _, _, accs, halves, n_acc = run_sampling(
                body,
                (xs0, logp0, zero_accs, zero_halves, zero_block),
                unroll_steps,
            )
        else:

            def mh_move(i, xs, logp, logq):
                xp, lq_draw = sample_all_lq(3 * i + 1)
                logp_prop = lp_t(xp)
                logq_prop = _add_lq(lq_draw, lp_q_rest(xp))
                log_alpha = logp_prop + logq - logp - logq_prop
                u = _uniform_open01(rng, (rows, LANES), 3 * i + 2, 0)
                accept = jnp.log(u) < log_alpha
                xs = tuple(
                    jnp.where(accept, xp_j, x_j)
                    for xp_j, x_j in zip(xp, xs)
                )
                logp = jnp.where(accept, logp_prop, logp)
                logq = jnp.where(accept, logq_prop, logq)
                return xs, logp, logq, accept

            def burn_body(i, carry):
                xs, logp, logq = carry
                xs, logp, logq, _ = mh_move(i, xs, logp, logq)
                return (xs, logp, logq)

            xs0, logp0, logq0 = _unrolled_fori(
                0, n_burnin, burn_body, (xs0, logp0, logq0), UNROLL_STEPS
            )

            def body(i, carry):
                xs, logp, logq, accs, halves, n_acc = carry
                xs, logp, logq, accept = mh_move(i, xs, logp, logq)
                accs, halves = accumulate(i, accs, halves, xs)
                n_acc = n_acc + accept.astype(jnp.float32)
                return (xs, logp, logq, accs, halves, n_acc)

            _, _, _, accs, halves, n_acc = run_sampling(
                body,
                (xs0, logp0, logq0, zero_accs, zero_halves, zero_block),
                UNROLL_STEPS,
            )

        col = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        row_out = jnp.zeros((1, LANES), jnp.float32)
        if stat_mode:
            # Per-program between-chain stats (chain-mean sums row, SS
            # row, centroid row [+ 4 split-half diagnostic rows] +
            # padding), per-grid-step (8, 128) output block — the 1-D
            # kernel's layout verbatim.
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
            extra_rows = []
            if with_diagnostics:
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
            out_ref[pl.ds(rep * local_programs + pid, 1), :] = row_out

    smem_seeds = pl.BlockSpec(
        (1, seed_batch), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    smem_scalar = pl.BlockSpec(
        (1, 1), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    smem_prop = pl.BlockSpec(
        (seed_batch * d if param_batch else d, 4 if random_walk else 2),
        lambda r, i: (0, 0),
        memory_space=pltpu.SMEM,
    )
    smem_targ = pl.BlockSpec(
        (seed_batch * td if param_batch else td, 2),
        lambda r, i: (0, 0),
        memory_space=pltpu.SMEM,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_grid = pl.BlockSpec(
        (1, 4), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    n_gapped = len(prop_custom_dims) - len(sampler_dims)
    table_specs = (
        [vmem, vmem] * len(prop_custom_dims)
        + [vmem, vmem, smem_grid] * len(targ_custom_dims)
        + [vmem, vmem, smem_grid] * n_gapped
    )

    stat_mode_outer = with_stderr or with_diagnostics

    def pallas_sweep(seed_a, prop_a, targ_a, pid_base, *tables):
        if stat_mode_outer:
            out_spec = pl.BlockSpec(
                (8, LANES),
                lambda r, i: (r * local_programs + i, 0),
                memory_space=pltpu.VMEM,
            )
            total_rows = 8 * seed_batch * local_programs
        else:
            out_spec = pl.BlockSpec(
                (seed_batch * local_programs, LANES),
                lambda r, i: (0, 0),
                memory_space=pltpu.VMEM,
            )
            total_rows = seed_batch * local_programs
        out_specs = out_spec
        out_shape = jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32)
        scratch_shapes = ()
        if with_samples:
            # Thinned d-vector draws stream by DMA into an ANY-space
            # (HBM) output; only the (rows, LANES) staging block costs
            # VMEM.
            out_specs = (out_spec, pl.BlockSpec(memory_space=pl.ANY))
            out_shape = (
                out_shape,
                jax.ShapeDtypeStruct(
                    (
                        seed_batch
                        * with_samples
                        * d
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
        out = pl.pallas_call(
            kernel,
            grid=(seed_batch, local_programs),
            in_specs=[smem_seeds, smem_prop, smem_targ, smem_scalar]
            + table_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(seed_a, prop_a, targ_a, pid_base, *tables)
        samp = ()
        if with_samples:
            # (R * m * d * P * rows, LANES) -> (m, d, local_chains)
            # unbatched / (R, m, d, local_chains) batched: the XLA nd
            # builder's buffer layout (api transposes outside).
            out, samp_raw = out
            if seed_batch == 1:
                samp = (samp_raw.reshape(with_samples, d, -1),)
            else:
                samp = (
                    samp_raw.reshape(seed_batch, with_samples, d, -1),
                )
        if stat_mode_outer:
            grouped = out.reshape(seed_batch, local_programs, 8, LANES)
            sums = jnp.sum(grouped[:, :, 0, :], axis=1)  # (R, LANES)
            ret = (
                sums[:, :k],
                sums[:, k],
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
        return (totals[:, :k], totals[:, k]) + samp

    denom_vals = jnp.float32(chains_actual) * jnp.float32(n_steps)
    denom_acc = jnp.float32(chains_actual) * jnp.float32(max(n_steps, 1))
    chains_f = jnp.float32(chains_actual)
    block_f = jnp.float32(rows * LANES)

    def _stderr_of(ss_total):
        var = ss_total / jnp.maximum(chains_f - 1.0, 1.0)
        return jnp.sqrt(var / chains_f)

    def _chan_combine(values, ss, mb):
        # Total SS around the global mean M over this device's programs:
        # sum_p [SS_p + n_p (mb_p - M)^2]; cross-device psum outside.
        # Batched shapes: values (R, K), ss/mb (R, P, K).
        corr = block_f * (mb - values[:, None, :]) ** 2
        return jnp.sum(ss + corr, axis=1)

    def _shape(*outs):
        # Single-seed programs keep ((K,), scalar[, (K,)]); param-batched
        # programs always keep the batch axis, even at R=1.
        if seed_batch == 1 and not param_batch:
            outs = tuple(o[0] for o in outs)
        return outs

    def _prep_tables(prop_inv_t, targ_log_t, prop_log_t):
        """Host-passed CUSTOM-dim tables -> kernel-layout arrays: the
        inverse-CDF (value, dx) pairs ((SEGMENTS, 128), gapped pairs
        passed through) and the 128-padded uniform log-table trios."""
        prepped = []
        for entry, gap in zip(prop_inv_t, prop_gapped):
            if gap:
                t, dt = entry
                prepped += [
                    jnp.asarray(t, jnp.float32).reshape(-1, LANES),
                    jnp.asarray(dt, jnp.float32).reshape(-1, LANES),
                ]
            else:
                prepped += list(
                    prep_inv_table(jnp.asarray(entry[0], jnp.float32))
                )
        for lx, lp in tuple(targ_log_t) + tuple(prop_log_t):
            prepped += list(
                _pad_log_table(
                    jnp.asarray(lx, jnp.float32),
                    jnp.asarray(lp, jnp.float32),
                )
            )
        return tuple(prepped)

    def _prep(seed, prop_params_t, targ_params_t):
        seed_a = jnp.asarray(seed, jnp.int32).reshape(1, seed_batch)
        if param_batch:
            prop_a = jnp.asarray(prop_params_t, jnp.float32).reshape(
                seed_batch * d, 4 if random_walk else 2
            )
            targ_a = jnp.asarray(targ_params_t, jnp.float32).reshape(
                seed_batch * d, 2
            )
            return seed_a, prop_a, targ_a
        if random_walk:
            # One (d, 4) array of RandomWalk rows, not a d-tuple.
            prop_a = jnp.asarray(prop_params_t, jnp.float32).reshape(
                d, 4
            )
        else:
            prop_a = jnp.stack(
                [jnp.asarray(p, jnp.float32) for p in prop_params_t]
            ).reshape(d, 2)
        if targ_kinds is not None:
            targ_a = jnp.stack(
                [jnp.asarray(t, jnp.float32) for t in targ_params_t]
            ).reshape(d, 2)
        else:
            targ_a = jnp.zeros((1, 2), jnp.float32)
        return seed_a, prop_a, targ_a

    if mesh is None:

        @jax.jit
        def run(
            seed,
            prop_params_t,
            targ_params_t=(),
            prop_inv_tables=(),
            targ_log_tables=(),
            prop_log_tables=(),
        ):
            seed_a, prop_a, targ_a = _prep(
                seed, prop_params_t, targ_params_t
            )
            tables = _prep_tables(
                prop_inv_tables, targ_log_tables, prop_log_tables
            )
            base = jnp.zeros((1, 1), jnp.int32)
            out = pallas_sweep(seed_a, prop_a, targ_a, base, *tables)
            samp = ()
            if with_samples:
                out, samp = out[:-1], (out[-1],)
            if with_diagnostics:
                sums, n_acc, ss, mb = out[:4]
                values = sums / chains_f  # chain-MEAN sums
                res = (values[0], (n_acc / denom_acc)[0])
                if with_stderr:
                    res = res + (
                        _stderr_of(_chan_combine(values, ss, mb))[0],
                    )
                return res + _diag_combine(
                    out[4], out[5], out[6], out[7],
                    chains_f, block_f, chains_actual, n_steps,
                ) + samp
            if with_stderr:
                sums, n_acc, ss, mb = out
                values = sums / chains_f  # chain-MEAN sums
                ss_total = _chan_combine(values, ss, mb)
                return _shape(
                    values, n_acc / denom_acc, _stderr_of(ss_total)
                ) + samp
            sums, n_acc = out
            return _shape(sums / denom_vals, n_acc / denom_acc) + samp

        return run

    replicated = P()
    n_table_args = 2 * len(prop_custom_dims) + 3 * (
        len(targ_custom_dims) + n_gapped
    )

    def sharded_body(seed_a, prop_a, targ_a, *tables):
        dev = jax.lax.axis_index(axis_name)
        base = (dev * local_programs).astype(jnp.int32).reshape(1, 1)
        out = pallas_sweep(seed_a, prop_a, targ_a, base, *tables)
        samp = ()
        if with_samples:
            out, samp = out[:-1], (out[-1],)
        if with_diagnostics:
            sums, n_acc, ss, mb = out[:4]
            values = jax.lax.psum(sums, axis_name) / chains_f
            acc = jax.lax.psum(n_acc, axis_name) / denom_acc
            res = (values[0], acc[0])
            if with_stderr:
                ss_total = jax.lax.psum(
                    _chan_combine(values, ss, mb), axis_name
                )
                res = res + (_stderr_of(ss_total)[0],)
            return res + _diag_combine(
                out[4], out[5], out[6], out[7],
                chains_f, block_f, chains_actual, n_steps,
                psum=lambda v: jax.lax.psum(v, axis_name),
            ) + samp
        if with_stderr:
            sums, n_acc, ss, mb = out
            values = jax.lax.psum(sums, axis_name) / chains_f
            n_acc = jax.lax.psum(n_acc, axis_name) / denom_acc
            ss_total = jax.lax.psum(
                _chan_combine(values, ss, mb), axis_name
            )
            return _shape(values, n_acc, _stderr_of(ss_total)) + samp
        sums, n_acc = out
        return _shape(
            jax.lax.psum(sums, axis_name) / denom_vals,
            jax.lax.psum(n_acc, axis_name) / denom_acc,
        ) + samp

    out_specs = (replicated, replicated)
    if with_stderr:
        out_specs = out_specs + (replicated,)
    if with_diagnostics:
        out_specs = out_specs + (replicated, replicated)
    if with_samples:
        # (m, d, local_chains) per device, chain-sharded on the last
        # axis (leading (R,) axis when seed-batched).
        if seed_batch == 1:
            out_specs = out_specs + (P(None, None, axis_name),)
        else:
            out_specs = out_specs + (P(None, None, None, axis_name),)
    shard_mapped = jax.shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(replicated,) * (3 + n_table_args),
        out_specs=out_specs,
        check_vma=False,
    )

    @jax.jit
    def run(
        seed,
        prop_params_t,
        targ_params_t=(),
        prop_inv_tables=(),
        targ_log_tables=(),
        prop_log_tables=(),
    ):
        seed_a, prop_a, targ_a = _prep(seed, prop_params_t, targ_params_t)
        tables = _prep_tables(
            prop_inv_tables, targ_log_tables, prop_log_tables
        )
        return shard_mapped(seed_a, prop_a, targ_a, *tables)

    return run
