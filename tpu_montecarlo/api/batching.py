"""Seed/param batching: the (R,)-seed and (R, ...)-params handle
machinery, the pack_* builders users feed param-batched programs,
and shared argument validation for the batched entry points."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..distributions import Distribution, RandomWalk
from ..sampling import DistKind, dist_spec_of, ensure_param_batch_family
from ..wgsl_frontend import trace_wgsl_function


def _target_arity(target) -> int:
    """Dimension count of a joint log-density target for entry points
    where no per-dimension proposal list fixes d (RandomWalk proposals):
    WGSL strings carry their declared parameter count; Python callables
    expose theirs via ``inspect.signature`` (positional parameters)."""
    if isinstance(target, str):
        tf = trace_wgsl_function(target)
        return int(getattr(tf, "__tpu_mc_arity__", 1))
    import inspect

    try:
        sig = inspect.signature(target)
    except (TypeError, ValueError):
        raise TypeError(
            "cannot determine the dimension count of this joint "
            "log-density; pass a plain function of d positional "
            "arguments (or per-dimension proposal Distributions)"
        )
    kinds = [p.kind for p in sig.parameters.values()]
    if any(
        k in (inspect.Parameter.VAR_POSITIONAL, inspect.Parameter.VAR_KEYWORD)
        for k in kinds
    ):
        raise TypeError(
            "a joint log-density taking *args/**kwargs has no fixed "
            "dimension count; declare d positional arguments"
        )
    return sum(
        1
        for k in kinds
        if k
        in (
            inspect.Parameter.POSITIONAL_ONLY,
            inspect.Parameter.POSITIONAL_OR_KEYWORD,
        )
    )


def _check_random_walk_args(
    rw: RandomWalk, n_burnin: int, stateful: bool
) -> None:
    """Shared RandomWalk argument validation for the MCMC entry points:
    step adaptation happens during burn-in (so it needs one) and produces
    per-chain steps the checkpoint state does not carry (so adaptive
    runs are stateless-only; fixed-step random walks resume fine)."""
    name = type(rw).__name__  # RandomWalk or its HMC subclass
    if rw.adapt and n_burnin <= 0:
        raise ValueError(
            f"{name}(adapt=True) tunes the step during burn-in; "
            "pass n_burnin > 0 (or a fixed step_size with adapt=False)"
        )
    if rw.adapt and stateful:
        raise ValueError(
            f"{name}(adapt=True) is stateless-only: the adapted "
            "per-chain steps are not part of the checkpoint state.  "
            "Resume with a fixed step_size (adapt=False) instead"
        )


def _checked_batch_prog(dispatch, dev_args, seed_batch, n_param_args, param_kinds):
    """The shared (seeds, *params) handle shape of every param-batched
    program: validate/stage the batch args, then hand (seeds_arr,
    params_arrs, trailing dev args) to the path-specific ``dispatch``."""
    rest = tuple(dev_args[n_param_args:])

    def prog(seeds, *params):
        seeds_arr, params_arrs = _check_param_batch_args(
            seeds, params, seed_batch, n_param_args, param_kinds
        )
        return dispatch(seeds_arr, params_arrs, rest)

    return prog


def _check_param_batch_args(
    seeds, params, r: int, n_param_args: int = 1, param_kinds=()
):
    """Validate and device-stage the (seeds, params...) args of a
    param-batched program: (R,) uint32 seeds plus ``n_param_args``
    (R, 2) float32 family parameter arrays (see pack_param_batch).
    ``param_kinds``: the families the program was compiled for — a
    ``ParamBatch`` array packed for a different family is rejected
    (its rows would silently be reinterpreted, e.g. (min, max) read
    as (mean, std)); plain arrays skip the family check.  The sentinel
    kinds ``"rw"`` / ``"rw_adapt"`` mark a RandomWalk-proposal slot,
    whose rows are (R, 4) ``(step, init_lo, init_hi, target_accept)``
    packs (:func:`pack_random_walk_batch`) rather than (R, 2) family
    words; the adapt variant additionally pins the pack to a program
    compiled with burn-in step adaptation (a compile-time kernel phase
    every row shares)."""
    seeds_arr = jnp.asarray(np.asarray(seeds, np.uint32))
    if seeds_arr.shape != (r,):
        raise ValueError(
            f"expected {r} seeds, got shape {seeds_arr.shape}"
        )
    if len(params) != n_param_args:
        raise ValueError(
            f"expected {n_param_args} params array(s), got {len(params)}"
        )
    params_arrs = []
    for i, p in enumerate(params):
        kind = param_kinds[i] if i < len(param_kinds) else None
        width = 4 if kind in ("rw", "rw_adapt") else 2
        fam = getattr(p, "family", None)
        if fam is not None and kind is not None and fam != kind:
            raise ValueError(
                f"params array {i} was packed for "
                f"{_param_kind_name(fam)} but this program "
                f"was compiled for {_param_kind_name(kind)}"
            )
        p_arr = jnp.asarray(np.asarray(p, np.float32))
        if p_arr.shape != (r, width):
            raise ValueError(
                f"expected a ({r}, {width}) params array, got shape "
                f"{p_arr.shape}"
            )
        params_arrs.append(p_arr)
    return seeds_arr, tuple(params_arrs)


def _param_kind_name(kind) -> str:
    """Human name of a param-batch slot kind: a DistKind family or the
    ``"rw"`` / ``"rw_adapt"`` RandomWalk sentinels."""
    if kind == "rw":
        return "fixed-step RandomWalk proposals"
    if kind == "rw_adapt":
        return "adaptive RandomWalk proposals"
    return f"{DistKind(kind).name} distributions"


def _nd_param_map_adapter(run, d: int):
    """Batch an unbatched XLA nd program over (seeds, (R, d, 2) params)
    via a traced lax.map (the nd form of _param_batched_prog's sweep);
    cached on the run so repeat handles reuse the trace."""
    wrappers = getattr(run, "__batched_wrappers__", None)
    if wrappers is None:
        wrappers = {}
        try:
            run.__batched_wrappers__ = wrappers
        except (AttributeError, TypeError):
            pass
    key = ("nd_param", d)
    adapted = wrappers.get(key)
    if adapted is None:

        @jax.jit
        def adapted(seeds, params, xt_t, ct_t):
            return jax.lax.map(
                lambda sp: run(
                    sp[0],
                    tuple(sp[1][j] for j in range(d)),
                    xt_t,
                    ct_t,
                ),
                (seeds, params),
            )

        wrappers[key] = adapted
    return adapted


def _nd_param_prog(run, dev_args, seed_batch: int, d: int, kinds):
    """The nd param-batched handle: ``prog(seeds, params)`` with params
    an (R, d, 2) float32 array of per-dimension family parameter rows
    (build with :func:`pack_param_batch_nd`); validates shapes and the
    per-dimension families a tagged pack carries."""
    _, xt_t, ct_t = dev_args

    def prog(seeds, params):
        seeds_arr = np.asarray(seeds, np.uint32)
        if seeds_arr.shape != (seed_batch,):
            raise ValueError(
                f"expected {seed_batch} seeds, got shape {seeds_arr.shape}"
            )
        fams = getattr(params, "families", None)
        if fams is not None and tuple(fams) != tuple(kinds):
            raise ValueError(
                "params were packed for dimensions "
                f"{tuple(DistKind(f).name for f in fams)} but this "
                "program was compiled for "
                f"{tuple(DistKind(k).name for k in kinds)}"
            )
        p_arr = np.asarray(params, np.float32)
        if p_arr.shape != (seed_batch, d, 2):
            raise ValueError(
                f"expected a ({seed_batch}, {d}, 2) params array "
                f"(pack_param_batch_nd), got shape {p_arr.shape}"
            )
        return run(
            jnp.asarray(seeds_arr), jnp.asarray(p_arr), xt_t, ct_t
        )

    return prog


def _nd_mcmc_param_map_adapter(run, d: int, tables):
    """Batch the unbatched XLA nd MH program over (seeds, (R, d, 2)
    proposal and target rows) via a traced lax.map; the analytic-only
    dummy tables close over."""

    @jax.jit
    def adapted(seeds, prop_params, targ_params):
        return jax.lax.map(
            lambda sp: run(
                sp[0],
                tuple(sp[1][j] for j in range(d)),
                tuple(sp[2][j] for j in range(d)),
                *tables,
            ),
            (seeds, prop_params, targ_params),
        )

    return adapted


def _nd_mcmc_param_prog(run, seed_batch: int, d: int, targ_kinds,
                        prop_kinds, random_walk: bool = False,
                        rw_adapt: bool = False):
    """The nd MCMC param-batched handle: ``prog(seeds, target_params,
    proposal_params)`` (1-D compile_mcmc's arg order) with each params
    arg an (R, d, 2) array; validates shapes and tagged families.  With
    a RandomWalk proposal the proposal slot instead takes the (R, d, 4)
    rows of :func:`pack_random_walk_batch_nd`."""

    def _check(params, kinds, role, width=2):
        fams = getattr(params, "families", None)
        if fams is not None and tuple(fams) != tuple(kinds):
            raise ValueError(
                f"{role} params were packed for dimensions "
                f"{tuple(DistKind(f).name for f in fams)} but this "
                "program was compiled for "
                f"{tuple(DistKind(k).name for k in kinds)}"
            )
        p_arr = np.asarray(params, np.float32)
        if p_arr.shape != (seed_batch, d, width):
            raise ValueError(
                f"expected a ({seed_batch}, {d}, {width}) {role} params "
                f"array, got shape {p_arr.shape}"
            )
        return jnp.asarray(p_arr)

    def _check_rw(params):
        want = "rw_adapt" if rw_adapt else "rw"
        fam = getattr(params, "family", None)
        if fam is not None and fam != want:
            raise ValueError(
                "this program was compiled for "
                f"{_param_kind_name(want)}; pack matching (R, d, 4) "
                "rows with pack_random_walk_batch_nd, got a pack for "
                f"{_param_kind_name(fam)}"
            )
        p_arr = np.asarray(params, np.float32)
        if p_arr.shape != (seed_batch, d, 4):
            raise ValueError(
                f"expected a ({seed_batch}, {d}, 4) RandomWalk params "
                f"array (pack_random_walk_batch_nd), got shape "
                f"{p_arr.shape}"
            )
        return jnp.asarray(p_arr)

    def prog(seeds, target_params, proposal_params):
        seeds_arr = np.asarray(seeds, np.uint32)
        if seeds_arr.shape != (seed_batch,):
            raise ValueError(
                f"expected {seed_batch} seeds, got shape {seeds_arr.shape}"
            )
        targ = _check(target_params, targ_kinds, "target")
        prop = (
            _check_rw(proposal_params)
            if random_walk
            else _check(proposal_params, prop_kinds, "proposal")
        )
        return run(jnp.asarray(seeds_arr), prop, targ)

    return prog


class NdParamBatch(np.ndarray):
    """(R, d, 2) float32 per-dimension family-parameter rows tagged
    with the per-dimension ``families`` tuple, so a mismatched nd
    param-batched handle rejects the pack at dispatch time."""

    def __new__(cls, arr, families):
        obj = np.asarray(arr, np.float32).view(cls)
        obj.families = tuple(DistKind(f) for f in families)
        return obj

    def __array_finalize__(self, obj):
        if obj is not None and not hasattr(self, "families"):
            self.families = getattr(obj, "families", None)


def pack_param_batch_nd(rows) -> NdParamBatch:
    """Stack per-REPLICATION lists of per-DIMENSION analytic
    distributions into the (R, d, 2) array an nd ``param_batch`` handle
    takes: ``rows[r][j]`` parameterizes dimension j of batch element r.
    Every replication must use the same family per dimension."""
    rows = [list(r) for r in rows]
    if not rows or not rows[0]:
        raise ValueError("param batch needs at least one replication row")
    d = len(rows[0])
    specs = []
    for r in rows:
        if len(r) != d:
            raise ValueError(
                "every replication must list the same number of "
                f"dimensions (got {len(r)} vs {d})"
            )
        specs.append([dist_spec_of(dd) for dd in r])
    families = tuple(s.kind for s in specs[0])
    for row in specs:
        for j, s in enumerate(row):
            if s.kind != families[j]:
                raise ValueError(
                    f"dimension {j} mixes families "
                    f"{families[j].name} and {s.kind.name}"
                )
            ensure_param_batch_family(s.kind)
    arr = np.stack(
        [np.stack([s.params for s in row]) for row in specs]
    )
    return NdParamBatch(arr, families)


class ParamBatch(np.ndarray):
    """(R, 2) float32 family-parameter rows tagged with the ``family``
    (DistKind) they parameterize, so a param-batched handle can reject a
    pack built for a different family at dispatch time."""

    def __new__(cls, arr, family):
        obj = np.asarray(arr, np.float32).view(cls)
        obj.family = DistKind(family)
        return obj

    def __array_finalize__(self, obj):
        if obj is not None and not hasattr(self, "family"):
            self.family = getattr(obj, "family", None)


def pack_param_batch(distributions) -> ParamBatch:
    """Stack the device parameter words of same-family analytic
    distributions into the (R, 2) float32 array a ``param_batch``
    program takes: uniform -> (min, max), normal -> (mean, std),
    exponential -> (lambda, 0) — the packing of
    ``sampling.dist_spec_of`` (reference parse_dist_params,
    src/lib.rs:436-502).  The result carries its family so a
    mismatched program rejects it at dispatch."""
    specs = [dist_spec_of(d) for d in distributions]
    if not specs:
        raise ValueError("param batch needs at least one distribution")
    kinds = {s.kind for s in specs}
    if len(kinds) != 1:
        raise ValueError(
            "param batch must share one family, got "
            f"{sorted(k.name for k in kinds)}"
        )
    ensure_param_batch_family(specs[0].kind)
    return ParamBatch(np.stack([s.params for s in specs]), specs[0].kind)


class RwParamBatch(np.ndarray):
    """(R, 4) (1-D) or (R, d, 4) (nd) float32 RandomWalk parameter rows
    — ``(step, init_lo, init_hi, target_accept)`` — tagged with the
    ``"rw"`` / ``"rw_adapt"`` sentinel family, so a handle compiled for
    density-backed proposals rejects the pack at dispatch time (and vice
    versa).  Step adaptation is a compile-time kernel phase, not a row
    word, so adaptive and fixed-step packs carry distinct tags and a
    program compiled for one rejects the other (every row of an adaptive
    program adapts; silently adapting a fixed-step row would break the
    element-bit-equal-to-its-unbatched-call guarantee)."""

    def __new__(cls, arr, adapt: bool = False):
        obj = np.asarray(arr, np.float32).view(cls)
        obj.family = "rw_adapt" if adapt else "rw"
        return obj

    def __array_finalize__(self, obj):
        if obj is not None and not hasattr(self, "family"):
            self.family = getattr(obj, "family", "rw")


def _walks_targets_of(walks, target, what: str):
    """Validate a (walks, per-row targets) pairing for the RandomWalk
    pack builders.  ``target``: one shared value, a length-R sequence,
    or None (every walk then needs an explicit init_range)."""
    walks = list(walks)
    if not walks:
        raise ValueError("param batch needs at least one RandomWalk")
    for w in walks:
        if not isinstance(w, RandomWalk):
            raise TypeError(
                f"pack_random_walk_batch{what} takes RandomWalk "
                f"proposals, got {type(w)}"
            )
    if len({w.adapt for w in walks}) > 1:
        raise ValueError(
            "all walks in a param batch must share adapt= — step "
            "adaptation is a compile-time kernel phase (every row of "
            "an adaptive program adapts); run adaptive and fixed-step "
            "sweeps as separate programs"
        )
    if target is None or isinstance(target, Distribution):
        targets = [target] * len(walks)
    else:
        targets = list(target)
        if len(targets) != len(walks):
            raise ValueError(
                f"{len(walks)} walks but {len(targets)} targets; pass "
                "one shared target or one per replication row"
            )
    return walks, targets


def pack_random_walk_batch(walks, target=None) -> RwParamBatch:
    """Stack :class:`RandomWalk` proposals into the (R, 4) rows a 1-D
    ``param_batch`` MCMC handle takes in its proposal-params slot —
    one step-size/init-range/target-acceptance row per replication, so
    a single compiled program serves a whole step-size (or adaptation)
    sweep per dispatch.  ``target``: the Distribution whose central 98%
    interval seeds default init ranges — one shared, a length-R list
    (matched to the swept target rows), or None when every walk carries
    an explicit ``init_range``."""
    walks, targets = _walks_targets_of(walks, target, "")
    rows = []
    for w, t in zip(walks, targets):
        rows.append(
            w.pack_params_nd([t] if t is not None else None, 1)[0]
        )
    return RwParamBatch(np.stack(rows), walks[0].adapt)


def pack_random_walk_batch_nd(walks, targets=None, d=None) -> RwParamBatch:
    """nd form of :func:`pack_random_walk_batch`: (R, d, 4) rows.
    ``targets``: the per-dimension Distribution list (shared across
    rows), a length-R list of such lists, or None for joint log-density
    targets (explicit ``init_range`` on every walk; ``d`` required
    then)."""
    shared = None
    if targets is not None:
        targets = list(targets)
        if targets and isinstance(targets[0], Distribution):
            shared = targets  # one per-dimension list for every row
            targets = None
    walks, per_row = _walks_targets_of(walks, targets, "_nd")
    if shared is not None:
        per_row = [shared] * len(walks)
    dims = {len(r) for r in per_row if r is not None}
    if len(dims) > 1:
        raise ValueError(
            f"rows mix dimension counts {sorted(dims)}"
        )
    if d is None:
        if not dims:
            raise ValueError(
                "pass d= when packing for a joint log-density target "
                "(no per-dimension target lists to read it from)"
            )
        d = dims.pop()
    elif dims and dims != {d}:
        raise ValueError(
            f"d={d} but the target lists have {dims.pop()} dimensions"
        )
    return RwParamBatch(
        np.stack([w.pack_params_nd(t, d) for w, t in zip(walks, per_row)]),
        walks[0].adapt,
    )
