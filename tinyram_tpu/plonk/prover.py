"""PLONKish prover: the TPU-native `create_proof`.

Mirrors the responsibilities of the fork's `create_proof`
(/root/reference/src/test_utils.rs:40-49 and SURVEY.md §3.3) with an
array-first design: every phase is batched device work (NTT, MSM, batched
Fermat inversion, `associative_scan` grand products), with the transcript
and small glue on the host.

Protocol order is defined in protocol.py; the verifier mirrors it exactly.
"""

from __future__ import annotations

from collections import Counter
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field.jfield import FP
from ..ipa import SRS, commit
from ..ipa.ipa import commit_many, open_poly
from ..poly.domain import Domain
from ..poly.ntt import _mont_table, eval_poly, powers, tree_sum
from ..transcript import TranscriptWriter
from .circuit import Assignment, ConstraintSystem
from .expr import ADVICE, FIXED, INSTANCE, evaluate
from .keygen import ProvingKey, delta
from .protocol import eval_schedule, multiopen_point_order, queried_column_rotations

P = FP.modulus

import os as _os
import time as _time

_PROFILE = bool(_os.environ.get("TINYRAM_PROFILE"))


def _phase(name, t0):
    """Record a prover phase into the global KernelCounters (BASELINE.md's
    per-phase reporting; surfaced by bench.py) and optionally print it."""
    from ..utils.profiling import counters

    dt = _time.time() - t0
    counters.add(f"prover.{name}", 0, dt)
    if _PROFILE:
        print(f"[prover] {name}: {dt:.1f}s", flush=True)
    return _time.time()


# --------------------------------------------------------------------- utils


@jax.jit
def _prefix_prod_exclusive(arr: jnp.ndarray) -> jnp.ndarray:
    """[1, a0, a0·a1, …] along the last axis (Montgomery)."""
    inc = jax.lax.associative_scan(FP.mul, arr, axis=-1)
    return jnp.concatenate([FP.ones((1,)), inc[:, :-1]], axis=-1)


@jax.jit
def _grand_product(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """z[i] = Π_{t<i} num[t]/den[t]  (z[0] = 1)."""
    return FP.mul(_prefix_prod_exclusive(num), FP.inv(_prefix_prod_exclusive(den)))


@jax.jit
def _prefix_sum_exclusive(arr: jnp.ndarray) -> jnp.ndarray:
    """[0, a0, a0+a1, …] along the last axis of (16, n)."""
    inc = jax.lax.associative_scan(FP.add, arr, axis=-1)
    return jnp.concatenate([FP.zeros((1,)), inc[:, :-1]], axis=-1)


@jax.jit
def _prefix_prod_exclusive_b(arr: jnp.ndarray) -> jnp.ndarray:
    """Batched exclusive prefix product over the last axis of (16, B, n)."""
    inc = jax.lax.associative_scan(FP.mul, arr, axis=-1)
    ones = jnp.broadcast_to(
        FP.ones((arr.shape[1], 1)), (16, arr.shape[1], 1)
    ).astype(arr.dtype)
    return jnp.concatenate([ones, inc[..., :-1]], axis=-1)


@jax.jit
def _grand_product_batched(nums: jnp.ndarray, dens: jnp.ndarray) -> jnp.ndarray:
    return FP.mul(
        _prefix_prod_exclusive_b(nums), FP.inv(_prefix_prod_exclusive_b(dens))
    )


def _scalar(v: int) -> jnp.ndarray:
    """Host int -> (16, 1) Montgomery device constant."""
    return FP.const(v, 1)


def _rolled(arr: jnp.ndarray, rotation: int, scale: int = 1) -> jnp.ndarray:
    if rotation == 0:
        return arr
    return jnp.roll(arr, -rotation * scale, axis=-1)


def _eval_exprs_on(
    exprs, get_col, n: int, scale: int = 1, cache: dict | None = None
):
    """Evaluate expressions over device column arrays with rotation rolls.

    Structurally identical expressions (e.g. the ~300 temp-var routing
    gates, or a 97-column dynamic-lookup tuple) are evaluated ONCE over
    stacked columns — without this, eager per-op dispatch dominates the
    whole prover.
    """
    from .expr import batched_evaluate

    roll_cache = {} if cache is None else cache

    def slot_value(v):
        key = (v.kind, v.index, v.rotation)
        if key not in roll_cache:
            roll_cache[key] = _rolled(get_col(v.kind, v.index), v.rotation, scale)
        return roll_cache[key]

    def stack(vals):
        return jnp.stack(vals, axis=1)  # (16, B, n)

    def const(v):
        return FP.const(v, 2)  # (16, 1, 1), broadcasts over (16, B, n)

    outs = batched_evaluate(
        exprs, slot_value=slot_value, const=const,
        add=FP.add, mul=FP.mul, neg=FP.neg, stack=stack,
    )
    return [res[:, gi] for (res, gi, _) in outs]


def _compress(vals: list[jnp.ndarray], theta: int) -> jnp.ndarray:
    """Σ θ^i v_i (Horner, scalar θ)."""
    th = _scalar(theta)
    acc = vals[-1]
    for v in reversed(vals[:-1]):
        acc = FP.add(FP.mul(acc, th), v)
    return acc


import weakref

# per-circuit jitted quotient-block fold programs: keyed weakly on the
# ConstraintSystem so repeated create_proof calls (and every proof of the
# same circuit) reuse one compiled program per block instead of
# dispatching thousands of eager ops — on the axon tunnel each eager op
# costs ~10 ms, which made the quotient phase the slowest part of the
# k=14 prover.  Each block takes its queried columns in the COEFFICIENT
# domain and lifts them to the extended coset inside the program
# (pad + coset scale + NTT), so no extended-column cache ever lives in
# HBM — peak extended-domain memory is one block's columns.
_GATE_FOLD_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_AUX_FOLD_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _mesh_key():
    from ..shard.context import current_mesh

    return current_mesh()


def _compress_traced(vals: list[jnp.ndarray], th: jnp.ndarray) -> jnp.ndarray:
    """Σ θ^i v_i (Horner) with a traced scalar θ of shape (16, 1)."""
    acc = vals[-1]
    for v in reversed(vals[:-1]):
        acc = FP.add(FP.mul(acc, th), v)
    return acc


# column-chunked coset lift for the jitted quotient blocks: caps the NTT
# working set inside one program at _EXT_CHUNK extended columns; the
# concatenated (16, V, n_ext) output is needed regardless, but the NTT
# intermediates (transpose buffers, stage temporaries) only ever exist for
# one chunk at a time.  Part of the r4 fix for the k=14 TPU-worker crash
# in the first gate slab (VERDICT r3 item 2).
def _ext_chunk() -> int:
    # read per call (not at import) so the bench retry driver's step-down
    # takes effect without a re-import (ADVICE r4)
    return int(_os.environ.get("TINYRAM_EXT_CHUNK", "64"))


def _l2c_chunked(dom, cols: list) -> jnp.ndarray:
    """Batched lagrange->coeff over a column list, TINYRAM_EXT_CHUNK
    columns per NTT call.  The single-call version requested 78.6G of HBM
    for the ~196-column stack at k=17 (XLA materializes several
    stack-sized four-step temps concurrently; logs/config3_prove_r5.log)."""
    ch = _ext_chunk()
    if len(cols) <= ch:
        return dom.lagrange_to_coeff(jnp.stack(cols, axis=1))
    parts = [
        dom.lagrange_to_coeff(jnp.stack(cols[lo : lo + ch], axis=1))
        for lo in range(0, len(cols), ch)
    ]
    return jnp.concatenate(parts, axis=1)


def _lift_chunked(dom, stack: jnp.ndarray) -> jnp.ndarray:
    v = stack.shape[1]
    _EXT_CHUNK = _ext_chunk()
    if v <= _EXT_CHUNK:
        return dom.coeff_to_extended(stack)
    return jnp.concatenate(
        [
            dom.coeff_to_extended(stack[:, lo : lo + _EXT_CHUNK])
            for lo in range(0, v, _EXT_CHUNK)
        ],
        axis=1,
    )


def _gate_fold_fns(cs, dom, scale: int, slab: int):
    """[(jitted fn(stack, w) -> (16, n_ext) partial, var_list, n)] per slab.

    ``stack`` is (16, V, n) — the slab's queried columns in var_list order,
    coefficient domain; ``w`` is (16, S, 1) — the y-fold weights for the
    slab's constraints in order.  The program extends the stack to the
    coset internally.
    """
    per_cs = _GATE_FOLD_CACHE.setdefault(cs, {})
    key = (dom.k, dom.extended_k, scale, slab, _mesh_key())
    if key in per_cs:
        return per_cs[key]
    from .expr import queried_vars

    n_ext = dom.n_ext
    all_polys = [p for g in cs.gates for p in g.polys]
    fns = []
    for lo in range(0, len(all_polys), slab):
        exprs = all_polys[lo : lo + slab]
        vars_ = sorted({(v.kind, v.index) for v in queried_vars(exprs)})
        pos = {v: i for i, v in enumerate(vars_)}

        def make(exprs=exprs, pos=pos):
            def fn(stack, w):
                ext = _lift_chunked(dom, stack)

                def get_col(kind, index):
                    return ext[:, pos[(kind, index)]]

                outs = _eval_exprs_on(exprs, get_col, 0, scale, {})
                c_stack = jnp.stack(
                    [jnp.broadcast_to(c, (16, n_ext)) for c in outs],
                    axis=1,
                )
                return tree_sum(FP, FP.mul(c_stack, w), axis=1)

            return jax.jit(fn)

        fns.append((make(), vars_, len(exprs)))
    per_cs[key] = fns
    return fns


def _theta_powers_traced(th: jnp.ndarray, count: int) -> list:
    """[θ^0 … θ^{count-1}] as (16, 1) traced scalars (serial chain of
    tiny muls — negligible next to the extended-domain work)."""
    pows = [FP.ones((1,))]
    for _ in range(count - 1):
        pows.append(FP.mul(pows[-1], th))
    return pows


def _compress_exprs_chunked(
    exprs, th, get_col, scale: int, n_ext: int, chunk: int = 8
) -> jnp.ndarray:
    """Σ_i θ^i·expr_i evaluated on the extended domain in small
    chunks.  Equal to `_compress_traced(_eval_exprs_on(exprs, …), θ)` but
    caps concurrently-live (16, B, n_ext) stacks at `chunk` expressions —
    the 97-expression dynamic prog lookup evaluated all at once held
    dozens of 256 MB temps and OOMed the k=14 compile
    (logs/bench_prover_r4b.log)."""
    B = len(exprs)
    if B == 1:
        return _eval_exprs_on(exprs, get_col, 0, scale, {})[0]
    pows = _theta_powers_traced(th, B)
    acc = None
    for lo in range(0, B, chunk):
        sub = exprs[lo : lo + chunk]
        vals = _eval_exprs_on(sub, get_col, 0, scale, {})
        w = jnp.stack([pows[lo + j] for j in range(len(sub))],
                      axis=1)  # (16, CH, 1)
        part = tree_sum(
            FP,
            FP.mul(
                jnp.stack(
                    [jnp.broadcast_to(v, (16, n_ext)) for v in vals], axis=1
                ),
                w,
            ),
            axis=1,
        )
        acc = part if acc is None else FP.add(acc, part)
    return acc


def _aux_fold_fns(cs, dom, scale: int):
    """Jitted quotient programs for the lookup and LogUp argument rules.

    Returns {"lookup": [(fn, vars)], "range": [(fn, vars)]}, one entry per
    argument, constraint order identical to the verifier's fold order.
    Lookup fn(qstack (16,V,n), astack (16,3,n) = A'/S'/Z coeffs,
    tables (16,3,n_ext) = l0/l_last/active, ch (16,3,1) = θ/β/γ, w) and
    range fn(qstack, astack (16,3+B,n) = m/h_T/z/h_b coeffs,
    tables, beta (16,1), w) -> y-weighted (16, n_ext) partials.
    """
    per_cs = _AUX_FOLD_CACHE.setdefault(cs, {})
    key = (dom.k, dom.extended_k, scale, _mesh_key())
    if key in per_cs:
        return per_cs[key]
    from .expr import queried_vars

    n_ext = dom.n_ext
    out = {"lookup": [], "range": []}
    for lk in cs.lookups:
        vars_ = sorted(
            {(v.kind, v.index) for v in queried_vars(lk.inputs + lk.tables)}
        )
        pos = {v: i for i, v in enumerate(vars_)}

        def make(lk=lk, pos=pos):
            def fn(qstack, astack, tables, ch, w):
                qext = _lift_chunked(dom, qstack)
                aext = _lift_chunked(dom, astack)
                l0, l_last, active = tables[:, 0], tables[:, 1], tables[:, 2]
                theta, beta, gamma = ch[:, 0], ch[:, 1], ch[:, 2]

                def get_col(kind, index):
                    return qext[:, pos[(kind, index)]]

                a_ext = _compress_exprs_chunked(
                    lk.inputs, theta, get_col, scale, n_ext
                )
                s_ext = _compress_exprs_chunked(
                    lk.tables, theta, get_col, scale, n_ext
                )
                ap, sp, zl = aext[:, 0], aext[:, 1], aext[:, 2]
                zl_next = jnp.roll(zl, -scale, axis=-1)
                ap_prev = jnp.roll(ap, scale, axis=-1)
                one = FP.ones((n_ext,))
                constraints = [
                    FP.mul(l0, FP.sub(zl, one)),
                    FP.mul(l_last, FP.sub(FP.mul(zl, zl), zl)),
                    FP.mul(
                        active,
                        FP.sub(
                            FP.mul(
                                zl_next,
                                FP.mul(FP.add(ap, beta), FP.add(sp, gamma)),
                            ),
                            FP.mul(
                                zl,
                                FP.mul(
                                    FP.add(a_ext, beta), FP.add(s_ext, gamma)
                                ),
                            ),
                        ),
                    ),
                    FP.mul(l0, FP.sub(ap, sp)),
                    FP.mul(
                        active,
                        FP.mul(FP.sub(ap, sp), FP.sub(ap, ap_prev)),
                    ),
                ]
                c_stack = jnp.stack(
                    [jnp.broadcast_to(c, (16, n_ext)) for c in constraints],
                    axis=1,
                )
                return tree_sum(FP, FP.mul(c_stack, w), axis=1)

            return jax.jit(fn)

        out["lookup"].append((make(), vars_))

    for rl in cs.range_lookups:
        vars_ = sorted(
            {(v.kind, v.index) for v in queried_vars(rl.inputs + [rl.table])}
        )
        pos = {v: i for i, v in enumerate(vars_)}
        batches = rl.batches()

        def make(rl=rl, pos=pos, batches=batches):
            # Round 5 (the r5 k=14 chip attempt 1 hit a runtime HBM
            # ResourceExhausted in the old monolithic range-fold program):
            # the fold is now SEVERAL small jitted programs — one "core"
            # over the aux columns, one per helper batch over only that
            # batch's queried columns, and one "tail" for the table/
            # multiplicity rule.  Each program's extended working set is a
            # handful of columns instead of all ~40, and programs release
            # their temp arenas between dispatches.  The y-weight order is
            # IDENTICAL to the verifier's fold order:
            #   [l0·z, l_last·z, z-diff, batch_0 … batch_{B-1}, tail]
            nb = len(batches)

            @jax.jit
            def core(astack, tables, w):
                aext = _lift_chunked(dom, astack)
                l0, l_last, active = (
                    tables[:, 0], tables[:, 1], tables[:, 2]
                )
                ht_ext, z = aext[:, 1], aext[:, 2]
                h_exts = [aext[:, 3 + b] for b in range(nb)]
                z_next = jnp.roll(z, -scale, axis=-1)
                sum_h = h_exts[0]
                for hh in h_exts[1:]:
                    sum_h = FP.add(sum_h, hh)
                c_stack = jnp.stack(
                    [
                        jnp.broadcast_to(c, (16, n_ext))
                        for c in (
                            FP.mul(l0, z),
                            FP.mul(l_last, z),
                            FP.mul(
                                active,
                                FP.sub(
                                    FP.sub(z_next, z),
                                    FP.sub(sum_h, ht_ext),
                                ),
                            ),
                        )
                    ],
                    axis=1,
                )
                return tree_sum(FP, FP.mul(c_stack, w), axis=1)

            batch_progs = []
            j0 = 0
            for batch in batches:
                exprs = rl.inputs[j0 : j0 + len(batch)]
                j0 += len(batch)
                bvars = sorted(
                    {(v.kind, v.index) for v in queried_vars(exprs)}
                )
                bpos = {v: i for i, v in enumerate(bvars)}
                bidx = [pos[v] for v in bvars]

                def bprog(exprs=exprs, bpos=bpos):
                    @jax.jit
                    def bfn(qsub, h_coeff, beta, w1):
                        qext = _lift_chunked(dom, qsub)
                        h_ext = dom.coeff_to_extended(h_coeff)

                        def get_col(kind, index):
                            return qext[:, bpos[(kind, index)]]

                        vals = _eval_exprs_on(exprs, get_col, 0, scale, {})
                        ds = [FP.add(v, beta) for v in vals]
                        prod_all = ds[0]
                        for dd in ds[1:]:
                            prod_all = FP.mul(prod_all, dd)
                        excl = None
                        one = FP.ones((n_ext,))
                        for j in range(len(ds)):
                            term = None
                            for l in range(len(ds)):
                                if l == j:
                                    continue
                                term = (
                                    ds[l] if term is None
                                    else FP.mul(term, ds[l])
                                )
                            if term is None:  # batch of one
                                term = one
                            excl = term if excl is None else FP.add(excl, term)
                        c = FP.sub(FP.mul(h_ext, prod_all), excl)
                        return FP.mul(c, w1[:, 0])

                    return bfn

                batch_progs.append((bprog(), bidx))

            tvars = sorted(
                {(v.kind, v.index) for v in queried_vars([rl.table])}
            )
            t_pos = {v: i for i, v in enumerate(tvars)}
            t_idx = [pos[v] for v in tvars]

            @jax.jit
            def tail(qsub, a01, beta, w1):
                qext = _lift_chunked(dom, qsub)
                a01e = _lift_chunked(dom, a01)
                m_ext, ht_ext = a01e[:, 0], a01e[:, 1]

                def get_col(kind, index):
                    return qext[:, t_pos[(kind, index)]]

                t_ext = _eval_exprs_on([rl.table], get_col, 0, scale, {})[0]
                c = FP.sub(FP.mul(ht_ext, FP.add(t_ext, beta)), m_ext)
                return FP.mul(c, w1[:, 0])

            def fn(qstack, astack, tables, beta, w):
                acc = core(astack, tables, w[:, 0:3])
                for b, (bfn, bidx) in enumerate(batch_progs):
                    acc = FP.add(
                        acc,
                        bfn(
                            qstack[:, bidx], astack[:, 3 + b], beta,
                            w[:, 3 + b : 4 + b],
                        ),
                    )
                return FP.add(
                    acc,
                    tail(
                        qstack[:, t_idx], astack[:, 0:2], beta,
                        w[:, 3 + nb : 4 + nb],
                    ),
                )

            return fn

        out["range"].append((make(), vars_))
    per_cs[key] = out
    return out


def permute_lookup(a_vals: list[int], s_vals: list[int]):
    """halo2-0.2-style permuted (A', S') for the plookup product argument."""
    n = len(a_vals)
    a_sorted = sorted(a_vals)
    s_count = Counter(s_vals)
    s_prime: list[int | None] = [None] * n
    for i, v in enumerate(a_sorted):
        if i == 0 or v != a_sorted[i - 1]:
            if s_count[v] == 0:
                raise ValueError(f"lookup input {v} not present in table")
            s_count[v] -= 1
            s_prime[i] = v
    leftovers = iter(s_count.elements())
    for i in range(n):
        if s_prime[i] is None:
            s_prime[i] = next(leftovers)
    return a_sorted, [int(v) for v in s_prime]


def _limbs_to_i64(host: np.ndarray):
    """(16, N) plain-form host limbs -> int64 array, or None if too large."""
    if host[4:].any() or (host[3] >> 14).any():
        return None
    out = host[0].astype(np.int64)
    for i in range(1, 4):
        out |= host[i].astype(np.int64) << (16 * i)
    return out


def permute_lookup_np(a_vals: np.ndarray, s_vals: np.ndarray):
    """Vectorized permute for int64 values (the common case: single-column
    range lookups whose values are < 2^32).  Same rule as permute_lookup."""
    n = len(a_vals)
    a_sorted = np.sort(a_vals)
    first = np.ones(n, dtype=bool)
    first[1:] = a_sorted[1:] != a_sorted[:-1]
    needed = a_sorted[first]
    s_sorted = np.sort(s_vals)
    idx = np.searchsorted(s_sorted, needed, side="left")
    ok = (idx < n) & (s_sorted[np.minimum(idx, n - 1)] == needed)
    if not ok.all():
        missing = needed[~ok][0]
        raise ValueError(f"lookup input {missing} not present in table")
    consumed = np.zeros(n, dtype=bool)
    consumed[idx] = True
    s_prime = np.empty(n, dtype=np.int64)
    s_prime[first] = needed
    s_prime[~first] = s_sorted[~consumed]
    return a_sorted, s_prime


# -------------------------------------------------------------------- prover


def create_proof(
    srs: SRS, pk: ProvingKey, asg: Assignment,
    tw: TranscriptWriter | None = None, mesh=None,
) -> bytes:
    if mesh is not None:
        # multi-chip mode: activate the mesh context — Domain NTTs become
        # the all-to-all 4-step transform and commit MSMs become
        # point-sharded partials (shard/ntt.py, shard/msm.py).  Those two
        # phases are where ~all FLOPs live (SURVEY §3.3), and the NTT's
        # shard_map out_specs make every transform OUTPUT block-sharded on
        # the row axis — so the extended-coset columns (the quotient
        # phase's ~2 GB at k=14) live at n_ext/D per device, and both the
        # eager elementwise constraint math and the jitted slab folds
        # keep that sharding (computation follows sharding; rolls become
        # halo collectives).  See tests/test_shard.py::
        # test_quotient_phase_sharding_propagates for the memory argument.
        from ..shard.context import mesh_context

        with mesh_context(mesh):
            return create_proof(srs, pk, asg, tw)
    cs = pk.vk.cs
    dom = pk.domain
    n = dom.n
    scale = dom.n_ext // n
    asg.finalize()
    tw = tw or TranscriptWriter()

    import secrets

    # ---- zero-knowledge blinding rows (halo2 usable-rows discipline):
    # rows [u, n) of every advice column get uniform random field values,
    # so openings at x/xω are hiding.  Gates must vanish there (fixed
    # selectors); the lookup/permutation product rules deactivate there.
    bf = cs.blinding_factors
    u = cs.usable_rows(n)

    def _rand_tail(count: int) -> list[int]:
        if bf == 0:
            return [0] * count
        return [secrets.randbelow(P) for _ in range(count)]

    if bf > 0 and cs.num_advice:
        tail = n - u
        enc = FP.encode(_rand_tail(cs.num_advice * tail)).reshape(
            16, cs.num_advice, tail
        )
        for i in range(cs.num_advice):
            asg.advice[i] = asg.advice[i].at[:, u:].set(enc[:, i])

    lag: dict[tuple, jnp.ndarray] = {}
    coeff: dict[tuple, jnp.ndarray] = {}
    blinds: dict[tuple, int] = {}  # W-blinds; 0 for public polys

    def _blind(pid):
        blinds[pid] = secrets.randbelow(P)
        return blinds[pid]

    for i in range(cs.num_fixed):
        lag[("fixed", i)] = pk.fixed_lag[i]
        coeff[("fixed", i)] = pk.fixed_coeff[i]
    for j in range(len(pk.sigma_lag)):
        lag[("sigma", j)] = pk.sigma_lag[j]
        coeff[("sigma", j)] = pk.sigma_coeff[j]
    # batched lagrange->coeff for all instance+advice columns, chunked to
    # bound the NTT temp arena (78.6G single-call peak at k=17)
    coeff_stack = _l2c_chunked(
        dom,
        [asg.instance[i] for i in range(cs.num_instance)]
        + [asg.advice[i] for i in range(cs.num_advice)],
    )  # (16, B, n)
    for i in range(cs.num_instance):
        lag[("instance", i)] = asg.instance[i]
        coeff[("instance", i)] = coeff_stack[:, i]
    for i in range(cs.num_advice):
        lag[("advice", i)] = asg.advice[i]
        coeff[("advice", i)] = coeff_stack[:, cs.num_instance + i]

    t0 = _time.time()
    # 1. bind vk + instances + advice (one fused batched MSM)
    pk.vk.absorb_into(tw)
    all_comms = commit_many(
        srs,
        [coeff_stack[:, i] for i in range(coeff_stack.shape[1])],
        blinds=[0] * cs.num_instance
        + [_blind(("advice", i)) for i in range(cs.num_advice)],
    )
    for i in range(cs.num_instance):
        tw.common_point(all_comms[i])
    for i in range(cs.num_advice):
        tw.write_point(all_comms[cs.num_instance + i])

    t0 = _phase("commit instance+advice", t0)
    # 2. lookups: compress, permute, commit A'/S'
    theta = tw.challenge()

    def col_lag(kind, index):
        return lag[(kind, index)]

    def _compress_lag_chunked(exprs, chunk=16):
        """Σ θ^i expr_i on the lagrange domain, evaluated in expression
        chunks — the 97-expression dynamic prog lookup evaluated all at
        once OOMed the k=17 chip run here (logs/config3_prove_r5c.log)."""
        if len(exprs) <= chunk:
            return _compress(_eval_exprs_on(exprs, col_lag, n, 1, {}), theta)
        acc = None
        for lo in range(0, len(exprs), chunk):
            vals = _eval_exprs_on(exprs[lo : lo + chunk], col_lag, n, 1, {})
            part = _compress(vals, theta)
            if lo:
                part = FP.mul(part, _scalar(pow(theta, lo, P)))
            acc = part if acc is None else FP.add(acc, part)
        return acc

    lookup_data = []
    permuted = []
    for li, lk in enumerate(cs.lookups):
        a_lag = _compress_lag_chunked(lk.inputs)
        s_lag = _compress_lag_chunked(lk.tables)
        lookup_data.append((a_lag, s_lag))
    if lookup_data:
        # one fused from_mont + transfer for every lookup's (A, S) pair
        all_pairs = jnp.stack(
            [x for pair in lookup_data for x in pair], axis=1
        )  # (16, 2L, n)
        host_pairs = np.asarray(
            jax.device_get(FP.from_mont(all_pairs[:, :, :u]))
        )
    for li, (a_lag, s_lag) in enumerate(lookup_data):
        # permute over the usable prefix only; blinding tail is random
        ha = host_pairs[:, 2 * li]
        hs = host_pairs[:, 2 * li + 1]
        a64 = _limbs_to_i64(ha)
        s64 = _limbs_to_i64(hs)
        if a64 is not None and s64 is not None:
            ap_arr, sp_arr = permute_lookup_np(a64, s64)
            ap_body, sp_body = FP.encode(ap_arr), FP.encode(sp_arr)
        else:
            from ..field.params import limbs_to_int

            ap_ints, sp_ints = permute_lookup(
                [limbs_to_int(ha[:, i]) for i in range(u)],
                [limbs_to_int(hs[:, i]) for i in range(u)],
            )
            ap_body = jnp.asarray(_mont_table(FP, ap_ints))
            sp_body = jnp.asarray(_mont_table(FP, sp_ints))
        tail_vals = _rand_tail(2 * (n - u))
        ap_lag = jnp.concatenate(
            [ap_body, jnp.asarray(_mont_table(FP, tail_vals[: n - u]))], axis=1
        )
        sp_lag = jnp.concatenate(
            [sp_body, jnp.asarray(_mont_table(FP, tail_vals[n - u:]))], axis=1
        )
        lag[("la", li)] = ap_lag
        lag[("ls", li)] = sp_lag
        permuted.append(ap_lag)
        permuted.append(sp_lag)
    if permuted:
        perm_coeff = _l2c_chunked(dom, permuted)
        perm_comms = commit_many(
            srs,
            [perm_coeff[:, i] for i in range(perm_coeff.shape[1])],
            blinds=[
                _blind(("la", i // 2) if i % 2 == 0 else ("ls", i // 2))
                for i in range(perm_coeff.shape[1])
            ],
        )
        for li in range(len(cs.lookups)):
            coeff[("la", li)] = perm_coeff[:, 2 * li]
            coeff[("ls", li)] = perm_coeff[:, 2 * li + 1]
            tw.write_point(perm_comms[2 * li])
            tw.write_point(perm_comms[2 * li + 1])

    # 2b. range lookups (LogUp): multiplicity columns committed before β.
    # m[r] = #{(j, row) : f_j(row) == t(r), row < u}, counts assigned to the
    # first table row holding each value (any split among duplicates is
    # valid for Σ m_r/(β+t_r)).
    range_data = []  # (in_stack (16,B,n), t_lag (16,n), m_lag (16,n))
    if cs.range_lookups:
        rl_stacks = []
        for rl in cs.range_lookups:
            # chunked eval: the all-at-once 35-input batch was the k=17
            # attempt-4 ResourceExhausted site (logs/config3_prove_r5d.log)
            in_vals = []
            for lo in range(0, len(rl.inputs), 8):
                in_vals.extend(
                    _eval_exprs_on(rl.inputs[lo : lo + 8], col_lag, n, 1, {})
                )
            t_val = _eval_exprs_on([rl.table], col_lag, n, 1, {})[0]
            rl_stacks.append((jnp.stack(in_vals, axis=1), t_val))
        # one fused from_mont + transfer for every range lookup's columns
        all_cols = jnp.concatenate(
            [jnp.concatenate([s, t[:, None]], axis=1) for s, t in rl_stacks],
            axis=1,
        )
        host_cols = np.asarray(jax.device_get(FP.from_mont(all_cols[:, :, :u])))
        m_lags = []
        off = 0
        for rl, (in_stack, t_lag) in zip(cs.range_lookups, rl_stacks):
            nin = in_stack.shape[1]
            h_in = host_cols[:, off : off + nin]
            h_t = host_cols[:, off + nin]
            off += nin + 1
            cols64 = [_limbs_to_i64(h_in[:, j]) for j in range(nin)]
            t64 = _limbs_to_i64(h_t)
            if t64 is None or any(c is None for c in cols64):
                from ..field.params import limbs_to_int

                t64 = np.array(
                    [limbs_to_int(h_t[:, i]) for i in range(u)], dtype=object
                )
                cols64 = [
                    np.array(
                        [limbs_to_int(h_in[:, j, i]) for i in range(u)],
                        dtype=object,
                    )
                    for j in range(nin)
                ]
            invals = np.concatenate(cols64)
            order = np.argsort(t64, kind="stable")
            sorted_t = t64[order]
            idx = np.searchsorted(sorted_t, invals, side="left")
            ok = (idx < u) & (sorted_t[np.minimum(idx, u - 1)] == invals)
            if not ok.all():
                missing = invals[~ok][0]
                raise ValueError(
                    f"range_lookup {rl.name}: input {missing} not in table"
                )
            counts_sorted = np.bincount(idx, minlength=u)
            m_arr = np.zeros(n, dtype=np.int64)
            m_arr[order] = counts_sorted[:u]
            m_lag = FP.encode(m_arr)
            if bf > 0:
                m_lag = m_lag.at[:, u:].set(FP.encode(_rand_tail(n - u)))
            m_lags.append(m_lag)
            range_data.append((in_stack, t_lag, m_lag))
        m_stack = jnp.stack(m_lags, axis=1)
        m_coeff = dom.lagrange_to_coeff(m_stack)
        m_comms = commit_many(
            srs,
            [m_coeff[:, i] for i in range(m_coeff.shape[1])],
            blinds=[_blind(("rm", ri)) for ri in range(len(cs.range_lookups))],
        )
        for ri in range(len(cs.range_lookups)):
            lag[("rm", ri)] = m_lags[ri]
            coeff[("rm", ri)] = m_coeff[:, ri]
            tw.write_point(m_comms[ri])

    t0 = _phase("lookup permute+commit", t0)
    beta = tw.challenge()
    gamma = tw.challenge()
    beta_d, gamma_d = _scalar(beta), _scalar(gamma)

    # 3. permutation grand product
    perm_cols = pk.vk.perm_columns
    if perm_cols:
        d = delta()
        omega_tbl = jnp.asarray(dom.omega_powers())  # X on H
        num = None
        den = None
        for j, col in enumerate(perm_cols):
            v = lag[(col.kind, col.index)]
            dj = pow(d, j, P) * beta % P
            t_num = FP.add(FP.add(v, FP.mul(_scalar(dj), omega_tbl)), gamma_d)
            sig = lag[("sigma", j)]
            t_den = FP.add(FP.add(v, FP.mul(beta_d, sig)), gamma_d)
            num = t_num if num is None else FP.mul(num, t_num)
            den = t_den if den is None else FP.mul(den, t_den)
        # restrict the product to usable rows; z[u] is the end value
        row_mask = jnp.arange(n) < u
        ones_n = FP.ones((n,))
        zperm = _grand_product(
            jnp.where(row_mask, num, ones_n), jnp.where(row_mask, den, ones_n)
        )
        if bf > 0:
            zperm = zperm.at[:, u + 1 :].set(FP.encode(_rand_tail(n - u - 1)))
        lag[("zperm",)] = zperm
        coeff[("zperm",)] = dom.lagrange_to_coeff(zperm)
        tw.write_point(commit(srs, coeff[("zperm",)], blind=_blind(("zperm",))))

    # 4. lookup grand products (batched across lookups: one scan + one
    # Fermat inversion for all Z polys)
    if lookup_data:
        nums = jnp.stack(
            [
                FP.mul(FP.add(a_lag, beta_d), FP.add(s_lag, gamma_d))
                for a_lag, s_lag in lookup_data
            ],
            axis=1,
        )
        dens = jnp.stack(
            [
                FP.mul(
                    FP.add(lag[("la", li)], beta_d),
                    FP.add(lag[("ls", li)], gamma_d),
                )
                for li in range(len(cs.lookups))
            ],
            axis=1,
        )
        row_mask = jnp.arange(n) < u
        ones_b = FP.ones((1, n))
        nums = jnp.where(row_mask, nums, ones_b)
        dens = jnp.where(row_mask, dens, ones_b)
        zs = _grand_product_batched(nums, dens)
        if bf > 0:
            B = zs.shape[1]
            zs = zs.at[:, :, u + 1 :].set(
                FP.encode(_rand_tail(B * (n - u - 1))).reshape(
                    16, B, n - u - 1
                )
            )
        z_coeff = dom.lagrange_to_coeff(zs)
        z_comms = commit_many(
            srs,
            [z_coeff[:, i] for i in range(z_coeff.shape[1])],
            blinds=[_blind(("lz", i)) for i in range(z_coeff.shape[1])],
        )
        for li in range(len(cs.lookups)):
            lag[("lz", li)] = zs[:, li]
            coeff[("lz", li)] = z_coeff[:, li]
            tw.write_point(z_comms[li])

    # 4b. LogUp helpers + running sums: h_b = Σ_{j∈batch b} 1/(β+f_j),
    # h_T = m/(β+t), z = exclusive prefix sum of (Σ_b h_b − h_T) over
    # usable rows.  One fused Fermat inversion covers every denominator of
    # every range lookup.
    if range_data:
        den_list = []
        for in_stack, t_lag, _ in range_data:
            den_list.append(FP.add(in_stack, beta_d[:, :, None]))
            den_list.append(FP.add(t_lag, beta_d)[:, None])
        invs = FP.inv(jnp.concatenate(den_list, axis=1))
        row_mask = jnp.arange(n) < u
        pids_order = []  # canonical commit order: per rl h_0.., h_T, z
        cols = []
        off = 0
        for ri, (in_stack, t_lag, m_lag) in enumerate(range_data):
            rl = cs.range_lookups[ri]
            nin = in_stack.shape[1]
            inv_in = invs[:, off : off + nin]
            inv_t = invs[:, off + nin]
            off += nin + 1
            h_lags = []
            j0 = 0
            for batch in rl.batches():
                h_lags.append(
                    tree_sum(FP, inv_in[:, j0 : j0 + len(batch)], axis=1)
                )
                j0 += len(batch)
            h_t = FP.mul(m_lag, inv_t)
            contrib = h_lags[0]
            for h in h_lags[1:]:
                contrib = FP.add(contrib, h)
            contrib = FP.sub(contrib, h_t)
            contrib = jnp.where(row_mask, contrib, FP.zeros((n,)))
            z = _prefix_sum_exclusive(contrib)
            if bf > 0:
                z = z.at[:, u + 1 :].set(FP.encode(_rand_tail(n - u - 1)))
            for b, h in enumerate(h_lags):
                pids_order.append(("rh", ri, b))
                cols.append(h)
            pids_order.append(("rt", ri))
            cols.append(h_t)
            pids_order.append(("rz", ri))
            cols.append(z)
        r_coeff = _l2c_chunked(dom, cols)
        r_comms = commit_many(
            srs,
            [r_coeff[:, i] for i in range(r_coeff.shape[1])],
            blinds=[_blind(pid) for pid in pids_order],
        )
        for i, pid in enumerate(pids_order):
            lag[pid] = cols[i]
            coeff[pid] = r_coeff[:, i]
            tw.write_point(r_comms[i])

    t0 = _phase("grand products", t0)
    y = tw.challenge()

    # 5. quotient: one jitted program per constraint block (gate slabs,
    # each lookup, each LogUp argument), cached per circuit.  Every block
    # receives its queried columns in the COEFFICIENT domain and lifts
    # them to the extended coset inside the program, so (a) the whole
    # block is one device dispatch — the eager version spent the phase on
    # ~10 ms-per-op tunnel latency — and (b) no extended-column cache is
    # ever resident (~2 GB at k=14); peak extended memory is one block.
    l0_ext = jnp.asarray(dom.l0_evals_ext())
    one_ext = FP.ones((dom.n_ext,))
    # usable-rows selectors: l_last = l_u; active = 1 − Σ_{i≥u} l_i
    l_last_ext = dom.lagrange_sum_ext((u,))
    active_ext = FP.sub(one_ext, dom.lagrange_sum_ext(tuple(range(u, n))))
    tables3 = jnp.stack([l0_ext, l_last_ext, active_ext], axis=1)

    all_polys = [p for g in cs.gates for p in g.polys]
    K = (
        len(all_polys)
        + (3 if perm_cols else 0)
        + 5 * len(cs.lookups)
        + sum(4 + len(rl.batches()) for rl in cs.range_lookups)
    )
    y_pows = [pow(y, K - 1 - i, P) for i in range(K)]
    fold_state = {"acc": None, "i": 0}

    def _take_w(count: int) -> jnp.ndarray:
        i0 = fold_state["i"]
        fold_state["i"] = i0 + count
        return FP.encode(y_pows[i0 : i0 + count])[:, :, None]

    def _add_part(part: jnp.ndarray):
        fold_state["acc"] = (
            part if fold_state["acc"] is None
            else FP.add(fold_state["acc"], part)
        )

    _GATE_SLAB = int(_os.environ.get("TINYRAM_GATE_SLAB", "48"))
    for fn, vars_, n_slab in _gate_fold_fns(cs, dom, scale, _GATE_SLAB):
        stack = jnp.stack([coeff[v] for v in vars_], axis=1)
        _add_part(fn(stack, _take_w(n_slab)))
    if perm_cols:
        # permutation rule: stays eager — the wide TinyRAM circuit has no
        # copy constraints (shared columns replace them), so this only
        # runs for small test circuits.
        ext_c: dict = {}

        def ext(pid):
            if pid not in ext_c:
                ext_c[pid] = dom.coeff_to_extended(coeff[pid])
            return ext_c[pid]

        x_ext = jnp.asarray(dom.x_evals_ext())
        constraints = []
        z = ext(("zperm",))
        z_next = _rolled(z, 1, scale)
        constraints.append(FP.mul(l0_ext, FP.sub(z, one_ext)))
        constraints.append(FP.mul(l_last_ext, FP.sub(FP.mul(z, z), z)))
        d = delta()
        # z accumulates Π id/σ, so Z(ωX) pairs with the σ side:
        #   Z(ωX)·Π(v + β·σ_j + γ) − Z(X)·Π(v + β·δ^j·X + γ) = 0
        left, right = z_next, z
        for j, col in enumerate(perm_cols):
            v = ext((col.kind, col.index))
            dj = pow(d, j, P) * beta % P
            left = FP.mul(
                left,
                FP.add(FP.add(v, FP.mul(beta_d, ext(("sigma", j)))), gamma_d),
            )
            right = FP.mul(
                right, FP.add(FP.add(v, FP.mul(_scalar(dj), x_ext)), gamma_d)
            )
        constraints.append(FP.mul(active_ext, FP.sub(left, right)))
        c_stack = jnp.stack(
            [jnp.broadcast_to(c, (16, dom.n_ext)) for c in constraints],
            axis=1,
        )
        _add_part(tree_sum(FP, FP.mul(c_stack, _take_w(3)), axis=1))
    aux_fns = _aux_fold_fns(cs, dom, scale)
    theta_d = _scalar(theta)
    ch3 = jnp.stack([theta_d, beta_d, gamma_d], axis=1)  # (16, 3, 1)
    for li, (fn, vars_) in enumerate(aux_fns["lookup"]):
        qstack = jnp.stack([coeff[v] for v in vars_], axis=1)
        astack = jnp.stack(
            [coeff[("la", li)], coeff[("ls", li)], coeff[("lz", li)]], axis=1
        )
        _add_part(fn(qstack, astack, tables3, ch3, _take_w(5)))
    for ri, (fn, vars_) in enumerate(aux_fns["range"]):
        rl = cs.range_lookups[ri]
        qstack = jnp.stack([coeff[v] for v in vars_], axis=1)
        astack = jnp.stack(
            [coeff[("rm", ri)], coeff[("rt", ri)], coeff[("rz", ri)]]
            + [coeff[("rh", ri, b)] for b in range(len(rl.batches()))],
            axis=1,
        )
        _add_part(
            fn(qstack, astack, tables3, beta_d, _take_w(4 + len(rl.batches())))
        )
    assert fold_state["i"] == K, (fold_state["i"], K)
    acc = fold_state["acc"]

    t0 = _phase("constraint ext eval", t0)
    q_ext = dom.divide_by_vanishing(acc)
    q_coeff_full = dom.extended_to_coeff(q_ext)
    n_chunks = dom.n_ext // n
    q_chunks = q_coeff_full.reshape(16, n_chunks, n)
    q_lag = dom.coeff_to_lagrange(q_chunks)
    q_comms = commit_many(
        srs,
        [q_chunks[:, c] for c in range(n_chunks)],
        blinds=[_blind(("q", c)) for c in range(n_chunks)],
    )
    for c in range(n_chunks):
        coeff[("q", c)] = q_chunks[:, c]
        lag[("q", c)] = q_lag[:, c]
        tw.write_point(q_comms[c])

    t0 = _phase("quotient+commit", t0)
    x = tw.challenge()

    # 6. evaluations
    slots = eval_schedule(cs, len(perm_cols), n_chunks)
    evals: dict[tuple, int] = {}  # (pid, rot) -> value
    omega = dom.omega
    points = {
        0: x % P,
        1: x * omega % P,
        -1: x * pow(omega, P - 2, P) % P,
    }
    # batched evaluation: one fused eval per distinct point, in bounded
    # column chunks (a single stack of ~450 k=14 columns plus the Horner
    # temporaries OOMs the chip — r3 fix)
    _EVAL_SLAB = 64
    by_rot: dict[int, list] = {}
    for slot in slots:
        by_rot.setdefault(slot.rotation, []).append(slot)
    for rot, group in by_rot.items():
        zd = FP.encode([points[rot]])[:, 0]
        for lo in range(0, len(group), _EVAL_SLAB):
            chunk = group[lo : lo + _EVAL_SLAB]
            stack_c = jnp.stack([coeff[s.pid] for s in chunk], axis=1)
            vals_dev = eval_poly(FP, stack_c, zd)  # (16, B)
            vals = FP.decode(vals_dev)
            for s, val in zip(chunk, vals):
                evals[(s.pid, s.rotation)] = val
    for slot in slots:
        if slot.opened:
            tw.write_scalar(evals[(slot.pid, slot.rotation)])

    t0 = _phase("evaluations", t0)
    # 7. multiopen (BDFG batch opening, one IPA)
    multiopen_prove(srs, dom, tw, coeff, lag, slots, points, evals, blinds)
    _phase("multiopen+ipa", t0)
    return tw.finalize()


def multiopen_prove(srs, dom, tw, coeff, lag, slots, points, evals, blinds=None):
    import secrets

    blinds = blinds or {}
    n = dom.n
    v = tw.challenge()
    u = tw.challenge()
    rot_order = multiopen_point_order(slots)

    omega_tbl = jnp.asarray(dom.omega_powers())
    q_lag_total = None
    _FOLD_SLAB = 64  # bound peak memory: stack at most 64 columns at once
    p_group = []  # (rot, P_lag, P_coeff, r_value)
    for rot in rot_order:
        group = [s for s in slots if s.opened and s.rotation == rot]
        weights = []
        vi = 1
        r_val = 0
        for s in group:
            weights.append(vi)
            r_val = (r_val + vi * evals[(s.pid, rot)]) % P
            vi = vi * v % P
        p_lag = None
        p_coeff = None
        for lo in range(0, len(group), _FOLD_SLAB):
            chunk = group[lo : lo + _FOLD_SLAB]
            w_dev = FP.encode(weights[lo : lo + _FOLD_SLAB])[:, :, None]
            lag_stack = jnp.stack([lag[s.pid] for s in chunk], axis=1)
            part_lag = tree_sum(FP, FP.mul(lag_stack, w_dev), axis=1)
            coeff_stack = jnp.stack([coeff[s.pid] for s in chunk], axis=1)
            part_coeff = tree_sum(FP, FP.mul(coeff_stack, w_dev), axis=1)
            p_lag = part_lag if p_lag is None else FP.add(p_lag, part_lag)
            p_coeff = (
                part_coeff if p_coeff is None else FP.add(p_coeff, part_coeff)
            )
        p_blind = sum(
            w * blinds.get(s.pid, 0) for w, s in zip(weights, group)
        ) % P
        p_group.append((rot, p_lag, p_coeff, r_val, p_blind))

    uj = 1
    for rot, p_lag, p_coeff, r_val, _ in p_group:
        z = points[rot]
        denom = FP.sub(omega_tbl, _scalar(z))
        inv_denom = FP.inv(denom)
        numer = FP.sub(p_lag, jnp.broadcast_to(_scalar(r_val), (16, n)))
        term = FP.mul(FP.mul(_scalar(uj), numer), inv_denom)
        q_lag_total = term if q_lag_total is None else FP.add(q_lag_total, term)
        uj = uj * u % P

    q_coeff = dom.lagrange_to_coeff(q_lag_total)
    q_blind = secrets.randbelow(P)
    tw.write_point(commit(srs, q_coeff, blind=q_blind))
    zstar = tw.challenge()
    zd = FP.encode([zstar])[:, 0]

    w_vals = []
    for rot, p_lag, p_coeff, r_val, _ in p_group:
        wv = FP.decode(eval_poly(FP, p_coeff, zd)[:, None])[0]
        w_vals.append(wv)
        tw.write_scalar(wv)

    s_ch = tw.challenge()
    t_coeff = q_coeff
    t_blind = q_blind
    sj = s_ch
    for (_, _, p_coeff, _, p_blind), wv in zip(p_group, w_vals):
        t_coeff = FP.add(t_coeff, FP.mul(_scalar(sj), p_coeff))
        t_blind = (t_blind + sj * p_blind) % P
        sj = sj * s_ch % P

    open_poly(srs, tw, t_coeff, zstar, blind=t_blind)
