"""Inner-product-argument polynomial commitment: commit / open / verify.

TPU-native replacement for the IPA inside the reference's halo2 fork
(`create_proof`/`verify_proof`, SURVEY.md §3.3: "~All wall-clock time is
inside create_proof (MSM+NTT)").

Protocol (our own canonical instantiation, standard BCMS/Bulletproofs-style;
the fork's exact framing is unvendored — SURVEY.md §7 hard part #1):

  commit(f)      = MSM(coeffs(f), G)                       (device Pippenger)
  open at x, v = f(x):
    b = (1, x, …, x^{n-1});  k rounds, in round j the vector is split
    lo ‖ hi and folded   a' = u_j·a_lo + u_j⁻¹·a_hi,
                         b' = u_j⁻¹·b_lo + u_j·b_hi,
                         G' = u_j⁻¹·G_lo + u_j·G_hi,
    after sending  L_j = ⟨a_lo, G_hi⟩ + ⟨a_lo, b_hi⟩·U
                   R_j = ⟨a_hi, G_lo⟩ + ⟨a_hi, b_lo⟩·U.
    Final message is the single scalar a₀.

  The prover never folds G in the group: it tracks per-original-index fold
  coefficients γ_t and computes each ⟨·, G_folded⟩ as one full-size MSM over
  the original G with gathered/masked scalars — k rounds × 2 MSMs of a
  constant shape, which XLA compiles once.

  verify: s_t = Π_j (u_j or u_j⁻¹ by bit j of t);  checks
    a₀·⟨s,G⟩ + a₀·⟨s,b⟩·U == P + v·U + Σ u_j²·L_j + u_j⁻²·R_j.

Blinding note: openings ARE zero-knowledge — each round's L/R carries a
fresh ξ·W Pedersen blind and the final message includes the collapsed
blinding scalar ξ (see `open_poly`); `verify_open_deferred` checks the
ξ·W term.  Commitments are hidden with blind·W in `commit`/`commit_many`.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import PointBatch, from_affine_host, host, msm, to_affine_host
from ..curve.host import AffinePoint
from ..field.jfield import FP
from ..field.params import N_LIMBS
from ..poly.ntt import powers, tree_sum
from ..transcript.transcript import TranscriptReader, TranscriptWriter
from .srs import SRS

P = FP.modulus


def _msm_dispatch(scalars_plain: jnp.ndarray, points: PointBatch) -> PointBatch:
    """msm, or the point-sharded mesh msm when a mesh context is active."""
    from ..shard.context import current_mesh

    mesh = current_mesh()
    if mesh is not None and scalars_plain.shape[-1] % mesh.devices.size == 0:
        from ..shard.msm import msm_many_sharded, msm_sharded

        if scalars_plain.ndim == 3:
            return msm_many_sharded(mesh, scalars_plain, points)
        return msm_sharded(mesh, scalars_plain, points)
    from ..curve.msm import msm_many

    if scalars_plain.ndim == 3:
        return msm_many(scalars_plain, points)
    return msm(scalars_plain, points)


def commit(srs: SRS, coeffs: jnp.ndarray, blind: int = 0) -> AffinePoint:
    """Commit to a (16, m) Montgomery coefficient vector, m ≤ 2^k.

    ``blind`` adds blind·W (Pedersen term) for hiding commitments; 0 for
    deterministic/public polynomials (fixed, sigma, instance).  Routed
    through commit_many so every commitment in a proof shares one
    compiled MSM shape."""
    return commit_many(srs, [coeffs], blinds=[blind])[0]


def _single(p: PointBatch) -> PointBatch:
    return PointBatch(p.x[:, None], p.y[:, None], p.z[:, None])


@lru_cache(maxsize=None)
def _fold_maps(k: int):
    """Static gather/mask tables per round.

    pos[t] = t mod m_half-pattern: after j folds the original index t sits at
    logical position t mod (n >> j).
    """
    n = 1 << k
    t = np.arange(n)
    maps = []
    for j in range(k):
        m = n >> j  # current vector length
        pos = t % m
        in_hi = (pos >= m // 2).astype(np.uint32)
        lo_index = np.where(pos >= m // 2, pos - m // 2, pos)  # position within half
        maps.append((lo_index.astype(np.int32), in_hi))
    return maps


def open_poly(
    srs: SRS, tw: TranscriptWriter, coeffs: jnp.ndarray, x: int,
    blind: int = 0, rng=None,
) -> None:
    """IPA opening proof for f(x); appends k (L,R) pairs, a₀ and the
    blinding sync scalar ξ to ``tw``.

    ``coeffs``: (16, m) Montgomery form; ``blind`` is the W-blind of the
    commitment being opened.  Each round's L/R carries fresh blinds so the
    proof is hiding; the final ξ collapses them for the verifier check.
    The caller is responsible for having absorbed the commitment, x, and
    the claimed value v beforehand.
    """
    import secrets

    rand = (lambda: secrets.randbelow(P)) if rng is None else rng
    k, n = srs.k, srs.n
    m = coeffs.shape[-1]
    if m < n:
        coeffs = jnp.concatenate([coeffs, FP.zeros((n - m,))], axis=-1)
    a = coeffs
    b = jnp.asarray(powers(FP, x % P, n))  # Montgomery powers of x
    gamma = FP.ones((n,))
    maps = _fold_maps(k)
    u_base = srs.u_host

    for j in range(k):
        lo_index, in_hi = maps[j]
        lo_index = jnp.asarray(lo_index)
        hi_sel = jnp.asarray(in_hi)  # 1 where original index folds into hi half
        m_j = n >> j
        half = m_j // 2
        a_lo = a[:, :half]
        a_hi = a[:, half:m_j]
        b_lo = b[:, :half]
        b_hi = b[:, half:m_j]
        # L_j = <a_lo, G_hi> + <a_lo, b_hi> U
        #   G_hi positions hold original t with in_hi=1; their half-position
        #   is lo_index[t], so scalar_t = gamma_t * a_lo[lo_index[t]] * in_hi.
        a_lo_full = jnp.take(a_lo, lo_index, axis=-1)
        a_hi_full = jnp.take(a_hi, lo_index, axis=-1)
        wL = FP.mul(gamma, a_lo_full) * hi_sel[None]
        wR = FP.mul(gamma, a_hi_full) * (1 - hi_sel)[None]
        sL = FP.decode(tree_sum(FP, FP.mul(a_lo, b_hi))[:, None])[0]
        sR = FP.decode(tree_sum(FP, FP.mul(a_hi, b_lo))[:, None])[0]
        lr = to_affine_host(
            _msm_dispatch(FP.from_mont(jnp.stack([wL, wR], axis=1)), srs.g)
        )
        L_base, R_base = lr[0], lr[1]
        xi_l, xi_r = rand(), rand()
        L = host.add(L_base, host.scalar_mul(sL, u_base))
        L = host.add(L, host.scalar_mul(xi_l, srs.w_host))
        R = host.add(R_base, host.scalar_mul(sR, u_base))
        R = host.add(R, host.scalar_mul(xi_r, srs.w_host))
        tw.write_point(L)
        tw.write_point(R)
        u = tw.challenge()
        u_inv = pow(u, P - 2, P)
        blind = (blind + u * u % P * xi_l + u_inv * u_inv % P * xi_r) % P
        ud = FP.const(u, a.ndim - 1)
        uid = FP.const(u_inv, a.ndim - 1)
        a = FP.add(FP.mul(ud, a_lo), FP.mul(uid, a_hi))
        b = FP.add(FP.mul(uid, b_lo), FP.mul(ud, b_hi))
        # gamma picks up u_inv for lo-half indices, u for hi-half
        factor = FP.select(hi_sel.astype(bool), FP.mul(gamma, ud), FP.mul(gamma, uid))
        gamma = factor

    a0 = FP.decode(a[:, :1])[0]
    tw.write_scalar(a0)
    tw.write_scalar(blind)  # ξ_final


def verify_open_deferred(
    srs: SRS,
    tr: TranscriptReader,
    commitment: AffinePoint,
    x: int,
    v: int,
):
    """Parse an IPA opening and return its check as a deferred linear
    relation: (g_scalars, terms) where the opening is valid iff

        ⟨g_scalars, G⟩ + Σ (scalar · point) over terms == identity.

    This is the accumulation primitive behind true batch verification
    (the fork's `plonk::BatchVerifier`, test_utils.rs:56-61): N deferred
    relations combine with random weights into ONE size-n MSM.
    """
    k, n = srs.k, srs.n
    lrs = []
    us = []
    for _ in range(k):
        L = tr.read_point()
        R = tr.read_point()
        u = tr.challenge()
        lrs.append((L, R))
        us.append(u)
    a0 = tr.read_scalar()
    xi_final = tr.read_scalar()

    # s vector: s = kron([u_0^{-1}, u_0], [u_1^{-1}, u_1], ...) — round 0
    # controls the most significant bit of the index.  Built by doubling
    # over numpy object arrays (O(n) big-int mults in C-loop ufuncs; the
    # pure-Python version was the whole verifier cost at k=14+).
    u_invs = [pow(u, P - 2, P) for u in us]
    s = np.array([1], dtype=object)
    for u, u_inv in zip(us, u_invs):
        s = np.concatenate([s * u_inv % P, s * u % P])
    # round j splits into lo|hi by the *top* bit: index bit (k-1-j).  The
    # construction above appends the u-branch for the most recently processed
    # round as the LOW bit, so reverse the bit order by reindexing.
    t = np.arange(n, dtype=np.int64)
    rt = np.zeros(n, dtype=np.int64)
    for _ in range(k):
        rt = (rt << 1) | (t & 1)
        t >>= 1
    s_arr = s[rt]

    # b0 = Σ_t s_t x^t = Π_j (u_j^{-1} + u_j·x^{2^{k-1-j}})  — O(k), the
    # standard IPA b(x) product form (bit (k-1-j) of t selects u_j).
    b0 = 1
    for j, (u, u_inv) in enumerate(zip(us, u_invs)):
        b0 = b0 * (u_inv + u * pow(x % P, 1 << (k - 1 - j), P)) % P

    # lhs − rhs == 0:
    #   a0·⟨s,G⟩ + (a0·b0 − v)·U + ξ·W − C − Σ u²·L − Σ u⁻²·R
    g_scalars = s_arr * a0 % P
    terms = [
        ((a0 * b0 - v) % P, srs.u_host),
        (xi_final % P, srs.w_host),
        (P - 1, commitment),
    ]
    for (L, R), u in zip(lrs, us):
        u_inv = pow(u, P - 2, P)
        terms.append((P - u * u % P, L))
        terms.append((P - u_inv * u_inv % P, R))
    return g_scalars, terms


def check_deferred(srs: SRS, g_scalars, terms: list) -> bool:
    """Evaluate one deferred relation (or a random combination of many).

    ``g_scalars``: length-n sequence (list or numpy object array) of ints.
    """
    g_list = [int(s) % P for s in g_scalars]
    acc = to_affine_host(
        _single(msm(FP.encode(g_list, to_mont=False), srs.g))
    )[0]
    for sc, pt in terms:
        if sc % P and pt is not None:
            acc = host.add(acc, host.scalar_mul(sc % P, pt))
    return acc is None  # identity = None in affine host form


def verify_open(
    srs: SRS,
    tr: TranscriptReader,
    commitment: AffinePoint,
    x: int,
    v: int,
) -> bool:
    """Verify an IPA opening.  Device MSM for ⟨s,G⟩, host group ops elsewhere."""
    g_scalars, terms = verify_open_deferred(srs, tr, commitment, x, v)
    return check_deferred(srs, g_scalars, terms)


# columns per fused MSM pass: bounds peak HBM (a chunk's gathered points
# are ~W·B·n·192 bytes) and keeps the compiled shape count small — every
# chunk is padded to exactly _COMMIT_CHUNK columns, so all commit calls of
# one circuit share a single compiled program.
_COMMIT_CHUNK = 64  # default; override with TINYRAM_COMMIT_CHUNK


def _commit_chunk() -> int:
    import os as _os

    return int(_os.environ.get("TINYRAM_COMMIT_CHUNK", _COMMIT_CHUNK))


def commit_many(srs: SRS, coeff_list, blinds=None) -> list[AffinePoint]:
    """Commit to many (16, m) Montgomery coefficient vectors in fused
    batched-MSM passes (see curve.msm.msm_many).  ``blinds[i]`` adds a
    blind·W hiding term per commitment."""
    if not coeff_list:
        return []
    n = srs.n
    padded = []
    for c in coeff_list:
        m = c.shape[-1]
        assert m <= n
        if m < n:
            c = jnp.concatenate([c, FP.zeros((n - m,))], axis=-1)
        padded.append(c)
    out = []
    ch = _commit_chunk()
    for lo in range(0, len(padded), ch):
        chunk = padded[lo : lo + ch]
        # pad the column count to a power of two (min 4): every commit
        # call in a proof then hits one of a tiny set of compiled shapes
        target = 4
        while target < len(chunk):
            target *= 2
        pad_cols = target - len(chunk)
        if pad_cols:
            chunk = chunk + [chunk[0]] * pad_cols
        stack = jnp.stack(chunk, axis=1)  # (16, B, n)
        plain = FP.from_mont(stack)
        pts = _msm_dispatch(plain, srs.g)
        res = to_affine_host(pts)
        out.extend(res[: len(res) - pad_cols] if pad_cols else res)
    if blinds is not None:
        out = [
            host.add(pt, host.scalar_mul(bl % P, srs.w_host)) if bl else pt
            for pt, bl in zip(out, blinds)
        ]
    return out
