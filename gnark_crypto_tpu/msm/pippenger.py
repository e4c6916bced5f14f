"""Multi-scalar multiplication (Pippenger) — TPU-native bucket method.

Counterpart of the reference's ``ecc/bn254/multiexp.go`` (``MultiExp``,
``partitionScalars:710``, ``processChunkG1BatchAffine``), re-designed for XLA:

  * signed window digits (same math as ``partitionScalars`` — signed digits
    in [-2^(c-1), 2^(c-1)] halve the bucket count) computed limb-parallel;
  * the data-dependent *bucket scatter* (reference hot loops A/B) does not
    vectorize; instead each window sorts points by digit magnitude (XLA sort,
    cheap vs field ops) and reduces equal-digit runs with a **segmented
    associative scan** (work-efficient: ~2N masked point-adds over full-width
    lanes, ~2 log2 N sequential rounds instead of N sequential bucket writes);
  * segment tails scatter into the bucket array with a plain XLA ``set``
    scatter (unique indices — no combining needed);
  * the weighted bucket sweep runs once, vectorized across all windows;
  * final window fold = Horner with c doublings per window
    (``msmReduceChunkG1Affine`` multiexp.go:303).

Everything is one jit program per (curve, N, c); scalars are plain (non-
Montgomery) fr values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from gnark_crypto_tpu.curve.jacobian import Affine, Curve, Jac, _sel, curve_ops
from gnark_crypto_tpu.specs.curve import CurveSpec


def best_c(n: int) -> int:
    """Window size heuristic (reference bestC cost model, multiexp.go:76-96)."""
    if n <= 1 << 5:
        return 3
    if n <= 1 << 8:
        return 5
    if n <= 1 << 12:
        return 8
    if n <= 1 << 16:
        return 10
    if n <= 1 << 20:
        return 13
    return 16


def signed_digits(curve: Curve, scalars, c: int):
    """Decompose plain fr scalars into signed base-2^c digits.

    Returns (mags, negs): int32[(nwin, N)] magnitudes in [0, 2^(c-1)] and
    sign masks. Same borrow cascade as ``partitionScalars`` multiexp.go:757+.
    """
    fr = curve.fr
    nbits = fr.spec.modulus.bit_length()
    nwin = -(-nbits // c) + 1  # +1: final borrow can spill into a top window
    half = 1 << (c - 1)
    full = 1 << c

    if fr.elem_dims:
        b = fr.spec.limb_bits
        L = fr.spec.n_limbs

        def window_bits(w):
            lo = w * c
            val = None
            for i in range(L):
                lstart = i * b
                if lstart + b <= lo or lstart >= lo + c:
                    continue
                piece = scalars[..., i]
                if lstart >= lo:
                    sh = lstart - lo
                    part = piece << sh if sh else piece
                else:
                    part = piece >> (lo - lstart)
                val = part if val is None else val | part
            if val is None:
                val = jnp.zeros(scalars.shape[:-1], jnp.int32)
            return val & (full - 1)
    else:
        def window_bits(w):
            lo = w * c
            if lo >= 32:
                return jnp.zeros(scalars.shape, jnp.int32)
            return ((scalars >> jnp.uint32(lo)).astype(jnp.int32)) & (full - 1)

    mags, negs = [], []
    carry = None
    for w in range(nwin):
        t = window_bits(w)
        if carry is not None:
            t = t + carry
        big = t > half
        carry = big.astype(jnp.int32)
        mag = jnp.where(big, full - t, t)
        mags.append(mag)
        negs.append(big)
    return jnp.stack(mags), jnp.stack(negs)


def _bucket_accumulate(curve: Curve, points: Affine, mag, neg, c: int):
    """One window: -> bucket array Jac[(2^(c-1)+1, ...)] (slot 0 unused).

    Work-optimal segmented tree reduction over the digit-sorted points:
    each level pairs adjacent nodes (a node carries the partial sums of its
    leftmost and rightmost digit-runs), merging boundary runs with ONE
    point-add per pair and scattering completed interior runs into their
    bucket. Total point-add work is ~N (widths halve per level), replacing
    the previous log-stride segmented scan's N*log2(N) full-width adds.
    A digit's run completes at exactly one level, so per-level bucket
    scatters have unique indices.
    """
    f = curve.fp
    n = mag.shape[0]
    half = 1 << (c - 1)

    # signed point selection; digit 0 -> infinity
    py = f.where(neg, f.neg(points.y), points.y)
    pj = curve.from_affine(Affine(points.x, py))
    pj = _sel(f, mag == 0, curve.inf_jac(f.eshape(points.x)), pj)

    order = jnp.argsort(mag)
    mag_s = mag[order]
    pj_s = jax.tree.map(lambda a: a[order], pj)

    # pad to a power of two so every tree level has even width; digit-0
    # infinity entries extend the (unused) zero-run at the sorted front
    m = 1 << (n - 1).bit_length()
    if m != n:
        inf_pad = curve.inf_jac((m - n,))
        pj_s = jax.tree.map(lambda z, a: jnp.concatenate([z, a], axis=0),
                            inf_pad, pj_s)
        mag_s = jnp.concatenate([jnp.zeros((m - n,), mag_s.dtype), mag_s])
        n = m

    buckets = curve.inf_jac((half + 1,))

    def scatter(bk, valid, pt, d):
        idx = jnp.where(valid, d, 0)
        return Jac(*(bc.at[idx].set(f.where(valid, pc, bc[idx]))
                     for bc, pc in zip(bk, pt)))

    pre = suf = pj_s              # leftmost / rightmost run partial sums
    pre_d = suf_d = mag_s
    single = jnp.ones((n,), bool)  # node spans a single digit-run
    while pre.x.shape[0] > 1:
        l_pre, l_pre_d = jax.tree.map(lambda a: a[0::2], Jac(*pre)), pre_d[0::2]
        l_suf, l_suf_d = jax.tree.map(lambda a: a[0::2], Jac(*suf)), suf_d[0::2]
        r_pre, r_pre_d = jax.tree.map(lambda a: a[1::2], Jac(*pre)), pre_d[1::2]
        r_suf, r_suf_d = jax.tree.map(lambda a: a[1::2], Jac(*suf)), suf_d[1::2]
        l_single, r_single = single[0::2], single[1::2]

        mid = curve.add(Jac(*l_suf), Jac(*r_pre))
        eq = l_suf_d == r_pre_d
        # interior-run completions -> buckets
        emit_a = (~l_single) & ((~eq) | (~r_single))
        pt_a = _sel(f, eq, mid, Jac(*l_suf))
        buckets = scatter(buckets, emit_a, pt_a, l_suf_d)
        emit_b = (~eq) & (~r_single)
        buckets = scatter(buckets, emit_b, Jac(*r_pre), r_pre_d)
        # new node
        pre = _sel(f, l_single & eq, mid, Jac(*l_pre))
        suf = _sel(f, r_single & eq, mid, Jac(*r_suf))
        pre_d, suf_d = l_pre_d, r_suf_d
        single = l_single & r_single & eq

    ones = jnp.ones((1,), bool)
    buckets = scatter(buckets, ones, Jac(*pre), pre_d)
    buckets = scatter(buckets, ones & ~single, Jac(*suf), suf_d)
    return buckets


def _tree_sum(curve: Curve, p: Jac, axis: int):
    """Sum a Jac batch along ``axis`` with log-depth pairwise adds."""
    n = p.x.shape[axis]
    while n > 1:
        if n % 2:
            pad = curve.inf_jac(
                tuple(1 if i == axis else d
                      for i, d in enumerate(curve.fp.eshape(p.x))))
            p = jax.tree.map(
                lambda z, a: jnp.concatenate([a, z], axis=axis), pad, p)
            n += 1
        lo = jax.tree.map(lambda a: lax.slice_in_dim(a, 0, n // 2, axis=axis),
                          p)
        hi = jax.tree.map(lambda a: lax.slice_in_dim(a, n // 2, n, axis=axis),
                          p)
        p = curve.add(Jac(*lo), Jac(*hi))
        n //= 2
    return Jac(*jax.tree.map(lambda a: jnp.squeeze(a, axis), p))


def _weighted_sweep(curve: Curve, buckets: Jac, c: int,
                    n_chunks: int = 128):
    """buckets (nwin, half+1, ...) -> window totals sum_j j*B_j (nwin, ...).

    The reference's running-sum sweep (for j = half..1: S += B_j; T += S,
    multiexp.go bucket sweep) is a 2^(c-1)-step sequential chain — hostile
    to the TPU. Chunked equivalent: split each window's buckets into S
    chunks of m = half/S; run the work-optimal running sweep on all
    nwin*S chunks in parallel (m wide steps), producing local weighted
    sums T_k and chunk sums C_k with j = k*m + i:

        sum_j j*B_j = sum_k T_k + m * sum_k k*C_k

    sum_k T_k is a log-depth tree sum; sum_k k*C_k reuses the identity
    sum_k k*C_k = sum_{k>=1} suffix_k (suffix_k = sum_{j>=k} C_j), computed
    with a log-depth Hillis-Steele suffix scan; m*X is log2(m) doublings.
    """
    f = curve.fp
    half = 1 << (c - 1)
    nwin = buckets.x.shape[0]
    S = min(half, n_chunks)
    m = half // S

    # (nwin, half) buckets j=1..half -> (m, nwin*S) scan order i=m..1
    rev = jax.tree.map(
        lambda a: a[:, 1:].reshape(nwin * S, m, *a.shape[2:])[:, ::-1]
        .swapaxes(0, 1), buckets)
    s0 = curve.inf_jac((nwin * S,))

    def body(carry, bj):
        s, t = carry
        s = curve.add(s, Jac(*bj))
        t = curve.add(t, s)
        return (s, t), None

    (c_k, t_k), _ = lax.scan(body, (s0, s0), tuple(rev))

    t_k = jax.tree.map(lambda a: a.reshape(nwin, S, *a.shape[1:]), t_k)
    sum_t = _tree_sum(curve, Jac(*t_k), axis=1)
    if S == 1:
        return sum_t

    # suffix scan over chunks: suffix_k = sum_{j >= k} C_j
    suf = jax.tree.map(lambda a: a.reshape(nwin, S, *a.shape[1:]), c_k)
    stride = 1
    while stride < S:
        shifted = jax.tree.map(
            lambda a: jnp.concatenate(
                [a[:, stride:],
                 jnp.zeros_like(a[:, :stride])], axis=1), suf)
        added = curve.add(Jac(*suf), Jac(*shifted))
        # entries past the end stay as-is (their shifted operand is the
        # all-zero infinity encoding, which curve.add already absorbs)
        suf = added
        stride *= 2
    # sum_k k*C_k = sum_{k=1..S-1} suffix_k
    w = _tree_sum(curve, Jac(*jax.tree.map(lambda a: a[:, 1:], suf)), axis=1)
    for _ in range(m.bit_length() - 1):  # * m (power of two)
        w = curve.double(w)
    return curve.add(sum_t, w)


def _fold_windows(curve: Curve, totals: Jac, c: int):
    """Horner fold: acc = sum_w 2^(cw) * T_w (msmReduceChunkG1Affine).

    lax.scan over windows, c static doublings per step — graph stays O(c).
    """
    nwin = totals.x.shape[0]
    acc = Jac(*jax.tree.map(lambda a: a[nwin - 1], totals))
    rest = jax.tree.map(lambda a: a[: nwin - 1][::-1], totals)

    def body(acc, tw):
        for _ in range(c):
            acc = curve.double(acc)
        return curve.add(acc, Jac(*tw)), None

    acc, _ = lax.scan(body, acc, tuple(rest))
    return acc


def _resolve(spec_or_curve) -> Curve:
    """Accept a CurveSpec or a pre-built Curve (G2 over extension fields
    needs its tower engine, which a bare spec cannot rebuild)."""
    if isinstance(spec_or_curve, Curve):
        return spec_or_curve
    return curve_ops(spec_or_curve)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _msm_jit(spec: CurveSpec, px, py, c: int, scalars=None):
    curve = _resolve(spec)
    points = Affine(px, py)
    mags, negs = signed_digits(curve, scalars, c)
    nwin = mags.shape[0]

    def window(w_carry, xs):
        mag, neg = xs
        return w_carry, _bucket_accumulate(curve, points, mag, neg, c)

    _, buckets = lax.scan(window, 0, (mags, negs))
    totals = _weighted_sweep(curve, buckets, c)
    return _fold_windows(curve, totals, c)


def msm(spec: CurveSpec, points: Affine, scalars, c: int | None = None) -> Jac:
    """MultiExp: sum_i scalars[i] * points[i] (reference multiexp.go:21).

    points: Affine batch (N); scalars: plain fr array (N). Returns Jac.
    ``spec`` may also be a Curve instance (required for G2 groups over
    extension fields, e.g. ``g2_curve("bn254")``).
    """
    n = points.x.shape[0]
    assert scalars.shape[0] == n, "len(points) != len(scalars)"
    c = c or best_c(n)
    return _msm_jit(spec, points.x, points.y, c, scalars=scalars)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _batch_scalar_mul_jit(spec, bx, by, c: int, scalars=None):
    curve = _resolve(spec)
    f = curve.fp
    half = 1 << (c - 1)
    n = scalars.shape[0]

    # shared signed-digit base table [inf, B, 2B, .., half*B] — built once
    # at batch 1 (2^(c-1) sequential adds, negligible vs the scan)
    b1 = Jac(f.reshape(bx, (1,)), f.reshape(by, (1,)),
             f.broadcast_to(f.ones(), (1,)))
    entries = [curve.inf_jac((1,)), b1]
    for _ in range(half - 1):
        entries.append(curve.add(entries[-1], b1))
    table = Jac(*(jnp.concatenate(comp, axis=0)
                  for comp in zip(*entries)))       # (half+1, ...)

    mags, negs = signed_digits(curve, scalars, c)

    def body(acc, xs):
        mag, neg = xs
        for _ in range(c):
            acc = curve.double(acc)
        t = Jac(*(jnp.take(comp, mag, axis=0) for comp in table))
        t = Jac(t.x, f.where(neg, f.neg(t.y), t.y), t.z)
        return curve.add(acc, t), None

    acc0 = curve.inf_jac((n,))
    rev = jax.tree.map(lambda a: a[::-1], (mags, negs))  # MSB window first
    acc, _ = lax.scan(body, acc0, rev)
    return acc


def batch_scalar_mul(spec: CurveSpec, base: Affine, scalars,
                     c: int | None = None) -> Jac:
    """[k_i]B for one shared base B (g1.go:1316 BatchScalarMultiplicationG1,
    used by KZG SRS generation): one signed-digit window table shared by
    every lane, then nbits doublings + nbits/c table adds per lane — c-fold
    fewer adds than the plain batched ladder.

    base: single affine point (element shape () or (1,)); scalars: plain fr
    array (N). Returns Jac (N). ``spec`` may be a Curve (G2 engines).
    """
    curve = _resolve(spec)
    n = scalars.shape[0]
    c = c or max(2, min(10, best_c(n)))
    f = curve.fp
    bx, by = base.x, base.y
    if f.eshape(bx) == (1,):
        bx, by = jax.tree.map(lambda a: a[0], (bx, by))
    return _batch_scalar_mul_jit(spec, bx, by, c, scalars=scalars)


def fold(spec: CurveSpec, points: Affine, coeff: int,
         c: int | None = None) -> Jac:
    """sum_i coeff^i * points[i] (reference Fold, multiexp.go:321) — the
    random-linear-combination primitive used by batch verifiers."""
    curve = _resolve(spec)
    r = curve.spec.fr.modulus
    n = points.x.shape[0]
    ks, acc = [], 1
    for _ in range(n):
        ks.append(acc)
        acc = acc * coeff % r
    return msm(spec, points, curve.fr.from_int(ks, mont=False), c=c)


def msm_naive(spec: CurveSpec, points: Affine, scalars) -> Jac:
    """Reference oracle: per-point scalar_mul + tree add (for tests)."""
    curve = _resolve(spec)
    pj = curve.from_affine(points)
    prods = curve.scalar_mul(pj, scalars)
    acc = jax.tree.map(lambda a: a[0], prods)
    acc = Jac(*acc)
    for i in range(1, points.x.shape[0]):
        acc = curve.add(acc, Jac(*jax.tree.map(lambda a: a[i], prods)))
    return acc
