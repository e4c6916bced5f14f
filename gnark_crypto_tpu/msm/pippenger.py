"""Multi-scalar multiplication (Pippenger) — TPU-native bucket method.

Counterpart of the reference's ``ecc/bn254/multiexp.go`` (``MultiExp``,
``partitionScalars:710``, ``processChunkG1BatchAffine``), re-designed for XLA:

  * signed window digits (same math as ``partitionScalars`` — signed digits
    in [-2^(c-1), 2^(c-1)] halve the bucket count) computed limb-parallel;
  * the data-dependent *bucket scatter* (reference hot loops A/B) does not
    vectorize; instead points are sorted by (window, digit) key (XLA sort,
    cheap vs field ops) and equal-key runs reduce with a **segmented tree
    reduction** (work-efficient: ~N point-adds over full-width lanes,
    log2 N sequential rounds instead of N sequential bucket writes);
  * the tree nodes are **batch-affine** (the TPU face of the reference's
    ``processChunkG1BatchAffine`` / ``batchAddG1Affine`` g1.go:1396): every
    level does ONE complete masked affine add across the full width, with
    the per-lane inversion amortized to ~3 muls by a log-depth Montgomery
    batch-inverse — ~10 field muls per point-add instead of ~26 for the
    complete Jacobian formulas (GNARK_MSM_JAC=1 restores the Jacobian tree);
  * ALL windows share one flat sorted array (keys carry the window index),
    so each tree level needs a single width-1 Fermat inversion — windows
    are grouped only to bound peak memory (GNARK_MSM_MAX_FLAT lanes);
  * segment tails scatter into the (Jacobian) bucket array with a plain
    XLA ``set`` scatter (unique indices — no combining needed);
  * the weighted bucket sweep runs once, vectorized across all windows,
    every reduction a flat constant-shape strided lax.scan;
  * final window fold = Horner with c doublings per window
    (``msmReduceChunkG1Affine`` multiexp.go:303), run inside one Pallas
    kernel on TPU (the scan form is pure dispatch latency).

Everything is one jit program per (curve, N, c); scalars are plain (non-
Montgomery) fr values.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from gnark_crypto_tpu.curve.jacobian import Affine, Curve, Jac, _sel, curve_ops
from gnark_crypto_tpu.specs.curve import CurveSpec


def best_c(n: int) -> int:
    """Window size heuristic (reference bestC cost model, multiexp.go:76-96),
    re-measured on the bench chip round 5: c=11 beats 10/12 at 2^16
    (162.0 / 167.2 / 169.3 ms), c=13 beats 14 at 2^20 (2.83 / 2.91 s)."""
    if n <= 1 << 5:
        return 3
    if n <= 1 << 8:
        return 5
    if n <= 1 << 12:
        return 8
    if n <= 1 << 16:
        return 11
    if n <= 1 << 20:
        return 13
    return 16


def _tune_path() -> str:
    return os.environ.get(
        "GNARK_MSM_TUNE_FILE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".msm_tune.json"))


def _autotune_c(curve: Curve, points: Affine, scalars, n: int) -> int:
    """Measured counterpart of the reference's bestC cost model
    (multiexp.go:76-141): times the eager MSM at {bestC-1, bestC, bestC+1}
    on the live inputs and persists the winner per (backend, curve, n-pow2)
    so later processes skip the sweep. Opt-in (GNARK_MSM_AUTOTUNE=1) —
    each candidate pays a full compile on backends without a warm cache.
    """
    import json
    import time as _time

    key = f"{jax.default_backend()}:{curve.spec.name}:{1 << max(0, (n - 1).bit_length())}"
    path = _tune_path()
    try:
        with open(path) as fh:
            cache = json.load(fh)
    except Exception:
        cache = {}
    if key in cache:
        return int(cache[key])
    base = best_c(n)
    cands = sorted({max(2, base - 1), base, base + 1})
    times = {}
    for cand in cands:
        res = _msm_eager(curve, points, scalars, cand)   # compile + warm
        jax.tree.map(lambda a: a.block_until_ready(), tuple(res))
        t0 = _time.perf_counter()
        res = _msm_eager(curve, points, scalars, cand)
        import numpy as _np
        _np.asarray(res.x.ravel()[:1])                   # true D2H sync
        times[cand] = _time.perf_counter() - t0
    bestc = min(times, key=times.get)
    cache[key] = bestc
    try:
        with open(path, "w") as fh:
            json.dump(cache, fh, indent=1, sort_keys=True)
    except OSError:
        pass
    return bestc


def n_windows(nbits: int, c: int) -> int:
    """Signed-digit window count. The borrow cascade can spill past the top
    scalar bit only when c divides nbits exactly: the top window then holds
    up to 2^c - 1 and a carry pushes it past 2^(c-1). For a partial top
    window of r = nbits % c > 0 bits, its value + carry <= 2^r <= 2^(c-1),
    so the spill window would always be zero — dropping it saves a full
    window of bucket work (reference partitionScalars allocates the spill
    digit unconditionally, multiexp.go:717 nbChunks+1)."""
    nwin = -(-nbits // c)
    return nwin + 1 if nbits % c == 0 else nwin


def signed_digits(curve: Curve, scalars, c: int):
    """Decompose plain fr scalars into signed base-2^c digits.

    Returns (mags, negs): int32[(nwin, N)] magnitudes in [0, 2^(c-1)] and
    sign masks. Same borrow cascade as ``partitionScalars`` multiexp.go:757+.
    """
    fr = curve.fr
    nbits = fr.spec.modulus.bit_length()
    nwin = n_windows(nbits, c)
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


def _sel2(f, cond, a: Affine, b: Affine) -> Affine:
    return Affine(f.where(cond, a.x, b.x), f.where(cond, a.y, b.y))


def _pair_split(x):
    """(2k, ...) -> even/odd halves via reshape + static index.

    NEVER use ``x[0::2]`` on TPU for this: XLA lowers the stride-2 slice as
    a gather (~9x slower than the reshape form — 102 ms vs 12 ms for an
    int32 (2^21, 22) array on the bench chip)."""
    k = x.shape[0] // 2
    v = x.reshape(k, 2, *x.shape[1:])
    return v[:, 0], v[:, 1]


def _log_batch_inverse(f, d):
    """Montgomery-trick batch inversion with log-depth tree scans.

    ``field.mont.batch_inverse`` is a sequential lax.scan (fine for host-ish
    widths); the MSM tree needs full-lane-width inversions, so this variant
    does pairwise up-sweep products (N muls), ONE width-1 Fermat inversion,
    and a pairwise down-sweep (2N muls) — 2*log2(N) sequential rounds total.
    Zero entries must be pre-masked to 1 by the caller.
    """
    w = f.eshape(d)[0]
    m = 1 << (w - 1).bit_length()
    if m != w:
        pad = f.broadcast_to(f.ones(), (m - w,))
        d = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                         d, pad)
    levels = [d]
    # Stop the tree once a single Pallas Fermat-ladder tile can finish the
    # job per-lane (field.mont.inverse routes n <= 128 into one in-VMEM
    # kernel): sweeping all the way to width 1 costs ~14 extra halving-
    # width mul dispatches (~10 ms of pure dispatch latency per inversion
    # through the tunnel) for no compute savings.
    stop_w = 128 if jax.default_backend() == "tpu" else 1
    while f.eshape(levels[-1])[0] > stop_w:
        ev, od = _pair_split(levels[-1])
        levels.append(f.mul(ev, od))
    inv = f.inverse(levels[-1])
    for cur in levels[-2::-1]:
        a, b = _pair_split(cur)
        ia = f.mul(inv, b)
        ib = f.mul(inv, a)
        half = ia.shape[0]
        inv = jnp.stack([ia, ib], axis=1).reshape(2 * half, *ia.shape[1:])
    return inv[:w]


def _affine_add_complete(curve: Curve, p: Affine, q: Affine) -> Affine:
    """Complete short-Weierstrass add on affine batches, one shared batched
    inversion (reference ``batchAddG1Affine`` g1.go:1396 — but masked-complete
    instead of conflict-queued: doubling shares the same inversion by
    swapping the denominator to 2y).

    ~7 field muls per lane + ~3 amortized for the inversion, vs ~26 for the
    complete Jacobian add — the reason MSM buckets are affine here, exactly
    like the reference's batch-affine bucket path (multiexp_affine.go:24).
    """
    f = curve.fp
    shape = f.eshape(p.x)
    p_inf = curve.is_inf_affine(p)
    q_inf = curve.is_inf_affine(q)
    both = (~p_inf) & (~q_inf)
    x_eq = f.equal(p.x, q.x)
    y_eq = f.equal(p.y, q.y)
    is_dbl = x_eq & y_eq & both
    inf_out = (x_eq & (~y_eq) & both) | (is_dbl & f.is_zero(p.y))
    den = f.where(is_dbl, f.double(p.y), f.sub(q.x, p.x))
    ones = f.broadcast_to(f.ones(), shape)
    den = f.where(f.is_zero(den), ones, den)
    dinv = _log_batch_inverse(f, den)
    x2 = f.square(p.x)
    num_dbl = f.add(f.double(x2), x2)  # 3x^2 (+ a)
    if not curve.a_is_zero:
        num_dbl = f.add(num_dbl, f.broadcast_to(
            f.from_int(curve.spec.a), shape))
    num = f.where(is_dbl, num_dbl, f.sub(q.y, p.y))
    s = f.mul(num, dinv)
    x3 = f.sub(f.sub(f.square(s), p.x), q.x)
    y3 = f.sub(f.mul(s, f.sub(p.x, x3)), p.y)
    zero = f.zeros(shape)
    out = Affine(x3, y3)
    out = _sel2(f, inf_out, Affine(zero, zero), out)
    out = _sel2(f, p_inf, q, out)
    out = _sel2(f, q_inf, p, out)
    return out


def _bot_width() -> int:
    """Tree width below which the accumulator switches from unrolled
    affine compaction levels to ONE constant-shape strided lax.scan in
    Jacobian coordinates: the small-width levels are cheap at any formula
    cost, and folding their log2(W) levels into a single compiled body is
    what keeps the whole-MSM XLA graph compilable on TPU.

    Default 2^12 (measured r4: 219.5 ms vs 237.5 ms at 2^14 for bn254
    2^16 — two more cheap affine levels beat two more 16-mul Jacobian
    scan rounds; compile +240 s, paid once per process)."""
    return int(os.environ.get("GNARK_MSM_BOT_W", str(1 << 12)))


def _bucket_accumulate_affine(curve: Curve, points: Affine, mag, neg,
                              c: int) -> Jac:
    """Window GROUP -> Jacobian bucket array ((G*slots + 1, ...) sliced to
    (G, slots)); slot 0 of each window holds digit-0 junk (never swept).

    mag/neg: (G, N). All G windows flatten into ONE sorted array keyed by
    window*slots + digit (distinct windows never share a key, so runs never
    merge across windows). Two phases:

      1. while width > GNARK_MSM_BOT_W: batch-affine compaction levels —
         one complete masked affine add per level with a shared log-depth
         batched inversion (one Pallas Fermat per level);
      2. the remaining log2(BOT_W) levels run in-place at constant width
         under ONE lax.scan (strided pairing, Jacobian adds — no
         inversions), so the compiled graph is O(levels_phase1) not
         O(log N).

    Every digit-run completes exactly once across both phases, so all
    bucket scatters still hit unique keys.
    """
    f = curve.fp
    G, n = mag.shape
    half = 1 << (c - 1)
    slots = half + 1
    sentinel = G * slots

    keys = (mag + (jnp.arange(G, dtype=mag.dtype) * slots)[:, None]
            ).reshape(G * n)
    negf = neg.reshape(G * n)
    # pad to a multiple of 2^L (L = phase-1 levels down to BOT_W), NOT the
    # next power of two: every phase-1 level only needs an even width, so
    # e.g. 27 windows x 2^16 pads to 3462*2^9 (+0.02%) instead of 2^21
    # (+18% wasted full-cost lanes). Phase 2 pads its (<= BOT_W)-wide
    # remainder to a power of two, which is noise at that width.
    bot = _bot_width()
    W0 = G * n
    L = max(0, (W0 - 1).bit_length() - bot.bit_length() + 1)
    m = -(-W0 // (1 << L)) << L
    if m != W0:
        keys = jnp.concatenate(
            [keys, jnp.full((m - W0,), sentinel, keys.dtype)])
        negf = jnp.concatenate(
            [negf, jnp.zeros((m - W0,), negf.dtype)])

    order = jnp.argsort(keys)
    key_s = keys[order]
    neg_s = negf[order]
    pidx = order % n
    # one packed gather for both coordinates: two separate (m, L) row
    # gathers cost 42 ms at m=2^21 on the bench chip, the packed (m, 2L)
    # take 18 ms (row-gather cost scales with rows, not bytes)
    packed = jnp.concatenate([points.x, points.y], axis=-1)
    pk = jnp.take(packed, pidx, axis=0)
    Ld = points.x.shape[-1]
    px, py = pk[..., :Ld], pk[..., Ld:]
    py = f.where(neg_s, f.neg(py), py)
    # digit-0 / sentinel entries -> infinity (key % slots == 0 covers both)
    is_zero_digit = (key_s % slots) == 0
    zero = f.zeros((m,))
    px = f.where(is_zero_digit, zero, px)
    py = f.where(is_zero_digit, zero, py)

    buckets = curve.inf_jac((sentinel + 1,))

    def scatter(bk: Jac, valid, pt: Jac, d):
        idx = jnp.where(valid, d, 0)
        return Jac(*(bc.at[idx].set(f.where(valid, pc, bc[idx]))
                     for bc, pc in zip(bk, pt)))

    # ---- phase 1: batch-affine compaction levels -------------------------
    # Interior-run completions are NOT scattered per level: a full-width
    # bucket scatter costs ~51 ms at 2^21 lanes on the bench chip (XLA:TPU
    # scatter is serialized), and the tree used to pay TWO per level.
    # Instead each level emits (key, x, y) rows densely; run keys are
    # globally unique (a digit run completes at exactly one level), so one
    # argsort over the concatenated emissions + a (sentinel+1)-row gather/
    # scatter rebuilds the bucket array at the end. Emitted points at
    # infinity keep the sentinel key — buckets default to infinity anyway.
    e_keys, e_x, e_y = [], [], []
    pre = suf = Affine(px, py)    # leftmost / rightmost run partial sums
    pre_d = suf_d = key_s
    single = jnp.ones((m,), bool)  # node spans a single digit-run
    pallas_on = (jax.default_backend() == "tpu"
                 and not os.environ.get("GNARK_TPU_NO_PALLAS_POINT"))
    fused = curve._pallas_ok and pallas_on and px.ndim == 2
    # G2 over Fp2: the stacked-tile kernels (field/pallas/point_add2.py)
    fused2 = (getattr(curve, "_pallas2_ok", False) and pallas_on
              and px.ndim == 3)

    def emit(valid, d, pt: Affine, is_inf):
        e_keys.append(jnp.where(valid & (~is_inf), d, sentinel))
        e_x.append(pt.x)
        e_y.append(pt.y)

    while f.eshape(pre.x)[0] > bot:
        pre_xe, pre_xo = _pair_split(pre.x)
        pre_ye, pre_yo = _pair_split(pre.y)
        suf_xe, suf_xo = _pair_split(suf.x)
        suf_ye, suf_yo = _pair_split(suf.y)
        l_pre, r_pre = Affine(pre_xe, pre_ye), Affine(pre_xo, pre_yo)
        l_suf, r_suf = Affine(suf_xe, suf_ye), Affine(suf_xo, suf_yo)
        l_pre_d, r_pre_d = _pair_split(pre_d)
        l_suf_d, r_suf_d = _pair_split(suf_d)
        l_single, r_single = _pair_split(single)

        eq = l_suf_d == r_pre_d
        emit_a = (~l_single) & ((~eq) | (~r_single))
        emit_b = (~eq) & (~r_single)
        if fused or fused2:
            # fused level kernels (field/pallas/point_add.py and the Fp2
            # stacked-tile variants in point_add2.py): one prep kernel
            # (den/num/masks) + the shared inversion + one finish kernel
            # (slope, outputs, tree selects) instead of ~7 mul dispatches
            # and ~10 full-width selects
            if fused:
                from gnark_crypto_tpu.field.pallas.point_add import (
                    affine_finish, affine_prep)
                prep = functools.partial(affine_prep, curve.spec.fp,
                                         curve.spec.a)
                finish = functools.partial(affine_finish, curve.spec.fp,
                                           curve.spec.a)
            else:
                from gnark_crypto_tpu.field.pallas.point_add2 import (
                    affine_finish2, affine_prep2)
                prep = functools.partial(affine_prep2, curve.spec.fp,
                                         curve.fp.nr)
                finish = functools.partial(affine_finish2, curve.spec.fp,
                                           curve.fp.nr)
            den, num, mbits = prep(l_suf.x, l_suf.y, r_pre.x, r_pre.y)
            dinv = _log_batch_inverse(f, den)
            tb = (eq.astype(jnp.int32) + (l_single.astype(jnp.int32) << 1)
                  + (r_single.astype(jnp.int32) << 2))
            (prex, prey, sufx, sufy, pax, pay, za) = finish(
                l_pre.x, l_pre.y, l_suf.x, l_suf.y,
                r_pre.x, r_pre.y, r_suf.x, r_suf.y,
                num, dinv, mbits, tb)
            emit(emit_a, l_suf_d, Affine(pax, pay), f.is_zero(za))
            pre, suf = Affine(prex, prey), Affine(sufx, sufy)
        else:
            mid = _affine_add_complete(curve, l_suf, r_pre)
            pt_a = _sel2(f, eq, mid, l_suf)
            emit(emit_a, l_suf_d, pt_a, curve.is_inf_affine(pt_a))
            # new node
            pre = _sel2(f, l_single & eq, mid, l_pre)
            suf = _sel2(f, r_single & eq, mid, r_suf)
        emit(emit_b, r_pre_d, r_pre, curve.is_inf_affine(r_pre))
        pre_d, suf_d = l_pre_d, r_suf_d
        single = l_single & r_single & eq

    if e_keys:
        ekeys = jnp.concatenate(e_keys)
        epx = jnp.concatenate(e_x, axis=0)
        epy = jnp.concatenate(e_y, axis=0)
        K = min(sentinel + 1, ekeys.shape[0])
        top = lax.slice(jnp.argsort(ekeys), (0,), (K,))
        k_top = jnp.take(ekeys, top)
        valid_top = k_top < sentinel
        pt_top = Affine(jnp.take(epx, top, axis=0),
                        jnp.take(epy, top, axis=0))
        z_top = f.where(valid_top & (~curve.is_inf_affine(pt_top)),
                        f.broadcast_to(f.ones(), (K,)), f.zeros((K,)))
        buckets = scatter(buckets, valid_top,
                          Jac(pt_top.x, pt_top.y, z_top), k_top)

    # ---- phase 2: strided in-place levels, one lax.scan ------------------
    # virtual node of size 2^(j+1) keeps its data at its first slot; step j
    # merges slot i (left, i % 2^(j+1) == 0) with slot i + 2^j (right).
    # Run completions are emitted DENSELY as scan ys (key-or-sentinel rows)
    # instead of scattered per step: the bucket array leaves the scan carry
    # (no per-step churn of (sentinel+1)-row coordinate arrays) and the
    # ~2*log2(B) serialized XLA:TPU scatters collapse into one argsort +
    # one unique-key rebuild at the end, like phase 1.
    B0 = f.eshape(pre.x)[0]
    B = 1 << (B0 - 1).bit_length()
    if B != B0:                    # pad the non-pow2 phase-1 remainder
        padw = B - B0
        zpad = f.zeros((padw,))
        pre = Affine(jnp.concatenate([pre.x, zpad], 0),
                     jnp.concatenate([pre.y, zpad], 0))
        suf = Affine(jnp.concatenate([suf.x, zpad], 0),
                     jnp.concatenate([suf.y, zpad], 0))
        dpad = jnp.full((padw,), sentinel, pre_d.dtype)
        pre_d = jnp.concatenate([pre_d, dpad])
        suf_d = jnp.concatenate([suf_d, dpad])
        single = jnp.concatenate([single, jnp.ones((padw,), bool)])
    preJ = curve.from_affine(pre)
    sufJ = curve.from_affine(suf)
    iota = jnp.arange(B, dtype=jnp.int32)

    def step(carry, j):
        preJ, sufJ, pre_d, suf_d, single = carry
        s = jnp.left_shift(jnp.int32(1), j)
        rl = lambda a: jnp.roll(a, -s, axis=0)  # slot i -> old slot i+s
        r_pre = Jac(*(rl(a) for a in preJ))
        r_suf = Jac(*(rl(a) for a in sufJ))
        r_pre_d, r_suf_d = rl(pre_d), rl(suf_d)
        r_single = rl(single)
        aligned = (iota & (2 * s - 1)) == 0

        mid = curve.add(Jac(*sufJ), r_pre)
        eq = suf_d == r_pre_d
        emit_a = aligned & (~single) & ((~eq) | (~r_single))
        pt_a = _sel(f, eq, mid, Jac(*sufJ))
        key_a = jnp.where(emit_a, suf_d, sentinel)
        emit_b = aligned & (~eq) & (~r_single)
        key_b = jnp.where(emit_b, r_pre_d, sentinel)

        upd = lambda new, old: _sel(f, aligned, new, old)
        new_pre = upd(_sel(f, single & eq, mid, Jac(*preJ)), Jac(*preJ))
        new_suf = upd(_sel(f, r_single & eq, mid, r_suf), Jac(*sufJ))
        new_suf_d = jnp.where(aligned, r_suf_d, suf_d)
        new_single = jnp.where(aligned, single & r_single & eq, single)
        return (tuple(new_pre), tuple(new_suf), pre_d, new_suf_d,
                new_single), (key_a, tuple(pt_a), key_b, tuple(r_pre))

    k_bot = B.bit_length() - 1
    j_keys, j_pts = [], []
    if k_bot:
        carry = (tuple(preJ), tuple(sufJ), pre_d, suf_d, single)
        carry, ys = lax.scan(step, carry,
                             jnp.arange(k_bot, dtype=jnp.int32))
        preJ, sufJ, pre_d, suf_d, single = carry
        preJ, sufJ = Jac(*preJ), Jac(*sufJ)
        key_a, pts_a, key_b, pts_b = ys     # (k_bot, B[, L]) stacks
        j_keys += [key_a.reshape(-1), key_b.reshape(-1)]
        j_pts += [Jac(*(a.reshape(k_bot * B, *a.shape[2:]) for a in pts_a)),
                  Jac(*(a.reshape(k_bot * B, *a.shape[2:]) for a in pts_b))]

    ones1 = jnp.zeros((B,), bool).at[0].set(True)
    j_keys += [jnp.where(ones1, pre_d, sentinel),
               jnp.where(ones1 & ~single, suf_d, sentinel)]
    j_pts += [preJ, sufJ]

    ekeys = jnp.concatenate(j_keys)
    ept = Jac(*(jnp.concatenate(comp, axis=0) for comp in zip(*j_pts)))
    K = min(sentinel + 1, ekeys.shape[0])
    top = lax.slice(jnp.argsort(ekeys), (0,), (K,))
    k_top = jnp.take(ekeys, top)
    buckets = scatter(buckets, k_top < sentinel,
                      Jac(*(jnp.take(a, top, axis=0) for a in ept)), k_top)
    return Jac(*(bc[:sentinel].reshape(G, slots, *bc.shape[1:])
                 for bc in buckets))


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


def _strided_scan_add(curve: Curve, p: Jac, S: int, suffix: bool):
    """Log-depth strided reductions on a flat (nwin*S, ...) Jac batch as ONE
    constant-shape lax.scan (the unrolled per-level loops cost a fresh
    Mosaic/XLA compile per level; the scan body compiles once and keeps one
    jac_add kernel shape for the whole sweep).

    suffix=False: in-window pairwise tree sum — after log2(S) steps the
    window total sits at each window's slot 0.
    suffix=True: in-window Hillis-Steele inclusive suffix sums
    (out[k] = sum_{j>=k} p[j]).
    """
    f = curve.fp
    n = f.eshape(p.x)[0]
    iota = jnp.arange(n, dtype=jnp.int32)

    def step(carry, s):
        cur = Jac(*carry)
        shifted = Jac(*(jnp.roll(a, -s, axis=0) for a in cur))
        added = curve.add(cur, shifted)
        if suffix:
            valid = (iota % S) + s < S
        else:
            valid = ((iota & (2 * s - 1)) == 0) & ((iota % S) + s < S)
        return tuple(_sel(f, valid, added, cur)), None

    strides = jnp.asarray([1 << j for j in range((S - 1).bit_length())],
                          jnp.int32)
    out, _ = lax.scan(step, tuple(p), strides)
    return Jac(*out)


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

    sum_k T_k is a log-depth strided tree sum; sum_k k*C_k reuses the
    identity sum_k k*C_k = sum_{k>=1} suffix_k (suffix_k = sum_{j>=k} C_j),
    computed with a log-depth Hillis-Steele suffix scan; m*X is log2(m)
    doublings. Every reduction runs flat at (nwin*S) width so the whole
    sweep uses one fused point-add kernel shape.
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

    def window_slot0(p):
        return Jac(*(a.reshape(nwin, S, *a.shape[1:])[:, 0] for a in p))

    sum_t = window_slot0(_strided_scan_add(curve, t_k, S, suffix=False))
    if S == 1:
        return sum_t

    # suffix scan over chunks: suffix_k = sum_{j >= k} C_j, then
    # sum_k k*C_k = sum_{k=1..S-1} suffix_k (zero out each window's k=0)
    suf = _strided_scan_add(curve, c_k, S, suffix=True)
    iota = jnp.arange(nwin * S, dtype=jnp.int32)
    k0 = (iota % S) == 0
    suf = _sel(f, k0, curve.inf_jac((nwin * S,)), suf)
    w = window_slot0(_strided_scan_add(curve, suf, S, suffix=False))
    for _ in range(m.bit_length() - 1):  # * m (power of two)
        w = curve.double(w)
    return curve.add(sum_t, w)


def _max_flat() -> int:
    """Peak lane width of the flat batch-affine accumulator (memory bound:
    ~6 coordinate arrays of this width live at the first tree level).

    Default 2^22 (measured r4: bn254 2^20 in 3.60 s vs 3.77 s at 2^21 —
    half the group iterations; ~1.5 GB peak for the level-0 arrays)."""
    return int(os.environ.get("GNARK_MSM_MAX_FLAT", str(1 << 22)))


def _window_totals(curve: Curve, points: Affine, mags, negs, c: int) -> Jac:
    """(nwin, N) digits -> per-window totals sum_j j*B_j, Jac (nwin, ...).

    Windows are grouped so each flat accumulate stays under ``_max_flat()``
    lanes; groups run under lax.scan (one compiled body). Group padding
    windows have zero digits (infinity buckets) and are sliced off."""
    nwin, n = mags.shape
    G = max(1, min(nwin, _max_flat() // max(n, 1)))
    ngroups = -(-nwin // G)
    pad = ngroups * G - nwin
    if pad:
        mags = jnp.concatenate(
            [mags, jnp.zeros((pad, *mags.shape[1:]), mags.dtype)])
        negs = jnp.concatenate(
            [negs, jnp.zeros((pad, *negs.shape[1:]), negs.dtype)])
    mags_g = mags.reshape(ngroups, G, n)
    negs_g = negs.reshape(ngroups, G, n)

    def body(carry, mn):
        mg, ng = mn
        bk = _bucket_accumulate_affine(curve, points, mg, ng, c)
        return carry, tuple(bk)

    _, bks = lax.scan(body, 0, (mags_g, negs_g))  # (ngroups, G, slots, ...)
    buckets = Jac(*(a.reshape(ngroups * G, *a.shape[2:]) for a in bks))
    totals = _weighted_sweep(curve, buckets, c)
    if pad:
        totals = Jac(*jax.tree.map(lambda a: a[:nwin], totals))
    return totals


def _fold_windows(curve: Curve, totals: Jac, c: int):
    """Horner fold: acc = sum_w 2^(cw) * T_w (msmReduceChunkG1Affine).

    On TPU base-field curves the whole c*(nwin-1)-deep chain runs inside
    one Pallas kernel (the scan form is ~270 width-1 dispatches = ~190 ms
    of latency); otherwise lax.scan over windows, c static doublings per
    step — graph stays O(c).
    """
    nwin = totals.x.shape[0]
    pallas_on = (jax.default_backend() == "tpu"
                 and not os.environ.get("GNARK_TPU_NO_PALLAS_POINT")
                 and nwin <= 512)
    if curve._pallas_ok and pallas_on and totals.x.ndim == 2:
        from gnark_crypto_tpu.field.pallas.point_add import jac_fold_windows
        ox, oy, oz = jac_fold_windows(curve.spec.fp, curve.spec.a,
                                      totals.x, totals.y, totals.z, c)
        return Jac(ox[0], oy[0], oz[0])
    if (getattr(curve, "_pallas2_ok", False) and pallas_on
            and totals.x.ndim == 3):
        from gnark_crypto_tpu.field.pallas.point_add2 import (
            jac_fold_windows2)
        ox, oy, oz = jac_fold_windows2(curve.spec.fp, curve.fp.nr,
                                       totals.x, totals.y, totals.z, c)
        return Jac(ox[0], oy[0], oz[0])
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

    if os.environ.get("GNARK_MSM_JAC"):
        # escape hatch: the original complete-Jacobian tree accumulator
        def window(w_carry, xs):
            mag, neg = xs
            return w_carry, _bucket_accumulate(curve, points, mag, neg, c)

        _, buckets = lax.scan(window, 0, (mags, negs))
        totals = _weighted_sweep(curve, buckets, c)
    else:
        totals = _window_totals(curve, points, mags, negs, c)
    return _fold_windows(curve, totals, c)


@functools.lru_cache(maxsize=None)
def _msm_phase_kernels(curve: Curve, c: int):
    """Separately-jitted MSM phases for the eager top-level path.

    One monolithic jit of the whole MSM compiles pathologically slowly on
    the TPU backend (>20 min at 2^16); splitting into digits / per-group
    accumulate / sweep / fold keeps each compile bounded and lets the
    group loop reuse ONE compiled accumulate program. Dispatch overhead is
    a handful of host round trips — noise against the field work.
    """
    dig = jax.jit(lambda s: signed_digits(curve, s, c))
    acc = jax.jit(lambda px, py, m, g: tuple(_bucket_accumulate_affine(
        curve, Affine(px, py), m, g, c)))
    sweep = jax.jit(lambda b: tuple(_weighted_sweep(curve, Jac(*b), c)))
    fold = jax.jit(lambda t: _fold_windows(curve, Jac(*t), c))
    return dig, acc, sweep, fold


def _msm_eager(curve: Curve, points: Affine, scalars, c: int) -> Jac:
    """Top-level (non-traced) MSM: host-dispatched phase kernels."""
    dig, acc, sweep, fold = _msm_phase_kernels(curve, c)
    mags, negs = dig(scalars)
    nwin, n = mags.shape
    G = max(1, min(nwin, _max_flat() // max(n, 1)))
    bks = []
    for g0 in range(0, nwin, G):
        mg, ng = mags[g0:g0 + G], negs[g0:g0 + G]
        if mg.shape[0] < G:  # pad the tail group to reuse the compiled acc
            pad = G - mg.shape[0]
            mg = jnp.concatenate(
                [mg, jnp.zeros((pad, n), mg.dtype)])
            ng = jnp.concatenate(
                [ng, jnp.zeros((pad, n), ng.dtype)])
        bks.append(acc(points.x, points.y, mg, ng))
    buckets = tuple(jnp.concatenate(comp, axis=0)[:nwin]
                    for comp in zip(*bks))
    totals = sweep(buckets)
    return fold(totals)


def msm(spec: CurveSpec, points: Affine, scalars, c: int | None = None) -> Jac:
    """MultiExp: sum_i scalars[i] * points[i] (reference multiexp.go:21).

    points: Affine batch (N); scalars: plain fr array (N). Returns Jac.
    ``spec`` may also be a Curve instance (required for G2 groups over
    extension fields, e.g. ``g2_curve("bn254")``).

    Inputs larger than the flat accumulator budget are split into chunks
    whose partial sums are group-added (the reference's recursive data
    split, multiexp.go:129-141 — here bounding peak HBM instead of
    balancing cores).
    """
    n = points.x.shape[0]
    assert scalars.shape[0] == n, "len(points) != len(scalars)"
    from gnark_crypto_tpu.utils import hostloop
    tracing = hostloop.is_tracing(points.x, points.y, scalars)
    if (c is None and not tracing and n > 1 << 10
            and os.environ.get("GNARK_MSM_AUTOTUNE")):
        curve = _resolve(spec)
        m = min(n, _max_flat())   # chunks never exceed _max_flat points
        c = _autotune_c(curve, Affine(points.x[:m], points.y[:m]),
                        scalars[:m], n)
    c = c or best_c(n)
    if not tracing and not os.environ.get("GNARK_MSM_JAC"):
        curve = _resolve(spec)
        chunk = _max_flat()
        if n <= chunk:
            return _msm_eager(curve, points, scalars, c)
        acc = None
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            part = _msm_eager(
                curve, Affine(points.x[s:e], points.y[s:e]), scalars[s:e], c)
            acc = part if acc is None else curve.add(acc, part)
        return acc
    return _msm_jit(spec, points.x, points.y, c, scalars=scalars)


def _bsm_table(curve: Curve, bx, by, c: int) -> Jac:
    """Signed-digit base table [inf, B, 2B, .., half*B] by log-doubling
    batch extension: T_{2S} = T_S ++ (T_S + [S]B) — log2(half) batched
    adds instead of 2^(c-1) sequential ones (a half=512 sequential chain
    inside one jit emits a 1.2 MB MLIR program that OOM-kills this
    backend's remote compile helper — observed on kzg.new_srs at 2^16)."""
    f = curve.fp
    half = 1 << (c - 1)
    b1 = Jac(f.reshape(bx, (1,)), f.reshape(by, (1,)),
             f.broadcast_to(f.ones(), (1,)))
    table = Jac(*(jnp.concatenate(comp, axis=0)
                  for comp in zip(curve.inf_jac((1,)), b1)))  # [0, B]
    sb = b1                                  # [S]B with S = current size/1
    while table.x.shape[0] < half:
        S = table.x.shape[0]
        sb = curve.add(sb, sb) if S > 2 else (
            curve.add(b1, b1) if S == 2 else sb)  # [S]B
        shifted = curve.add(table, Jac(*(jnp.broadcast_to(
            a, (S, *a.shape[1:])) for a in sb)))
        # entry 0 is infinity: shifted[0] = [S]B exactly (complete add)
        table = Jac(*(jnp.concatenate([t, s], axis=0)
                      for t, s in zip(table, shifted)))
    top = curve.add(sb, sb) if half > 1 else b1   # [half]B
    return Jac(*(jnp.concatenate([t, s], axis=0)
                 for t, s in zip(table, top)))     # (half+1, ...)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _bsm_scan(spec, c: int, tx, ty, tz, scalars=None):
    """Windowed one-base ladder over a precomputed table (runtime arg)."""
    curve = _resolve(spec)
    f = curve.fp
    n = scalars.shape[0]
    table = Jac(tx, ty, tz)
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


def _batch_scalar_mul_jit(spec, bx, by, c: int, scalars=None):
    curve = _resolve(spec)
    table = _bsm_table(curve, bx, by, c)
    return _bsm_scan(spec, c, table.x, table.y, table.z, scalars=scalars)


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
