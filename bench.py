"""Benchmark harness — prints ONE JSON line for the driver.

Runs on the real TPU chip (default JAX backend). Primary metric: bn254 Fr
NTT throughput at 2^20 (the reference's BenchmarkFFT analogue,
ecc/bn254/fr/fft/fft_test.go:244). Timing is D2H-synced (a small slice of
the result is fetched) because block_until_ready is unreliable through the
axon tunnel. See PERF.md for the current perf analysis.

vs_baseline: the reference publishes no absolute numbers and this
environment has no Go toolchain / network egress to measure or fetch any
(BASELINE.md "Status of that action"). Anchors are DERIVED from the
operation-count x microarchitecture model in BASELINE.md ("Derived CPU
anchors", ~±2x uncertainty); per-extra anchors below cite the same table.
"""

import json
import os
import time

import numpy as np

# Persistent compile cache (TPU executables only — this is safe; the
# documented segfault is in the CPU backend's AOT loader, see
# tests/conftest.py). The Pallas NTT pipeline costs ~30-60 s to compile
# cold; a primed cache makes bench startup seconds instead.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_tpu_cache"))

GNARK_FFT_2_20_ELEMS_PER_SEC = 5.2e7  # derived anchor (BASELINE.md table)

# derived CPU anchors for extras (BASELINE.md "Derived CPU anchors"):
# {metric key: anchor in the metric's own unit}
ANCHORS = {
    "koalabear_ntt_2^20": 5.0e7,        # elems/s
    "bn254_ntt_2^24": 4.8e7,            # elems/s (201M muls model)
    "goldilocks_ntt_2^20": 7.0e7,       # elems/s (1-word mul ~2x f31 cost)
    "bn254_g1_msm_2^16": 2.2e6,         # pts/s
    "bn254_g1_msm_2^20": 3.0e6,
    "bn254_g1_msm_2^24": 3.7e6,
    "bn254_pairing_x2048": 3.5e4,       # pairs/s (24-core batch)
    "bn254_pairing_x2048_rerun": 3.5e4,
    "bls12_381_pairing_x2048": 2.5e4,   # ~1.4x bn254 cost per pairing
    "bls24_315_pairing_x2048": 1.5e4,   # E24 tower ~2.3x bn254 cost
    "bw6_761_pairing_x1024": 4.0e3,     # 761-bit field ~9x mul cost
    "bls12_377_pairing_x2048": 2.8e4,   # ~1.25x bn254 cost per pairing
    "bls24_317_pairing_x2048": 1.5e4,   # E24 tower class (as bls24-315)
    "bw6_633_pairing_x1024": 6.0e3,     # 633-bit ~10-word mul ~6x bn254
    "bn254_kzg_commit_2^16": 2.2e6,     # pts/s (== the MSM anchor)
    "bn254_kzg_open_2^16": 2.0e6,       # pts/s (MSM + n division muls)
    "bn254_kzg_verify": 7.7e2,          # verifies/s (2 pairings + 2 SM,
                                        # single proof ~1.3 ms one core)
    "koalabear_sis512_16_2^20": 4.0e7,  # elems/s (fused AVX-512 kernel)
    "goldilocks_sis512_16_2^18": 2.0e7,  # elems/s (4 limbs/elem vs 2)
    "koalabear_poseidon2_16_2^16": 1.0e7,  # perms/s (SIMD permutation16)
    "goldilocks_poseidon2_12_2^16": 5.0e6,  # perms/s (64-bit lanes)
}

# Global wall-clock budget: the persistent compile cache does NOT hit on
# the axon backend (entries are written but never read back), so every
# bench run pays full compiles. Extras are skipped once the deadline is
# close so the primary-metric JSON line ALWAYS prints within the driver's
# timeout.
_T0 = time.time()
DEADLINE_S = float(os.environ.get("GNARK_BENCH_DEADLINE_S", "2700"))


def _time_left() -> float:
    return DEADLINE_S - (time.time() - _T0)


def _enable_cache():
    import jax

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _ntt_once(n, iters):
    import jax
    import jax.numpy as jnp
    from gnark_crypto_tpu.ntt import fft as fftm
    from gnark_crypto_tpu.ntt.domain import Domain
    from gnark_crypto_tpu.specs import field as fs

    spec = fs.BN254_FR
    dom = Domain(spec, n, with_coset=False)
    if n <= 1 << 22:
        # outer jit: one dispatch per transform (tunnel dispatch is
        # 5-10 ms — significant against a 14 ms transform)
        fn = jax.jit(lambda a: fftm.fft(dom, a, fftm.DIF))
    else:
        # eager at 2^23+: the four-step core self-jits with its twiddle
        # tables as runtime ARGUMENTS; an outer jit would capture the
        # 1.6 GB twist table as a program constant and OOM the chip
        fn = lambda a: fftm.fft(dom, a, fftm.DIF)  # noqa: E731
    rng = np.random.default_rng(0)
    base = rng.integers(0, 1 << 12, size=(n, spec.n_limbs), dtype=np.int32)
    a = jnp.asarray(base)
    r = fn(a)
    np.asarray(r[:1])  # compile + true sync
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(r)  # chain output->input: forces serialization
    np.asarray(r[:1])  # D2H forces completion
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def bench_ntt(n=1 << 20, iters=10):
    """Radix-4 fused four-step (the measured-best default: 14.45 ms vs
    17.85 ms radix-2 at 2^20, 2026-08-19 bench chip). The radix-2 variant
    is NOT re-measured here — the compile cache never hits on this
    backend, and the primary metric must print as early as possible."""
    rate, dt = _ntt_once(n, iters)
    return rate, dt, "r4", {"r4": (rate, dt)}


def _f31_ntt_once(n, iters):
    import jax
    import jax.numpy as jnp
    from gnark_crypto_tpu.ntt import fft as fftm
    from gnark_crypto_tpu.ntt.domain import Domain
    from gnark_crypto_tpu.specs import field as fs

    spec = fs.KOALABEAR
    dom = Domain(spec, n, with_coset=False)
    fn = jax.jit(lambda a: fftm.fft(dom, a, fftm.DIF))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, spec.modulus, size=(n,), dtype=np.uint32))
    r = fn(a)
    np.asarray(r[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(r)
    np.asarray(r[:1])
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def bench_f31_ntt(n=1 << 20, iters=20):
    """koalabear NTT — the small-field tier where 32-bit lanes are native.
    Radix-2 (the f31 default; radix-4 measured slower on the bench chip —
    see pallas_ntt_f31.run_stages_pallas_f31)."""
    return _f31_ntt_once(n, iters)


def bench_goldilocks_ntt(n=1 << 20, iters=10):
    """goldilocks NTT on the 2x32 pair engine (field/f64.py; the reference's
    field/goldilocks fft tier)."""
    import jax
    import jax.numpy as jnp
    from gnark_crypto_tpu.ntt import fft as fftm
    from gnark_crypto_tpu.ntt.domain import Domain
    from gnark_crypto_tpu.specs import field as fs

    spec = fs.GOLDILOCKS
    dom = Domain(spec, n, with_coset=False)
    fn = jax.jit(lambda a: fftm.fft(dom, a, fftm.DIF))
    rng = np.random.default_rng(0)
    a = jnp.asarray(
        rng.integers(0, 1 << 32, size=(n, 2), dtype=np.uint32))
    a = a.at[:, 1].set(a[:, 1] & np.uint32(0x7FFFFFFF))  # < q
    r = fn(a)
    np.asarray(r[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(r)
    np.asarray(r[:1])
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


_MSM_BASE = {}


def _msm_points_scalars(n):
    """MSM bench inputs: 2^16 distinct on-device points ([i+1]G via a
    17-bit ladder — the axon tunnel moves ~40 MB/s so host transfer would
    dominate) tiled to n (MSM cost is value-independent; the 2^20 on-device
    generation ladder OOMed the worker in round 3), plus on-device random
    scalars (uniform 13-bit limb rows masked < 2^253 < r)."""
    import jax
    import jax.numpy as jnp
    from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
    from gnark_crypto_tpu.specs import curve as cs

    spec = cs.get_curve("bn254_g1")
    curve = curve_ops(spec)
    nbase = min(n, 1 << 16)
    if "pts" not in _MSM_BASE:
        g = curve.generator_affine()
        base = curve.from_affine(Affine(
            curve.fp.broadcast_to(g.x, (nbase,)),
            curve.fp.broadcast_to(g.y, (nbase,))))
        small = curve.fr.from_int([i + 1 for i in range(nbase)], mont=False)
        _MSM_BASE["pts"] = curve.to_affine(
            curve.scalar_mul(base, small, nbits=17))
    p16 = _MSM_BASE["pts"]
    reps = n // nbase
    pts = p16 if reps == 1 else Affine(jnp.tile(p16.x, (reps, 1)),
                                       jnp.tile(p16.y, (reps, 1)))
    fr = spec.fr
    b, L = fr.limb_bits, fr.n_limbs
    raw = jax.random.randint(jax.random.PRNGKey(n), (n, L), 0, 1 << b,
                             dtype=jnp.int32)
    mask = jnp.asarray([(1 << b) - 1] * (L - 1)
                       + [(1 << (253 - b * (L - 1))) - 1], jnp.int32)
    return spec, pts, raw & mask


def bench_msm(n=1 << 16, iters=4):
    """bn254 G1 MSM (BenchmarkMultiExpG1, multiexp_test.go:301)."""
    from gnark_crypto_tpu.msm.pippenger import msm

    spec, pts, k_dev = _msm_points_scalars(n)

    fell_back = False
    try:
        res = msm(spec, pts, k_dev)
        np.asarray(res.x[:1])  # compile + sync
    except Exception:
        # Mosaic/pallas failure on this hardware: fall back to the XLA
        # point formulas (escape hatch documented in jacobian.py)
        os.environ["GNARK_TPU_NO_PALLAS_POINT"] = "1"
        fell_back = True
        import jax
        jax.clear_caches()
        res = msm(spec, pts, k_dev)
        np.asarray(res.x[:1])
    try:
        t0 = time.perf_counter()
        for _ in range(iters):
            res = msm(spec, pts, k_dev)
        np.asarray(res.x[:1])
        dt = (time.perf_counter() - t0) / iters
    finally:
        if fell_back:  # don't leak the kill switch to later benchmarks
            os.environ.pop("GNARK_TPU_NO_PALLAS_POINT", None)
    return n / dt, dt


def bench_pairing(name="bn254", batch=2048, iters=2):
    """Full pairing throughput, batched lanes (pairing_test.go:538).

    pair() auto-routes to the straight-line Pallas VM on TPU (per-family
    tile widths — ALL 7 families run on-chip since round 5); the eager
    step-kernel path remains the fallback on transient compile failures,
    and the tier that actually ran is reported next to the number."""
    import jax
    from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
    from gnark_crypto_tpu.pairing import api as pairing_api
    from gnark_crypto_tpu.pairing import vm_pairing
    from gnark_crypto_tpu.specs import curve as cs

    g1 = curve_ops(cs.get_curve(f"{name}_g1"))
    if name.startswith("bw6"):
        g2 = curve_ops(cs.get_curve(f"{name}_g2"))
    else:
        from gnark_crypto_tpu.curve.g2 import g2_curve
        g2 = g2_curve(name)
    gp = g1.generator_affine()
    gq = g2.generator_affine()
    P = Affine(g1.fp.broadcast_to(gp.x, (batch,)),
               g1.fp.broadcast_to(gp.y, (batch,)))
    QX = g2.fp.broadcast_to(gq.x, (batch,))
    QY = g2.fp.broadcast_to(gq.y, (batch,))

    def sync(v):
        np.asarray(jax.tree.leaves(v)[0].ravel()[:1])
    vm_pairing.reset_vm(name)   # fresh VM attempt even after earlier fails
    r = pairing_api.pair(name, P, QX, QY)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = pairing_api.pair(name, P, QX, QY)
        sync(r)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt, {"tier": vm_pairing.vm_tier(name)}


_KZG = {}


def bench_kzg_commit(n=1 << 16, iters=4):
    """KZG commit end-to-end (kzg.go:160 Commit == MSM over the SRS;
    kzg_test.go:560 BenchmarkKZGCommit)."""
    from gnark_crypto_tpu.protocols import kzg

    if "srs" not in _KZG:
        _KZG["srs"] = kzg.new_srs("bn254", n, 0x1CEB00DA)
        _KZG["poly"] = _msm_points_scalars(n)[2]  # random fr rows
    srs, poly = _KZG["srs"], _KZG["poly"]
    com = kzg.commit("bn254", srs.pk, poly)
    np.asarray(com.x.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        com = kzg.commit("bn254", srs.pk, poly)
    np.asarray(com.x.ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    _KZG["com"] = com
    return n / dt, dt


def bench_kzg_open(n=1 << 16, iters=2):
    """KZG open: synthetic division + quotient MSM (kzg.go:181 Open,
    kzg_test.go:607 BenchmarkKZGOpen)."""
    import jax.numpy as jnp
    from gnark_crypto_tpu.protocols import kzg

    from gnark_crypto_tpu.curve.jacobian import curve_ops
    from gnark_crypto_tpu.specs import curve as cs

    srs, poly = _KZG["srs"], _KZG["poly"]
    fr = curve_ops(cs.get_curve("bn254_g1")).fr
    point = jnp.asarray(fr.from_int([0x123456789ABCDEF], mont=False))
    pf = kzg.open_poly("bn254", srs.pk, poly, point)
    np.asarray(pf.h.x.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        pf = kzg.open_poly("bn254", srs.pk, poly, point)
    np.asarray(pf.h.x.ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    _KZG["proof"], _KZG["point"] = pf, point
    return n / dt, dt


def bench_kzg_verify(iters=4):
    """KZG verify: 2-pairing check (kzg.go:208, kzg_test.go:622)."""
    from gnark_crypto_tpu.protocols import kzg

    srs = _KZG["srs"]
    com, pf, point = _KZG["com"], _KZG["proof"], _KZG["point"]
    ok = kzg.verify("bn254", com, pf, point, srs.vk)
    assert bool(np.asarray(ok)), "bench proof must verify"
    t0 = time.perf_counter()
    for _ in range(iters):
        ok = kzg.verify("bn254", com, pf, point, srs.vk)
    np.asarray(ok).ravel()
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt, dt


def bench_g2_msm(n=1 << 13, iters=2):
    """bn254 G2 MSM (multiexp_test.go:711 BenchmarkMultiExpG2).

    2^13, not 2^16: the Fp2 accumulate has no fused Pallas tree-level
    kernels, so its XLA graph is ~3x the G1 one per level and the 2^16
    shape exceeded 40 min of remote compile (measured round 5); 2^13
    keeps the same code path at 5 phase-1 levels."""
    import jax.numpy as jnp
    from gnark_crypto_tpu.curve.g2 import g2_curve
    from gnark_crypto_tpu.curve.jacobian import Affine
    from gnark_crypto_tpu.msm.pippenger import msm

    g2 = g2_curve("bn254")
    gq = g2.generator_affine()
    # distinct points: [i+1]G2 for 2^10 points, tiled to n
    nbase = min(n, 1 << 10)
    base = g2.from_affine(Affine(
        g2.fp.broadcast_to(gq.x, (nbase,)),
        g2.fp.broadcast_to(gq.y, (nbase,))))
    small = g2.fr.from_int([i + 1 for i in range(nbase)], mont=False)
    pts1 = g2.to_affine(g2.scalar_mul(base, small, nbits=11))
    reps = n // nbase
    pts = Affine(jnp.tile(pts1.x, (reps,) + (1,) * (pts1.x.ndim - 1)),
                 jnp.tile(pts1.y, (reps,) + (1,) * (pts1.y.ndim - 1)))
    k_dev = _msm_points_scalars(n)[2]
    res = msm(g2, pts, k_dev)
    np.asarray(res.x.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        res = msm(g2, pts, k_dev)
    np.asarray(res.x.ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def bench_sis(field="koalabear", n=1 << 20, iters=4):
    """Ring-SIS hash throughput, degree-512 beta=2^16 instance (the
    reference's fused sis512_16 AVX kernel tier, field/<f>/sis).

    Iterations are queued WITHOUT per-iteration D2H syncs: the hash's
    output is tiny and the tunnel round trip (~10-20 ms) would otherwise
    dominate; one final sync bounds the whole queue."""
    import jax
    import jax.numpy as jnp
    from gnark_crypto_tpu.hashes.sis import rsis
    from gnark_crypto_tpu.specs import field as fs

    spec = fs.get_field(field)
    inst = rsis(field, 42, 9, 16, n)
    rng = np.random.default_rng(5)
    if spec.name == "goldilocks":
        v = jnp.asarray(rng.integers(0, 1 << 32, (n, 2), dtype=np.uint32))
        v = v.at[:, 1].set(v[:, 1] & np.uint32(0x7FFFFFFF))
    else:
        v = jnp.asarray(
            rng.integers(0, spec.modulus, size=(n,), dtype=np.uint32))
    fn = jax.jit(inst.hash)
    r = fn(v)
    np.asarray(np.asarray(r).ravel()[:1])
    t0 = time.perf_counter()
    outs = [fn(v) for _ in range(iters)]
    for r in outs:
        np.asarray(np.asarray(r).ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def bench_goldilocks_poseidon2(n=1 << 16, iters=10):
    """goldilocks Poseidon2-12 on the f64 2x32 engine (round-4 engine,
    first benched round 5; field/goldilocks/poseidon2 tier)."""
    import jax
    import jax.numpy as jnp
    from gnark_crypto_tpu.hashes.poseidon2 import poseidon2

    perm = poseidon2("goldilocks", 12)
    rng = np.random.default_rng(3)
    state = jnp.asarray(rng.integers(0, 1 << 32, size=(12, n, 2),
                                     dtype=np.uint32))
    state = state.at[..., 1].set(state[..., 1] & np.uint32(0x7FFFFFFF))
    fn = jax.jit(perm.permutation)
    r = fn(state)
    np.asarray(r.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(r)
    np.asarray(r.ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def bench_vortex_commit(rows_n=64, nb_cols=1 << 10, iters=2):
    """Vortex commit: RS-encode rows + SIS columns + Merkle
    (field/koalabear/vortex prover.go:48; reported in columns/s)."""
    from gnark_crypto_tpu.protocols import vortex

    p = vortex.new_params(nb_cols, rows_n, num_selected_columns=16)
    rng = np.random.default_rng(7)
    q = p.eng.spec.modulus
    rows = p.eng.from_int(
        [int(v) for v in rng.integers(0, q, size=(rows_n * nb_cols,))],
        mont=False).reshape(rows_n, nb_cols)
    ps = vortex.commit(p, rows)
    np.asarray(np.asarray(ps.root).ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        ps = vortex.commit(p, rows)
        np.asarray(np.asarray(ps.root).ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    return nb_cols * 2 / dt, dt  # encoded columns hashed per second


def bench_poseidon2(n=1 << 16, iters=10):
    """koalabear Poseidon2-16 permutation throughput (poseidon2 bench tier)."""
    import jax
    import jax.numpy as jnp
    from gnark_crypto_tpu.hashes.poseidon2 import poseidon2

    perm = poseidon2("koalabear", 16)
    rng = np.random.default_rng(2)
    # uniform residues are valid Montgomery-form values
    state = jnp.asarray(rng.integers(0, perm.spec.modulus,
                                     size=(16, n), dtype=np.uint32))
    fn = jax.jit(perm.permutation)
    r = fn(state)
    np.asarray(r[:1, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(r)
    np.asarray(r[:1, :1])
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


_LAST_RESULT = None  # best-known result line, printed by the watchdog


def _emit(ntt_rate, extra):
    """Print (and remember) the driver JSON line. Called as soon as the
    primary metric exists and again after each extra completes — if the
    driver's timeout kills us mid-extras, the last complete line already
    carries everything measured so far (round-2 lesson: the driver bench
    run hit rc=124 with NOTHING printed)."""
    global _LAST_RESULT
    import sys
    _LAST_RESULT = json.dumps({
        "metric": "bn254_fr_ntt_2^20_elems_per_sec",
        "value": round(ntt_rate),
        "unit": "elems/s",
        "vs_baseline": round(ntt_rate / GNARK_FFT_2_20_ELEMS_PER_SEC, 3),
        "extra": dict(extra),
    })
    print(_LAST_RESULT, flush=True)
    sys.stdout.flush()


def _start_watchdog():
    """Hard exit at the deadline: re-print the best-known line and die.
    Guards against a wedged TPU dispatch hanging past the driver timeout."""
    import threading

    def fire():
        if _LAST_RESULT is not None:
            print(_LAST_RESULT, flush=True)
        else:
            print(json.dumps({
                "metric": "bn254_fr_ntt_2^20_elems_per_sec", "value": 0,
                "unit": "elems/s", "vs_baseline": 0.0,
                "extra": {"error": "watchdog: deadline before first metric"},
            }), flush=True)
        os._exit(3)

    t = threading.Timer(max(DEADLINE_S - 10.0, 30.0), fire)
    t.daemon = True
    t.start()


def main():
    _start_watchdog()
    _enable_cache()
    extra = {}
    ntt_rate, ntt_dt, ntt_variant, ntt_all = bench_ntt()
    extra["bn254_ntt_2^20_ms"] = round(ntt_dt * 1e3, 2)
    extra["bn254_ntt_variant"] = ntt_variant
    for name, (_, vdt) in ntt_all.items():
        extra[f"bn254_ntt_{name}_ms"] = round(vdt * 1e3, 2)
    _emit(ntt_rate, extra)  # primary metric is safe from here on
    # (name, fn, rough compile budget needed to even start it). Ordering
    # exploits shared compiled programs: kzg commit/open reuse the MSM
    # 2^16 phase kernels; kzg verify reuses the bn254 pairing VM program.
    for key, fn, need in [
            ("koalabear_ntt_2^20", bench_f31_ntt, 120),
            ("goldilocks_ntt_2^20", bench_goldilocks_ntt, 120),
            ("bn254_g1_msm_2^16", bench_msm, 350),
            ("bn254_pairing_x2048", bench_pairing, 300),
            ("bn254_kzg_commit_2^16", bench_kzg_commit, 250),
            ("bn254_kzg_open_2^16", bench_kzg_open, 120),
            ("bn254_kzg_verify", bench_kzg_verify, 120),
            ("koalabear_poseidon2_16_2^16", bench_poseidon2, 60),
            ("goldilocks_poseidon2_12_2^16",
             bench_goldilocks_poseidon2, 80),
            ("koalabear_sis512_16_2^20", bench_sis, 120),
            ("bn254_ntt_2^24", lambda: _ntt_once(1 << 24, 4), 150),
            ("bn254_g1_msm_2^20",
             lambda: bench_msm(1 << 20, iters=2), 400),
            ("bls12_381_pairing_x2048",
             lambda: bench_pairing("bls12_381"), 300),
            ("bls24_315_pairing_x2048",
             lambda: bench_pairing("bls24_315"), 300),
            ("bw6_761_pairing_x1024",
             lambda: bench_pairing("bw6_761", batch=1024), 300),
            ("goldilocks_sis512_16_2^18",
             lambda: bench_sis("goldilocks", 1 << 18), 120),
            ("koalabear_vortex_commit_64x2^10", bench_vortex_commit, 200),
            ("bn254_g1_msm_2^24",
             lambda: bench_msm(1 << 24, iters=1), 700),
            # re-measure the bn254 pairing at the end: its programs are
            # already compiled in-process (~30 s), and the first run —
            # right after the MSM phase — has measured transiently low
            # (679 ms/iter vs 291 for the bls12-381 run minutes later);
            # report both so one bad sample can't define the number
            ("bn254_pairing_x2048_rerun",
             lambda: bench_pairing("bn254", iters=3), 90),
            # complete the 7-family pairing matrix (programs compile in
            # ~20-30 s each; the r5 rehearsal finished every prior extra
            # with ~8 min to spare)
            ("bls12_377_pairing_x2048",
             lambda: bench_pairing("bls12_377"), 150),
            ("bls24_317_pairing_x2048",
             lambda: bench_pairing("bls24_317"), 150),
            ("bw6_633_pairing_x1024",
             lambda: bench_pairing("bw6_633", batch=1024), 150)]:
        # bn254 G2 MSM stays a probe-only number: the fused Fp2 tree
        # kernels (field/pallas/point_add2.py) now cover phase 1 + the
        # fold, but each tree level is a distinct-width Mosaic compile
        # and the remote compile helper pays ~20 min for the full set
        # (measured: scratch/probe_msm_g2.py, PERF.md round-5 table) —
        # too slow for the 45-min bench deadline alongside the matrix.
        if _time_left() < need:
            extra[key + "_skipped"] = f"deadline ({round(_time_left())}s left)"
            continue
        try:
            out = fn()
            rate, dt = out[0], out[1]
            extra[key + "_per_sec"] = round(rate)
            extra[key + "_ms"] = round(dt * 1e3, 2)
            if len(out) > 2:    # e.g. pairing tier: vm vs eager fallback
                for k2, v2 in out[2].items():
                    extra[f"{key}_{k2}"] = v2
            if key in ANCHORS:  # derived anchor, BASELINE.md table
                extra[key + "_vs_anchor"] = round(rate / ANCHORS[key], 3)
        except Exception as e:  # never lose the primary metric
            extra[key + "_error"] = repr(e)[:120]
        _emit(ntt_rate, extra)
    _emit(ntt_rate, extra)


if __name__ == "__main__":
    main()
