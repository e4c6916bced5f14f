"""Benchmark harness — prints ONE JSON line for the driver.

Runs on the real TPU chip (default JAX backend). Primary metric: bn254 Fr
NTT throughput at 2^20 (the reference's BenchmarkFFT analogue,
ecc/bn254/fr/fft/fft_test.go:244). Also measures bn254 G1 MSM points/sec.

vs_baseline: the reference publishes no absolute numbers (BASELINE.md); we
compare against a measured-order-of-magnitude anchor for gnark-crypto's
bn254 FFT 2^20 on a modern many-core amd64 box (~20 ms, i.e. ~5.2e7
elems/sec) so the ratio is meaningful across rounds. Update the anchor when
real reference numbers are measured.
"""

import json
import time

import numpy as np

GNARK_FFT_2_20_ELEMS_PER_SEC = 5.2e7  # documented anchor, see module docstring


def bench_ntt(n=1 << 20, iters=5):
    import jax
    from gnark_crypto_tpu.ntt import fft as fftm
    from gnark_crypto_tpu.ntt.domain import Domain
    from gnark_crypto_tpu.specs import field as fs

    spec = fs.BN254_FR
    dom = Domain(spec, n, with_coset=False)
    fn = jax.jit(lambda a: fftm.fft(dom, a, fftm.DIF))
    rng = np.random.default_rng(0)
    a = jax.numpy.asarray(
        rng.integers(0, 1 << 12, size=(n, spec.n_limbs), dtype=np.int32))
    fn(a).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(a)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def bench_msm(n=1 << 16, iters=3):
    import jax
    from gnark_crypto_tpu.curve.jacobian import Affine, curve_ops
    from gnark_crypto_tpu.msm import pippenger
    from gnark_crypto_tpu.specs import curve as cs

    spec = cs.get_curve("bn254_g1")
    curve = curve_ops(spec)
    # synthetic distinct points: [i+1]G batched via one scalar_mul
    g = curve.generator_affine()
    base = curve.from_affine(Affine(
        curve.fp.broadcast_to(g.x, (n,)), curve.fp.broadcast_to(g.y, (n,))))
    ks_small = curve.fr.from_int([(7 * i + 1) % (1 << 20) for i in range(n)],
                                 mont=False)
    pts = curve.to_affine(curve.scalar_mul(base, ks_small, nbits=20))
    rng = np.random.default_rng(1)
    r = spec.fr.modulus
    scalars = curve.fr.from_int(
        [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % r
         for i in range(n)], mont=False)
    c = pippenger.best_c(n)
    fn = lambda k: pippenger._msm_jit(spec, pts.x, pts.y, c, scalars=k)
    jax.block_until_ready(fn(scalars))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(scalars)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return n / dt, dt


def main():
    ntt_rate, ntt_dt = bench_ntt()
    try:
        msm_rate, msm_dt = bench_msm()
    except Exception:
        msm_rate, msm_dt = 0.0, float("inf")
    print(json.dumps({
        "metric": "bn254_fr_ntt_2^20_elems_per_sec",
        "value": round(ntt_rate),
        "unit": "elems/s",
        "vs_baseline": round(ntt_rate / GNARK_FFT_2_20_ELEMS_PER_SEC, 3),
        "extra": {
            "ntt_2^20_ms": round(ntt_dt * 1e3, 2),
            "msm_g1_2^16_points_per_sec": round(msm_rate),
            "msm_2^16_ms": round(msm_dt * 1e3, 2),
        },
    }))


if __name__ == "__main__":
    main()
