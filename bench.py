"""Benchmark harness — prints ONE JSON line for the driver.

Runs on the real TPU chip (default JAX backend). Primary metric: bn254 Fr
NTT throughput at 2^20 (the reference's BenchmarkFFT analogue,
ecc/bn254/fr/fft/fft_test.go:244). Timing is D2H-synced (a small slice of
the result is fetched) because block_until_ready is unreliable through the
axon tunnel. See PERF.md for the current perf analysis.

vs_baseline: the reference publishes no absolute numbers (BASELINE.md); we
compare against a documented anchor for gnark-crypto's bn254 FFT 2^20 on a
modern many-core amd64 box (~20 ms => ~5.2e7 elems/s). Update the anchor
when real reference numbers are measured.
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

GNARK_FFT_2_20_ELEMS_PER_SEC = 5.2e7  # documented anchor, see docstring


def _enable_cache():
    import jax

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_ntt(n=1 << 20, iters=10):
    import jax
    import jax.numpy as jnp
    from gnark_crypto_tpu.ntt import fft as fftm
    from gnark_crypto_tpu.ntt.domain import Domain
    from gnark_crypto_tpu.specs import field as fs

    spec = fs.BN254_FR
    dom = Domain(spec, n, with_coset=False)
    fn = jax.jit(lambda a: fftm.fft(dom, a, fftm.DIF))
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


def bench_f31_ntt(n=1 << 20, iters=20):
    """koalabear NTT — the small-field tier where 32-bit lanes are native."""
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


def main():
    _enable_cache()
    ntt_rate, ntt_dt = bench_ntt()
    try:
        f31_rate, f31_dt = bench_f31_ntt()
    except Exception:
        f31_rate, f31_dt = 0.0, float("inf")
    print(json.dumps({
        "metric": "bn254_fr_ntt_2^20_elems_per_sec",
        "value": round(ntt_rate),
        "unit": "elems/s",
        "vs_baseline": round(ntt_rate / GNARK_FFT_2_20_ELEMS_PER_SEC, 3),
        "extra": {
            "bn254_ntt_2^20_ms": round(ntt_dt * 1e3, 2),
            "koalabear_ntt_2^20_elems_per_sec": round(f31_rate),
            "koalabear_ntt_2^20_ms": round(f31_dt * 1e3, 2),
        },
    }))


if __name__ == "__main__":
    main()
