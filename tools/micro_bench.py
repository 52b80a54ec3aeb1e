"""Microbenchmark of the primitive ops the pipeline leans on, on the
real device, using the forced-D2H slope protocol (profile_stages.py):
each op is wrapped in a K-iteration lax.scan whose carry data-depends on
the op output; per-op time = (t(K2)-t(K1))/(K2-K1).

Grounds the round-4 perf redesign: which of sort / gather / scatter /
cumsum / shift is actually slow on this TPU, and by how much.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avian_tpu.utils.cache import enable as enable_cache

enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

K1 = int(os.environ.get("PROF_K1", "4"))
K2 = int(os.environ.get("PROF_K2", "16"))

M = 10_000        # colliders
NE = 80_000       # grid entries (8 per collider)
W = 32            # sap window
NC = NE * W + 16 * M  # candidate rows (2.72M)
CAP = 80_000      # contact capacity


def forced(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.asarray(out).reshape(-1)[0])
    return time.perf_counter() - t0


def slope(make_body, init):
    def mk(k):
        @jax.jit
        def many(x):
            def body(c, _):
                return make_body(c), None
            return jax.lax.scan(body, x, None, length=k)[0]
        return many

    f1, f2 = mk(K1), mk(K2)
    forced(f1, init)
    forced(f2, init)
    t1, t2 = forced(f1, init), forced(f2, init)
    return (t2 - t1) / (K2 - K1) * 1e3


def main():
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} K1={K1} K2={K2}", flush=True)
    # enter degraded mode deliberately
    _ = float(jnp.zeros(()) + 1.0)

    keys = jnp.asarray(rng.integers(0, 1 << 30, NE), jnp.int32)
    table = jnp.asarray(rng.standard_normal((M, 3)), jnp.float32)
    big_idx = jnp.asarray(rng.integers(0, M, NC), jnp.int32)
    med_idx = jnp.asarray(rng.integers(0, M, NE), jnp.int32)
    slots = jnp.asarray(rng.permutation(NC)[:NC], jnp.int32) % CAP
    vals = jnp.asarray(rng.standard_normal(NC), jnp.float32)
    ok = jnp.asarray(rng.integers(0, 2, NC).astype(bool))

    def chain(x):
        # fold a scalar into the carry so scan iterations data-chain
        return x

    results = {}

    # 1. argsort NE i32
    def f_argsort(c):
        o = jnp.argsort(keys + c[0].astype(jnp.int32), stable=True)
        return c + o[:2].astype(jnp.float32) * 1e-20
    results["argsort_80k"] = slope(f_argsort, jnp.zeros((2,)))

    # 1b. multi-operand sort: keys + 8 carried values
    ops = [jnp.asarray(rng.standard_normal(NE), jnp.float32) for _ in range(8)]
    def f_msort(c):
        k = keys + c[0].astype(jnp.int32)
        out = jax.lax.sort([k] + [o + c[0] for o in ops], num_keys=1)
        return c + out[1][:2] * 1e-20
    results["sort_80k_x9ops"] = slope(f_msort, jnp.zeros((2,)))

    # 2. big gather: [2.72M] rows from [10k, 3]
    def f_gather_big(c):
        g = table[(big_idx + c[0].astype(jnp.int32)) % M]
        return c + g[:2, 0] * 1e-20
    results["gather_2.7M_from_10k_x3"] = slope(f_gather_big, jnp.zeros((2,)))

    # 2b. medium gather: [80k] rows from [10k, 3]
    def f_gather_med(c):
        g = table[(med_idx + c[0].astype(jnp.int32)) % M]
        return c + g[:2, 0] * 1e-20
    results["gather_80k_from_10k_x3"] = slope(f_gather_med, jnp.zeros((2,)))

    # 3. W static shifts of an 80k array (the slice alternative to window
    # gather)
    arr = jnp.asarray(rng.standard_normal(NE), jnp.float32)
    def f_shifts(c):
        a = arr + c[0]
        acc = jnp.zeros((2,))
        s = 0.0
        for k in range(1, W + 1):
            s = s + jnp.sum(a[k:] * a[:-k][: NE - k])
        return c + s * 1e-20 + acc
    results["shifts_80k_x32"] = slope(f_shifts, jnp.zeros((2,)))

    # 4. scatter 2.72M -> 80k (drop mode), non-unique
    def f_scatter(c):
        out = jnp.zeros((CAP,), jnp.float32).at[slots].set(
            vals + c[0], mode="drop"
        )
        return c + out[:2] * 1e-20
    results["scatter_2.7M_to_80k"] = slope(f_scatter, jnp.zeros((2,)))

    # 4b. scatter with unique_indices=True
    def f_scatter_u(c):
        out = jnp.zeros((CAP,), jnp.float32).at[slots].set(
            vals + c[0], mode="drop", unique_indices=True
        )
        return c + out[:2] * 1e-20
    results["scatter_2.7M_unique"] = slope(f_scatter_u, jnp.zeros((2,)))

    # 4c. small scatter 80k -> 80k unique
    slots_s = jnp.asarray(rng.permutation(CAP), jnp.int32)
    vals_s = jnp.asarray(rng.standard_normal(CAP), jnp.float32)
    def f_scatter_s(c):
        out = jnp.zeros((CAP,), jnp.float32).at[slots_s].set(
            vals_s + c[0], mode="drop", unique_indices=True
        )
        return c + out[:2] * 1e-20
    results["scatter_80k_unique"] = slope(f_scatter_s, jnp.zeros((2,)))

    # 5. cumsum 2.72M
    def f_cumsum(c):
        s = jnp.cumsum(ok.astype(jnp.int32) + c[0].astype(jnp.int32))
        return c + s[:2].astype(jnp.float32) * 1e-20
    results["cumsum_2.7M"] = slope(f_cumsum, jnp.zeros((2,)))

    # 5b. cumsum 80k
    def f_cumsum_s(c):
        s = jnp.cumsum(
            ok[:NE].astype(jnp.int32) + c[0].astype(jnp.int32)
        )
        return c + s[:2].astype(jnp.float32) * 1e-20
    results["cumsum_80k"] = slope(f_cumsum_s, jnp.zeros((2,)))

    # 6. sort 2.72M i32 (top-K compaction alternative)
    big_keys = jnp.asarray(rng.integers(0, 1 << 30, NC), jnp.int32)
    def f_bigsort(c):
        o = jnp.sort(big_keys + c[0].astype(jnp.int32))
        return c + o[:2].astype(jnp.float32) * 1e-20
    results["sort_2.7M"] = slope(f_bigsort, jnp.zeros((2,)))

    # 7. elementwise flops baseline: 2.7M fma chain x16
    data = jnp.asarray(rng.standard_normal(NC), jnp.float32)
    def f_ew(c):
        x = data + c[0]
        for _ in range(16):
            x = x * 1.000001 + 0.5
        return c + x[:2] * 1e-20
    results["elementwise_2.7M_x16"] = slope(f_ew, jnp.zeros((2,)))

    for name, ms in results.items():
        print(f"{name:>28}: {ms:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
