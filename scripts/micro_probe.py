"""Micro-benchmarks on the real chip, tunnel-safe methodology:
chain N dependent executions of the same program, sync ONCE, divide by N.
The axon relay pipelines async dispatches, so per-dispatch sync latency
(~20 ms) cancels out — matching how the real bench loop behaves."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def chain(name, fn, x0, n=24):
    """fn must map its output pytree back into its input pytree."""
    x = fn(x0)
    jax.block_until_ready(x)
    x = x0
    t0 = time.time()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / n
    print(f"{name:46s} {dt*1e3:9.2f} ms/iter", flush=True)


def main():
    rng = np.random.default_rng(0)

    chain("noop x+1 (8,128)", jax.jit(lambda x: x + 1.0),
          jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32)))

    # 6x6 eigh x16 scan, output feeds input
    @jax.jit
    def eigh_scan(H):
        def step(c, _):
            lam, V = jnp.linalg.eigh(c)
            c = V @ jnp.diag(lam + 1e-3) @ V.T
            return c, lam
        c, _ = jax.lax.scan(step, H, None, length=16)
        return c
    H0 = rng.normal(size=(6, 6)).astype(np.float32)
    chain("eigh(6x6) x16 scan", eigh_scan, jnp.asarray(H0 @ H0.T + np.eye(6, dtype=np.float32)))

    # argsort: chain by re-keying from the permutation
    for N in (131072, 65536, 32768, 16384):
        @jax.jit
        def sort_chain(k):
            o = jnp.argsort(k)
            return k[o] ^ (o * 40503).astype(jnp.int32)
        chain(f"argsort int32 {N}", sort_chain,
              jnp.asarray(rng.integers(0, 1 << 30, size=N).astype(np.int32)))

    # row take: idx -> rows -> new idx derived from data
    R = 8192
    table = jnp.asarray(rng.normal(size=(R, 128)).astype(np.float32))
    for M in (1 << 20, 1 << 19, 1 << 18, 1 << 16):
        @jax.jit
        def take_chain(idx, t=table):
            rows = jnp.take(t, idx, axis=0)  # (M,128)
            s = rows[:, :4].sum(axis=-1)
            return (idx + s.astype(jnp.int32) + 1) & (R - 1)
        chain(f"row take M={M} from (8192,128)", take_chain,
              jnp.asarray(rng.integers(0, R, size=M).astype(np.int32)))

    # scalar take
    V = 65536
    vec = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
    for M in (1 << 20, 1 << 18):
        @jax.jit
        def stake_chain(idx, v=vec):
            g = v[idx]
            return (idx + g.astype(jnp.int32) + 1) & (V - 1)
        chain(f"scalar take M={M} from (65536,)", stake_chain,
              jnp.asarray(rng.integers(0, V, size=M).astype(np.int32)))

    # segment_sum rows
    N = 131072
    vals = jnp.asarray(rng.normal(size=(N, 10)).astype(np.float32))
    @jax.jit
    def seg_chain(s, v=vals):
        out = jax.ops.segment_sum(v, s, num_segments=65537)  # (65537,10)
        return (s + out[:1, 0].astype(jnp.int32) + 1) % 65537
    chain("segment_sum (131k,10)->65537", seg_chain,
          jnp.asarray(rng.integers(0, 65537, size=N).astype(np.int32)))

    # scatter set
    @jax.jit
    def scat_chain(t):
        out = jnp.zeros((N,), jnp.int32).at[t].set(jnp.arange(N, dtype=jnp.int32))
        return (t + out + 1) % N
    chain("scatter set (131k,)", scat_chain,
          jnp.asarray(rng.integers(0, N, size=N).astype(np.int32)))

    # cumsum
    @jax.jit
    def cs_chain(x):
        return jnp.cumsum(x) * 1e-6
    chain("cumsum 131k f32", cs_chain,
          jnp.asarray(rng.normal(size=(N,)).astype(np.float32)))

    # 2-key lexsort
    @jax.jit
    def lex_chain(a):
        o = jnp.lexsort((a, a >> 24))
        return a[o] ^ (o * 40503).astype(jnp.int32)
    chain("lexsort 2-key 131k", lex_chain,
          jnp.asarray(rng.integers(0, 1 << 30, size=N).astype(np.int32)))

    # top_k
    @jax.jit
    def topk_chain(x):
        v, i = jax.lax.top_k(x, 8)
        return x + v.sum() * 1e-9
    chain("top_k(8) over (16384,216)", topk_chain,
          jnp.asarray(rng.normal(size=(16384, 216)).astype(np.float32)))


if __name__ == "__main__":
    main()
