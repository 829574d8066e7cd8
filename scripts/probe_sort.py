"""Micro-probe: TPU argsort/sort costs at block-table shapes, single vs
batched across the 3 grid families. Fetch-synced."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def timeit(name, fn, args, n=30):
    outs = [fn(*args) for _ in range(2)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[-1]).ravel()[:1]
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]
    print(f"{name:40s} {(time.time()-t0)/n*1e3:8.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    k1 = jnp.asarray(rng.integers(0, 1 << 30, size=(12288,), dtype=np.int32))
    k3 = jnp.asarray(rng.integers(0, 1 << 30, size=(3, 12288), dtype=np.int32))
    pay = jnp.asarray(rng.integers(0, 1 << 30, size=(4, 12288), dtype=np.int32))
    pay3 = jnp.asarray(
        rng.integers(0, 1 << 30, size=(3, 4, 12288), dtype=np.int32)
    )

    timeit("argsort 12288", jax.jit(jnp.argsort), (k1,))
    timeit("argsort (3,12288) batched", jax.jit(lambda k: jnp.argsort(k, axis=-1)), (k3,))

    def sort_payload(k, p):
        return jax.lax.sort((k,) + tuple(p), dimension=-1, num_keys=1)

    timeit("lax.sort key+4pay 12288", jax.jit(sort_payload), (k1, tuple(pay)))
    timeit(
        "lax.sort key+4pay (3,12288)",
        jax.jit(sort_payload),
        (k3, tuple(pay3[:, i] for i in range(4))),
    )

    def argsort_take(k, p):
        o = jnp.argsort(k)
        return jnp.take(jnp.stack(p, axis=1), o, axis=0)

    timeit("argsort+take(N,4) 12288", jax.jit(argsort_take), (k1, tuple(pay)))

    # scatter probe: N single-lane scatter-min into S slots
    S = 16384
    slot = jnp.asarray(rng.integers(0, S, size=(12288,), dtype=np.int32))
    val = k1

    def scat(slot, val):
        return jnp.full((S,), np.iinfo(np.int32).max, jnp.int32).at[slot].min(val)

    timeit("scatter-min 12288 -> 16384", jax.jit(scat), (slot, val))

    def gath(slot, val):
        t = scat(slot, val)
        return t[slot] == val

    timeit("scatter-min + gather-back", jax.jit(gath), (slot, val))

    # cumsum over table
    occ = jnp.asarray(rng.integers(0, 2, size=(S,), dtype=np.int32))
    timeit("cumsum 16384", jax.jit(jnp.cumsum), (occ,))


if __name__ == "__main__":
    main()
