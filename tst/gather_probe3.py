#!/usr/bin/env python
"""Gather probe v3: loop-timed 2D gather formulations vs the chunk scan."""
import json, os, sys, time
sys.path.insert(0, '/root/repo')

def main():
    import jax, jax.numpy as jnp, numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jaybenne_tpu.ops.pallas_transport import GREP, LANES, _gather, _chunk_table

    BSUB = 32
    K = 128
    N = K * LANES
    ITERS = 1000
    TILES = 16
    shape = (BSUB, LANES)
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, N, size=(TILES * BSUB, LANES)).astype(np.int32)
    flat = (rng.standard_normal(N) * 0.001).astype(np.float32)
    results = {}

    def loop_time(name, gather_fn, tab_shape, tab_in, check_fn):
        """Time ITERS iterations of: g = gather(tab, idx); idx = perturb(idx, g)."""
        def kern(idx_ref, tab_ref, o_ref):
            def body(c):
                idx, it = c
                g = gather_fn(tab_ref, idx)
                # index depends on gathered value -> the gather cannot hoist
                nidx = (idx + (g * 1e6).astype(jnp.int32)) & (N - 1)
                return (nidx, it + 1)
            idx, _ = jax.lax.while_loop(
                lambda c: c[1] < ITERS, body, (idx_ref[:], jnp.int32(0)))
            o_ref[:] = idx.astype(jnp.float32)
        try:
            call = pl.pallas_call(
                kern, grid=(TILES,),
                in_specs=[pl.BlockSpec(shape, lambda g: (g, 0), memory_space=pltpu.VMEM),
                          pl.BlockSpec(tab_shape, lambda g: (0, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(shape, lambda g: (g, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((TILES * BSUB, LANES), jnp.float32),
                interpret=interpret)
            jc = jax.jit(call)
            out = np.asarray(jc(jnp.asarray(idx_np), jnp.asarray(tab_in)))
            ok = check_fn(out)
            best = 1e99
            for _ in range(4):
                t0 = time.perf_counter()
                float(jc(jnp.asarray(idx_np), jnp.asarray(tab_in))[0, 0])
                best = min(best, time.perf_counter() - t0)
            per_iter_tile = best / (ITERS * TILES)
            results[name] = {"ok": bool(ok),
                             "per_tile_iter_s": float(f"{per_iter_tile:.3g}")}
        except Exception as exc:
            results[name] = {"error": f"{type(exc).__name__}: {str(exc)[:160]}"}

    # reference semantics for the check: one iteration chain on host
    def host_chain(idxs):
        idx = idxs.copy()
        for _ in range(ITERS):
            g = flat[idx]
            idx = (idx + (g * 1e6).astype(np.int64).astype(np.int32)) & (N - 1)
        return idx.astype(np.float32)
    want = host_chain(idx_np)

    # A: shipped chunk scan over the replicated-chunk table
    tab_rep = np.repeat(flat.reshape(K, 1, LANES), GREP, axis=1).reshape(K * GREP, LANES)
    loop_time("chunk_scan", lambda t, i: _gather(t, i, K),
              (K * GREP, LANES), tab_rep, lambda out: np.array_equal(out, want))

    # B: advanced 2D indexing t[i>>7, i&127]
    t_kl = flat.reshape(K, LANES)
    loop_time("advanced_2d", lambda t, i: t[:][i >> 7, i & (LANES - 1)],
              (K, LANES), t_kl, lambda out: np.array_equal(out, want))

    print(json.dumps({"backend": jax.default_backend(), "K": K, "results": results}))

main()
