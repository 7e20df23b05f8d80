#!/usr/bin/env python
"""Gather probe v2: 2D formulations (Mosaic said 'Only 2D gather is supported')."""
import json, os, sys, time
sys.path.insert(0, '/root/repo')

def main():
    import jax, jax.numpy as jnp, numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jaybenne_tpu.ops.pallas_transport import GREP, LANES

    BSUB = 32
    K = 128  # power-of-2 chunk count
    N = K * LANES
    shape = (BSUB, LANES)
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, N, size=shape).astype(np.int32)
    flat = rng.standard_normal(N).astype(np.float32)
    t_kl = flat.reshape(K, LANES)       # entry i at (i>>7, i&127)
    want = flat[idx_np]
    results = {}

    def run(name, kernel, tab_shape, tab_in, want_out):
        try:
            call = pl.pallas_call(
                kernel, grid=(1,),
                in_specs=[pl.BlockSpec(shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
                          pl.BlockSpec(tab_shape, lambda g: (0, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                interpret=interpret)
            jc = jax.jit(call)
            out = np.asarray(jc(jnp.asarray(idx_np), jnp.asarray(tab_in)))
            ok = bool(np.array_equal(out, want_out))
            t0 = time.perf_counter()
            for _ in range(3): float(jc(jnp.asarray(idx_np), jnp.asarray(tab_in))[0, 0])
            results[name] = {"ok": ok, "per_call_s": float(f"{(time.perf_counter()-t0)/3:.3g}")}
        except Exception as exc:
            results[name] = {"error": f"{type(exc).__name__}: {str(exc)[:160]}"}

    # A: advanced indexing t[row, rel]
    def kern_adv(idx_ref, tab_ref, o_ref):
        idx = idx_ref[:]
        o_ref[:] = tab_ref[:][idx >> 7, idx & (LANES - 1)]
    run("advanced_2d", kern_adv, (K, LANES), t_kl, want)

    # B: cross-sublane taa with power-of-2 K
    row_np = (idx_np >> 7).astype(np.int32)
    want_b = np.take_along_axis(t_kl, row_np, axis=0)
    def kern_sub(idx_ref, tab_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:] >> 7, axis=0)
    run("cross_sublane_k128", kern_sub, (K, LANES), t_kl, want_b)

    # C: wide-row lane gather: table (BSUB, N//BSUB), indices from idx_ref
    t_wide = flat.reshape(BSUB, N // BSUB)
    wmask = N // BSUB - 1
    want_c = np.take_along_axis(t_wide, (idx_np & wmask), axis=1)[:, :LANES]
    def kern_wide(idx_ref, tab_ref, o_ref):
        g = jnp.take_along_axis(tab_ref[:], idx_ref[:] & wmask, axis=1)
        o_ref[:] = g[:, :LANES]
    run("wide_row_taa_512", kern_wide, (BSUB, N // BSUB), t_wide, want_c)

    print(json.dumps({"backend": jax.default_backend(), "results": results}))

main()
