#!/usr/bin/env python
"""Probe: can Mosaic lower a LARGE in-kernel table gather natively?

The census kernels' remaining per-iteration cost is dominated by the chunked
slab scan: ``_gather`` reads a K-chunk table at 3 vector ops per chunk
(take_along_axis within each 128-lane chunk + range select), because a lane
can only gather within its own 128-entry chunk. If the installed Mosaic can
lower ``jnp.take`` / ``take_along_axis`` with indices spanning a LARGER table
(a true dynamic gather across sublanes), the scan collapses from O(K) to
O(1) and the grid kernel's body cost drops ~40%.

This probe tries several formulations on a (BSUB, LANES) index tile against
a K*LANES-entry table and reports which compile AND return correct values,
with timings. Run on TPU; failures are caught per-formulation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from jaybenne_tpu.ops.pallas_transport import GREP, LANES, _gather

    BSUB = 32
    K = 108  # the 64^3 slab chunk count
    N = K * LANES
    shape = (BSUB, LANES)
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, N, size=shape).astype(np.int32)
    # chunked-lane layout: entry i lives at chunk i>>7, lane i&127; within a
    # chunk the GREP sublane rows REPLICATE the 128 values (how _chunk_table
    # stores tables)
    flat = rng.standard_normal(N).astype(np.float32)
    tab_np = np.repeat(
        flat.reshape(K, 1, LANES), GREP, axis=1
    ).reshape(K * GREP, LANES)
    want = flat[idx_np]

    results = {}

    def run(name, kernel, tab_shape, tab_in, iters=200):
        try:
            call = pl.pallas_call(
                kernel,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        tab_shape, lambda g: (0, 0), memory_space=pltpu.VMEM
                    ),
                ],
                out_specs=pl.BlockSpec(
                    shape, lambda g: (0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                interpret=interpret,
            )
            jc = jax.jit(call)
            out = np.asarray(jc(jnp.asarray(idx_np), jnp.asarray(tab_in)))
            ok = bool(np.array_equal(out, want))
            t0 = time.perf_counter()
            for _ in range(3):
                float(jc(jnp.asarray(idx_np), jnp.asarray(tab_in))[0, 0])
            dt_s = (time.perf_counter() - t0) / 3
            results[name] = {"ok": ok, "per_call_s": float(f"{dt_s:.4g}")}
        except Exception as exc:
            results[name] = {"error": f"{type(exc).__name__}: {str(exc)[:200]}"}

    # A: the shipped chunk scan (control)
    def kern_scan(idx_ref, tab_ref, o_ref):
        def body(c):
            acc, it = c
            g = _gather(tab_ref, idx_ref[:], K)
            return (acc + g * 1e-6, it + 1)

        acc, _ = jax.lax.while_loop(
            lambda c: c[1] < 1, body, (jnp.zeros(shape, jnp.float32), jnp.int32(0))
        )
        o_ref[:] = _gather(tab_ref, idx_ref[:], K) + acc * 0.0

    run("chunk_scan_control", kern_scan, (K * GREP, LANES), tab_np)

    # B: flat jnp.take over a (1, N)-shaped table ref
    def kern_take_flat(idx_ref, tab_ref, o_ref):
        t = tab_ref[:].reshape(-1)
        o_ref[:] = jnp.take(t, idx_ref[:], axis=0)

    run(
        "take_flat",
        kern_take_flat,
        (8, N // 8) if N % 8 == 0 else (1, N),
        flat.reshape(8, N // 8) if N % 8 == 0 else flat.reshape(1, N),
    )

    # C (capability probe, different truth): CROSS-SUBLANE dynamic gather —
    # out[s, l] = t[row[s, l], l] over a (K, LANES) table. Not by itself the
    # slab gather (the lane coordinate stays fixed), but if Mosaic lowers it
    # natively a lane-partitioned slab layout could be designed around it.
    t_kl = tab_np.reshape(K, GREP, LANES)[:, 0, :]  # (K, LANES)
    row_np = (idx_np >> 7).astype(np.int32)
    want_c = np.take_along_axis(t_kl, row_np, axis=0)

    def kern_sublane(idx_ref, tab_ref, o_ref):
        row = idx_ref[:] >> 7
        o_ref[:] = jnp.take_along_axis(tab_ref[:], row, axis=0)

    try:
        call = pl.pallas_call(
            kern_sublane,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            interpret=interpret,
        )
        jc = jax.jit(call)
        out = np.asarray(jc(jnp.asarray(idx_np), jnp.asarray(t_kl)))
        ok = bool(np.array_equal(out, want_c))
        t0 = time.perf_counter()
        for _ in range(3):
            float(jc(jnp.asarray(idx_np), jnp.asarray(t_kl))[0, 0])
        dt_s = (time.perf_counter() - t0) / 3
        results["cross_sublane_taa"] = {"ok": ok, "per_call_s": float(f"{dt_s:.4g}")}
    except Exception as exc:
        results["cross_sublane_taa"] = {
            "error": f"{type(exc).__name__}: {str(exc)[:200]}"
        }

    print(json.dumps({"backend": jax.default_backend(), "K": K,
                      "results": results}))


if __name__ == "__main__":
    main()
