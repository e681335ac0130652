"""Pallas kernel layout/throughput matrix on the production-scale codes.

Round-1 left ~2x to the VPU ALU bound unclaimed (STATUS backlog): n=16384
ran the (z, batch) layout at batch_tile=32 (lane underfill) and the "bz"
transposed layout existed but was never measured on the production ladder.
This benchmark times layered decode on the rate-0.742 native3 rung (the 3%
operating point) for each layout/tile and prints the winner — feeding the
`layout="auto"` policy.

Usage: python benchmarks/kernel_layouts.py [N] [BATCH]
(TPU-only; keep other jax processes off the single-tenant device.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from qtpu.ldpc.codes import make_rate_ladder
    from qtpu.ldpc.encode import make_batch_encoder
    from qtpu.ldpc.decode import channel_llr
    from qtpu.ldpc.pallas_bp import default_batch_tile, make_pallas_decoder

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    qber = 0.03
    lad = make_rate_ladder(n, family="native3", alg="layered")
    step = next(s for s in lad.steps if abs(s.effective_rate() - 0.742) < 0.01)
    code = step.code
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2, (B, code.n)).astype(np.uint8)
    pay = np.setdiff1d(np.arange(code.n),
                       np.concatenate([np.arange(c * code.z, (c + 1) * code.z)
                                       for c in step.punct_cols])
                       if step.punct_cols else np.zeros(0, np.int64))
    y = x.copy()
    noise = (rng.random((B, pay.size)) < qber).astype(np.uint8)
    y[:, pay] ^= noise
    syn = make_batch_encoder(code)(jnp.asarray(x))
    llr = np.array(channel_llr(jnp.asarray(y), qber))  # writable host copy
    llr[:, [c for cc in step.punct_cols
            for c in range(cc * code.z, (cc + 1) * code.z)]] = 0.0
    llr = jnp.asarray(llr)
    syn.block_until_ready()

    bt0 = default_batch_tile(code)
    results = {}
    cands = []
    for layout in ("zb", "bz"):
        for bt in sorted({bt0, min(B, 2 * bt0), 8, 16, 32}):
            if B % bt == 0 and (layout == "zb" or code.z % 128 == 0):
                cands.append((layout, bt))
    for layout, bt in sorted(set(cands)):
        try:
            dec = make_pallas_decoder(code, max_iters=60, alg="layered",
                                      batch_tile=bt, layout=layout)
            r = dec(llr, syn)
            r.bits.block_until_ready()
            conv = float(np.asarray(r.converged).mean())
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                r = dec(llr, syn)
            r.bits.block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            results[f"{layout}/bt{bt}"] = {
                "ms": round(dt * 1e3, 3),
                "gbit_per_s": round(B * code.n / dt / 1e9, 3),
                "converged": round(conv, 4),
            }
            print(f"{layout}/bt{bt}: {results[f'{layout}/bt{bt}']}",
                  flush=True)
        except Exception as e:
            results[f"{layout}/bt{bt}"] = f"{type(e).__name__}: {e}"[:120]
            print(f"{layout}/bt{bt}: FAILED {results[f'{layout}/bt{bt}']}",
                  flush=True)
    print(json.dumps({"n": n, "B": B, "results": results}))


if __name__ == "__main__":
    main()
