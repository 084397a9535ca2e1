"""Decoder-eval shootout on the real TPU (VERDICT r1 weak #2 / next #5).

Compares, at 512³-extraction tile sizes, the ways to evaluate the CBN
decoder on a batch of query points:
  a) current pipeline path: CbnDecoder.apply (f32, XLA)
  b) folded XLA (bf16 matmuls, per-latent constant-folded CBN affines)
  c) folded XLA mixed (bf16 MXU / f32 VPU chain)
The retired Pallas kernel's sweep results (it lost to (b) on every
configuration — v1 serial, v2 multi-stream ILP, v2 bf16 chain) are recorded
in surfd_tpu/ops/decoder_kernel.py's module docstring; the kernels
themselves live in git history before the retirement commit.

Usage: python scripts/bench_decoder_eval.py [P_log2=19]
"""

import sys
import time

sys.path.insert(0, ".")
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/surfd_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from surfd_tpu.models.decoder import CbnDecoder, CoordsEncoder, udf_from_logits
from surfd_tpu.ops.decoder_kernel import fold_decoder, folded_udf, folded_udf_mixed

LATENT = 32
HID = 512
LAYERS = 5


def main(p_log2: int = 19):
    P = 2 ** p_log2
    dec = CbnDecoder(latent_dim=LATENT, hidden_dim=HID, num_hidden_layers=LAYERS)
    enc = CoordsEncoder()
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(LATENT,)), jnp.float32)
    dvars = dec.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 63)), jnp.zeros((1, LATENT))
    )
    # nonzero running stats/zero-init weights so all paths do real math
    dvars = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape, scale=0.05), a.dtype) + a, dvars
    )
    pts = jnp.asarray(rng.uniform(-1, 1, (P, 3)), jnp.float32)

    def current_one(args, p):
        variables, l = args
        return udf_from_logits(dec.apply(variables, enc.encode(p[None]), l[None])[0], 0.1)

    def folded_one(args, p):
        variables, l = args
        return folded_udf(fold_decoder(variables, l, 0.1), p)


    # All compute chained inside ONE jit over (K, chunk, 3) slabs; only a
    # scalar comes back. Timing whole-array returns through the axon tunnel
    # measures dispatch latency, not compute (the d2h is lazy).
    K, chunk = 8, P // 8
    slabs = pts.reshape(K, chunk, 3)

    def mixed_one(args, p):
        variables, l = args
        return folded_udf_mixed(fold_decoder(variables, l, 0.1), p)

    current = jax.jit(lambda a, s: jax.lax.map(lambda x: current_one(a, x), s).sum())
    folded_xla = jax.jit(lambda a, s: jax.lax.map(lambda x: folded_one(a, x), s).sum())
    folded_mix = jax.jit(lambda a, s: jax.lax.map(lambda x: mixed_one(a, x), s).sum())

    def timeit(name, fn, *args, n=5):
        float(fn(*args))  # compile + warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        mpts = P / best / 1e6
        print(f"{name:28s} {best*1e3:9.2f} ms   {mpts:9.1f} Mpts/s")
        return best

    print(f"P = {P} points, decoder {HID}x{LAYERS}, latent {LATENT}")
    print(f"device: {jax.devices()[0]}")
    timeit("current (f32 XLA)", current, (dvars, lat), jnp.asarray(slabs))
    timeit("folded  (bf16 XLA)", folded_xla, (dvars, lat), jnp.asarray(slabs))
    timeit("folded  (mixed XLA)", folded_mix, (dvars, lat), jnp.asarray(slabs))
    # numerical sanity: bf16 folded vs f32 current
    a = np.asarray(jax.jit(current_one)((dvars, lat), pts[:65536]))
    b = np.asarray(jax.jit(folded_one)((dvars, lat), pts[:65536]))
    m = np.asarray(jax.jit(mixed_one)((dvars, lat), pts[:65536]))
    print(f"max |folded_xla - current| = {np.abs(a-b).max():.2e} (max_dist 0.1)")
    print(f"max |folded_mix - current| = {np.abs(a-m).max():.2e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 19)
