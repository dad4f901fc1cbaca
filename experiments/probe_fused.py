"""Probe: fused dual matmul — (D @ x_hot, D^T @ x) in ONE pass over D.

The hybrid SpMM's dense half (ops/hybrid.py) issues two XLA matmuls that
each stream the [N, K] hot block D from HBM (chip_probe.py run_dense shows
XLA reads D at ~220 GB/s per matmul, no cross-matmul fusion), and streaming
D dominates the train step at bench scale (677 MB at K=4096). Both products
contract D against skinny [.., H] operands, so a Pallas kernel can compute
both while reading each D tile once:

    grid (N/BN, K/BK), k innermost
    out[bn]  += D[bn,bk] @ x_hot[bk]     (out block resident across the k row)
    hot[bk]  += D[bn,bk]^T @ x[bn]       (full [K, H] block resident across
                                          the whole grid; dynamic-slice
                                          accumulation at k_i*BK)

If the op is bandwidth-bound (it is: H=128 -> 64 f32 flops/byte, and the
measured f32/HIGHEST MXU rate is far above 220 GB/s * 64), this halves the
dense cost per SpMM application.

    python experiments/probe_fused.py            # on the TPU
    JAX_PLATFORMS=cpu python experiments/probe_fused.py --check-only
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = 128
R = 8  # chained applications per timing


def log(msg):
    print(msg, flush=True)


from pytextgcn_tpu.ops.fused_dual import fused_dual  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=41472)  # bench scale, 512-aligned
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--check-only", action="store_true")
    p.add_argument("--bn", type=int, default=512)
    p.add_argument("--bk", type=int, default=512)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)

    # correctness at a small shape first
    n_s, k_s = 1024, 512
    d_s = jnp.asarray(rng.standard_normal((n_s, k_s)), jnp.float32)
    x_s = jnp.asarray(rng.standard_normal((n_s, H)), jnp.float32)
    xh_s = jnp.asarray(rng.standard_normal((k_s, H)), jnp.float32)
    out, hot = jax.jit(
        functools.partial(fused_dual, bn=256, bk=256, interpret=interpret)
    )(d_s, x_s, xh_s)
    prec = jax.lax.Precision.HIGHEST
    ref_out = jnp.dot(d_s, xh_s, preferred_element_type=jnp.float32, precision=prec)
    ref_hot = jax.lax.dot_general(
        d_s, x_s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hot), np.asarray(ref_hot), rtol=1e-5, atol=1e-4)
    log("correctness: fused == two XLA matmuls (small shape)")
    if args.check_only:
        return

    n, k = args.n, args.k
    dt = jnp.dtype(args.dtype)
    d = jnp.asarray(rng.standard_normal((n, k)) / 100, dt)
    x0 = jnp.asarray(rng.standard_normal((n, H)), dt)
    xh0 = jnp.asarray(rng.standard_normal((k, H)), dt)

    def chain(step):
        @jax.jit
        def many(d, x, xh):
            def body(carry, _):
                x, xh = carry
                out, hot = step(d, x, xh)
                # products accumulate in f32; the carry keeps the probe dtype
                return ((out / n).astype(x.dtype), (hot / n).astype(xh.dtype)), None

            (x, xh), _ = jax.lax.scan(body, (x, xh), None, length=R)
            return x

        return many

    # match ops/hybrid.spmm_hybrid's precision policy per dtype
    prec_t = jax.lax.Precision.HIGHEST if dt == jnp.float32 else jax.lax.Precision.DEFAULT

    def xla_dual(d, x, xh):
        x, xh = x.astype(dt), xh.astype(dt)
        return (
            jnp.dot(d, xh, preferred_element_type=jnp.float32, precision=prec_t),
            jax.lax.dot_general(
                d, x, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec_t,
            ),
        )

    def timed(fn, *a, reps=3):
        out = fn(*a)
        float(jnp.sum(out[:2, :2]))
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn(*a)
            float(jnp.sum(out[:2, :2]))
            best = min(best, time.time() - t0)
        return best / R

    d_bytes = n * k * dt.itemsize
    t_xla = timed(chain(xla_dual), d, x0, xh0)
    log(f"XLA dual (2 matmuls):   {t_xla*1e3:8.3f} ms/app  "
        f"(D streamed at {2*d_bytes/t_xla/1e9:.0f} GB/s equivalent)")
    for bn, bk in [(args.bn, args.bk), (256, 512), (512, 1024), (1024, 512), (256, 4096)]:
        if n % bn or k % bk:
            continue
        f = functools.partial(fused_dual, bn=bn, bk=bk, interpret=interpret)
        try:
            t = timed(chain(f), d, x0, xh0)
        except Exception as e:
            log(f"fused bn={bn} bk={bk}: FAILED {type(e).__name__}: {e}")
            continue
        log(f"fused bn={bn:4d} bk={bk:4d}: {t*1e3:8.3f} ms/app  "
            f"(D read once at {d_bytes/t/1e9:.0f} GB/s, {t_xla/t:.2f}x vs XLA)")


if __name__ == "__main__":
    sys.exit(main())
