"""Probe: dense-half rework — transpose-free dual layout + hi/lo bf16 split.

Round-5 attack on VERDICT r4 item 1. The hybrid SpMM's dense pair
(``D @ x_hot`` + ``D^T @ x``, ops/hybrid.py) measured 3.22 ms at bench
scale (K=4096, H=100 -> 128 lanes) as two XLA f32/HIGHEST matmuls — each
streaming the 677 MB D block. The v1 fused kernel (probe_fused.py) read D
once but only gained 1.07x: its ``D^T @ x`` contraction transposes the
[bn, bk] D block in VMEM every grid step, capping it at ~14.7 TF/s f32.

Two candidate fixes (ops/fused_dual.py v2 kernels):

  * ``fused_dual_t``  — same math, hot product accumulated [H, K] so the
    in-kernel transpose lands on the small x block.
  * ``fused_dual_split`` — D as (hi, lo) bf16 pair (same bytes, read once),
    3 DEFAULT-precision bf16 passes per product (drops the ~2^-18 lo*lo
    term — the split2 precision class) instead of XLA HIGHEST's 3 passes
    from f32 operands at the probed ~31 TF/s.

    python experiments/probe_dense_split.py            # on the TPU
    JAX_PLATFORMS=cpu python experiments/probe_dense_split.py --check-only
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=41472)
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--check-only", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pytextgcn_tpu.ops.fused_dual import (
        fused_dual, fused_dual_split, fused_dual_t, split_bf16,
    )

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)

    # correctness at a small shape
    n_s, k_s = 1024, 512
    d_s = rng.standard_normal((n_s, k_s)).astype(np.float32)
    x_s = jnp.asarray(rng.standard_normal((n_s, H)), jnp.float32)
    xh_s = jnp.asarray(rng.standard_normal((k_s, H)), jnp.float32)
    dhi_s, dlo_s = split_bf16(jnp.asarray(d_s))
    out_t, hot_t = jax.jit(functools.partial(
        fused_dual_t, bn=256, bk=256, interpret=interpret))(
        jnp.asarray(d_s), x_s, xh_s)
    out_s, hot_s = jax.jit(functools.partial(
        fused_dual_split, bn=256, bk=256, interpret=interpret))(
        dhi_s, dlo_s, x_s, xh_s)
    ref_out = d_s.astype(np.float64) @ np.asarray(xh_s, np.float64)
    ref_hot = d_s.astype(np.float64).T @ np.asarray(x_s, np.float64)
    for name, o, hh, tol in (("t", out_t, hot_t, 1e-5),
                             ("split", out_s, hot_s, 2e-5)):
        eo = np.abs(np.asarray(o) - ref_out).max() / np.abs(ref_out).max()
        eh = np.abs(np.asarray(hh) - ref_hot).max() / np.abs(ref_hot).max()
        log(f"correctness[{name}]: rel err out {eo:.2e} hot {eh:.2e}")
        assert eo < tol and eh < tol, (name, eo, eh)
    if args.check_only:
        return

    n, k = args.n, args.k
    d = jnp.asarray(rng.standard_normal((n, k)) / 100, jnp.float32)
    dhi, dlo = split_bf16(d)
    dbf = d.astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    xh0 = jnp.asarray(rng.standard_normal((k, H)), jnp.float32)

    def chain(step):
        # the D operand(s) ride as jit ARGUMENTS (ops tuple): closed-over
        # they would be embedded as constants in the remote-compile request
        # body, which has a hard size limit on tunneled backends (measured:
        # HTTP 413 at D=679 MB)
        @jax.jit
        def many(ops, x, xh):
            def body(carry, _):
                x, xh = carry
                out, hot = step(ops, x, xh)
                return ((out / n).astype(jnp.float32),
                        (hot / n).astype(jnp.float32)), None

            (x, xh), _ = jax.lax.scan(body, (x, xh), None, length=R)
            return x

        return many

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

    d_bytes = n * k * 4
    HI = jax.lax.Precision.HIGHEST
    DE = jax.lax.Precision.DEFAULT

    def xla_dual(prec):
        def f(ops, x, xh):
            dd = ops[0]
            x = x.astype(dd.dtype)
            xh = xh.astype(dd.dtype)
            return (
                jnp.dot(dd, xh, preferred_element_type=jnp.float32,
                        precision=prec),
                jax.lax.dot_general(
                    dd, x, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ),
            )
        return f

    t_xla = timed(chain(xla_dual(HI)), (d,), x0, xh0)
    log(f"XLA dual f32 HIGHEST:      {t_xla*1e3:8.3f} ms/app "
        f"({2*d_bytes/t_xla/1e9:.0f} GB/s D-equiv)  <- production baseline")
    t_bf = timed(chain(xla_dual(DE)), (dbf,), x0, xh0)
    log(f"XLA dual bf16 DEFAULT:     {t_bf*1e3:8.3f} ms/app "
        f"({d_bytes/t_bf/1e9:.0f} GB/s D-equiv)  <- bf16-mode baseline")

    t_v1 = timed(chain(lambda ops, x, xh: fused_dual(
        ops[0], x, xh, bn=256, bk=4096, interpret=interpret)), (d,), x0, xh0)
    log(f"fused v1 f32 (256x4096):   {t_v1*1e3:8.3f} ms/app "
        f"({d_bytes/t_v1/1e9:.0f} GB/s, {t_xla/t_v1:.2f}x)")

    for bn, bk in [(256, 1024), (256, 2048), (512, 2048), (256, 4096),
                   (512, 1024)]:
        if n % bn or k % bk:
            continue
        try:
            t = timed(chain(lambda ops, x, xh: fused_dual_t(
                ops[0], x, xh, bn=bn, bk=bk, interpret=interpret)),
                (d,), x0, xh0)
            log(f"fused_t f32 ({bn}x{bk}):   {t*1e3:8.3f} ms/app "
                f"({d_bytes/t/1e9:.0f} GB/s, {t_xla/t:.2f}x)")
        except Exception as e:
            log(f"fused_t {bn}x{bk}: FAILED {type(e).__name__}: {e}")
        try:
            t = timed(chain(lambda ops, x, xh: fused_dual_split(
                ops[0], ops[1], x, xh, bn=bn, bk=bk, interpret=interpret)),
                (dhi, dlo), x0, xh0)
            log(f"fused_split ({bn}x{bk}):   {t*1e3:8.3f} ms/app "
                f"({d_bytes/t/1e9:.0f} GB/s, {t_xla/t:.2f}x)")
        except Exception as e:
            log(f"fused_split {bn}x{bk}: FAILED {type(e).__name__}: {e}")

    # bf16-mode variant of the v2 layout: D bf16, single DEFAULT pass
    for bn, bk in [(256, 2048), (512, 2048)]:
        if n % bn or k % bk:
            continue
        try:
            t = timed(chain(lambda ops, x, xh: fused_dual_t(
                ops[0], x, xh, bn=bn, bk=bk, interpret=interpret)),
                (dbf,), x0, xh0)
            log(f"fused_t bf16 ({bn}x{bk}):  {t*1e3:8.3f} ms/app "
                f"({d_bytes//2/t/1e9:.0f} GB/s, {t_bf/t:.2f}x vs XLA bf16)")
        except Exception as e:
            log(f"fused_t bf16 {bn}x{bk}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    sys.exit(main())
