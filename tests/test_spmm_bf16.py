"""bf16 compute mode of the Pallas SpMM: close to f32 (not bitwise)."""

import numpy as np
import jax
import jax.numpy as jnp

from pytextgcn_tpu.ops import NormAdj
from pytextgcn_tpu.ops.spmm import spmm, spmm_segment
from tests.test_spmm_pallas import make_adj


def test_bf16_mode_close_to_f32():
    from pytextgcn_tpu.core.graph import TextGraph

    rng = np.random.default_rng(3)
    n, e = 600, 4000
    g = TextGraph(
        edge_src=rng.integers(0, n, e).astype(np.int32),
        edge_dst=rng.integers(0, n, e).astype(np.int32),
        edge_w=(rng.random(e) + 0.05).astype(np.float32),
        y=np.zeros(n, np.int32),
        train_mask=np.zeros(n, bool),
        val_mask=np.zeros(n, bool),
        test_mask=np.zeros(n, bool),
        n_vocab=n // 2,
        n_docs=n - n // 2,
    )
    adj16 = NormAdj.from_graph(g, use_pallas=True, pallas_dtype="bfloat16")
    adj32 = NormAdj.from_graph(g)
    x = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
    got = np.asarray(spmm(adj16, x))
    want = np.asarray(spmm_segment(adj32, x))
    assert got.dtype == np.float32
    # bf16 has ~3 decimal digits; sums of ~7 edges stay within ~1%
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    # gradient flows through the bf16 path too
    gr = jax.grad(lambda v: jnp.sum(spmm(adj16, v) ** 2))(x)
    gr32 = jax.grad(lambda v: jnp.sum(spmm_segment(adj32, v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr32), rtol=5e-2, atol=5e-1)
