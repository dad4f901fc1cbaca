"""SparseMatrix @ dense through the Pallas engine (values + W-gradients)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy import sparse as sp

from pytextgcn_tpu.models.mlp import MLP, SparseMatrix


def make_sparse(rng, n_rows=300, n_cols=500, density=0.02):
    m = sp.random(n_rows, n_cols, density=density, random_state=np.random.RandomState(0),
                  format="csr", dtype=np.float64)
    m.data = m.data.astype(np.float32) + 0.1
    return m


def test_pallas_sparse_matmul_matches_segment():
    rng = np.random.default_rng(0)
    m = make_sparse(rng)
    xs_seg = SparseMatrix.from_scipy(m)
    xs_pal = SparseMatrix.from_scipy(m, use_pallas=True)
    w = jnp.asarray(rng.standard_normal((m.shape[1], 32)).astype(np.float32))
    a = xs_pal.matmul(w)
    b = xs_seg.matmul(w)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    # gradient wrt the dense operand flows through the transpose plan
    ga = jax.grad(lambda v: jnp.sum(xs_pal.matmul(v) ** 2))(w)
    gb = jax.grad(lambda v: jnp.sum(xs_seg.matmul(v) ** 2))(w)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-4)


def test_mlp_trains_with_pallas_input():
    rng = np.random.default_rng(1)
    m = make_sparse(rng, n_rows=200, n_cols=300)
    y = rng.integers(0, 3, 200)
    xs = SparseMatrix.from_scipy(m, use_pallas=True)
    model = MLP(300, 3, [16], dropout=0.0)
    params = model.init(jax.random.PRNGKey(0))

    import optax

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def lf(pp):
            logits = model.apply(pp, xs, train=False)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, jnp.asarray(y)[:, None], axis=1))

        l, gr = jax.value_and_grad(lf)(p)
        u, s = opt.update(gr, s, p)
        return optax.apply_updates(p, u), s, l

    losses = []
    for _ in range(30):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert losses[-1] < losses[0]
