"""LSTM cell: pure-JAX cell vs torch.nn.LSTMCell ground truth; Pallas kernel
(interpreter mode) vs the pure-JAX cell; custom-VJP gradients vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from show_and_tell_tpu.ops import lstm as lstm_mod
from show_and_tell_tpu.ops.lstm import (
    init_lstm_params,
    lstm_cell,
    lstm_cell_reference,
    set_pallas_enabled,
)


@pytest.fixture(autouse=True)
def _reset_pallas():
    yield
    set_pallas_enabled(None)


def _rand_params(key, I, H):
    return init_lstm_params(key, I, H)


def test_cell_matches_torch():
    torch = pytest.importorskip("torch")
    I, H, B = 24, 32, 5
    key = jax.random.PRNGKey(0)
    p = _rand_params(key, I, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, I))
    h = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    c = jax.random.normal(jax.random.PRNGKey(3), (B, H))

    cell = torch.nn.LSTMCell(I, H)
    w = np.asarray(p["w"])  # [I+H, 4H]
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(w[:I].T.copy()))
        cell.weight_hh.copy_(torch.from_numpy(w[I:].T.copy()))
        cell.bias_ih.copy_(torch.from_numpy(np.asarray(p["b"])))
        cell.bias_hh.zero_()
        th, tc = cell(
            torch.from_numpy(np.asarray(x)),
            (torch.from_numpy(np.asarray(h)), torch.from_numpy(np.asarray(c))),
        )
    jh, jc = lstm_cell_reference(p, x, h, c)
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=1e-5)


@pytest.mark.parametrize("B,I,H", [(4, 128, 128), (10, 100, 256), (16, 512, 512)])
def test_pallas_kernel_matches_reference(B, I, H):
    set_pallas_enabled(True, interpret=True)
    key = jax.random.PRNGKey(0)
    p = _rand_params(key, I, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, I))
    h = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    c = jax.random.normal(jax.random.PRNGKey(3), (B, H))
    ph, pc = lstm_cell(p, x, h, c)
    rh, rc = lstm_cell_reference(p, x, h, c)
    np.testing.assert_allclose(np.asarray(ph), np.asarray(rh), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pc), np.asarray(rc), atol=1e-5)


def test_custom_vjp_matches_autodiff():
    set_pallas_enabled(True, interpret=True)
    I, H, B = 128, 128, 4
    p = _rand_params(jax.random.PRNGKey(0), I, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, I))
    h = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    c = jax.random.normal(jax.random.PRNGKey(3), (B, H))

    def loss_fused(p, x, h, c):
        hn, cn = lstm_cell(p, x, h, c)
        return jnp.sum(hn * 1.3 + cn * 0.7)

    def loss_ref(p, x, h, c):
        hn, cn = lstm_cell_reference(p, x, h, c)
        return jnp.sum(hn * 1.3 + cn * 0.7)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(p, x, h, c)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(p, x, h, c)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fallback_on_unaligned_hidden():
    set_pallas_enabled(True, interpret=True)
    p = _rand_params(jax.random.PRNGKey(0), 16, 24)  # H=24 not tileable
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    h = jnp.zeros((2, 24))
    c = jnp.zeros((2, 24))
    hn, cn = lstm_cell(p, x, h, c)  # must not crash
    assert hn.shape == (2, 24) and cn.shape == (2, 24)


def test_pallas_auto_off_on_cpu():
    assert lstm_mod.pallas_active() is False  # tests run under JAX_PLATFORMS=cpu
