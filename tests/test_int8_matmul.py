"""ops/int8_matmul.py: the Mosaic int8 W8A8 dot must be numerically
EXACT vs the XLA reference (integer contraction + identical f32
epilogue) across tileable shapes, bias handling, and the untileable
fallback. Runs in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.ops.int8_matmul import int8_matmul, xla_reference


def _operands(m, k, n, seed=0, bias=False):
    rng = np.random.default_rng(seed)
    xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    s = jnp.asarray(rng.random((m, 1), np.float32) * 0.2 + 0.01)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    ws = jnp.asarray(rng.random((n,), np.float32) * 0.2 + 0.01)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32) if bias else None
    return xq, s, wq, ws, b


@pytest.mark.parametrize("m,k,n,blocks", [
    (256, 128, 256, (128, 128)),
    (384, 256, 512, (128, 256)),   # uneven grid, bn > bm
    (512, 128, 128, (512, 128)),   # single N tile, M sweep
])
def test_exact_vs_xla(m, k, n, blocks):
    xq, s, wq, ws, _ = _operands(m, k, n)
    got = int8_matmul(xq, s, wq, ws, block_m=blocks[0], block_n=blocks[1],
                      out_dtype=jnp.float32)
    want = xla_reference(xq, s, wq, ws, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bias_and_bf16_epilogue():
    xq, s, wq, ws, b = _operands(256, 128, 256, seed=1, bias=True)
    got = int8_matmul(xq, s, wq, ws, bias=b)
    want = xla_reference(xq, s, wq, ws, bias=b)
    assert got.dtype == jnp.bfloat16
    # the f32 tests above are bit-exact; the bf16 cast may differ by one
    # ulp when XLA fuses (mul, add) into an FMA on one side of the
    # comparison — allow exactly that (bf16 mantissa is 7 bits, ulp/x <= 2^-7)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2 ** -7)


def test_untileable_falls_back():
    # K=96 not a lane multiple -> XLA fallback, still exact
    xq, s, wq, ws, _ = _operands(256, 96, 256, seed=2)
    got = int8_matmul(xq, s, wq, ws, out_dtype=jnp.float32)
    want = xla_reference(xq, s, wq, ws, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_jit_and_grad_free_path():
    """int8_matmul composes under jit (serving path wraps it)."""
    xq, s, wq, ws, _ = _operands(256, 128, 384, seed=3)
    f = jax.jit(lambda xq, s: int8_matmul(xq, s, wq, ws,
                                          out_dtype=jnp.float32))
    np.testing.assert_array_equal(
        np.asarray(f(xq, s)),
        np.asarray(xla_reference(xq, s, wq, ws, out_dtype=jnp.float32)))


def test_model_level_backend_parity():
    """A quantized tiny DIT must produce identical logits under
    quant_backend='pallas' (interpret mode here) and 'xla' — the f32
    epilogue math is shared, only the schedule differs."""
    from unidisc_tpu.config import Config
    from unidisc_tpu.models.dit import init_dit
    from unidisc_tpu.ops.quant import quantize_model

    base = Config.make("tiny").override(**{
        "model.length": 24, "model.txt_length": 8, "model.img_length": 16,
        "model.text_vocab_size": 24, "model.image_vocab_size": 40,
        "model.hidden_size": 128, "model.n_heads": 2, "model.n_blocks": 2,
        "model.dropout": 0.0, "model.zero_linear_init": False})
    _, params = init_dit(jax.random.PRNGKey(0), base.model)
    cfg_x, model_x, qp = quantize_model(base, params)
    cfg_p = cfg_x.override(**{"model.quant_backend": "pallas"})
    from unidisc_tpu.models.dit import DIT
    model_p = DIT(cfg_p.model)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 24, (2, 24)), jnp.int32)
    sigma = jnp.asarray([0.3, 0.7])
    modality = jnp.concatenate([jnp.zeros((2, 8), jnp.int32),
                                jnp.ones((2, 16), jnp.int32)], -1)
    lx = model_x.apply({"params": qp}, x, sigma, modality=modality)
    lp = model_p.apply({"params": qp}, x, sigma, modality=modality)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lp),
                               rtol=2 ** -7, atol=1e-5)
