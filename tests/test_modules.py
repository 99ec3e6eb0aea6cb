"""Numerical parity of the flax primitives against the reference's torch
modules (executed from /root/reference via tests/ref_shim, CPU)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from medical_tri_modal_pilot_tpu.models.modules import (
    FeedForward, MultiHeadAttention, StdLayerNorm, TransformerEncoderLayer,
    length_key_mask, masked_softmax_attention, positional_encoding)

from ref_shim import import_reference

ARGV = ["--input-types", "vslt", "--output-type", "mortality",
        "--train-data-path", "/root/reference/data/sample_data/train",
        "--test-data-path", "/root/reference/data/sample_data/test"]


@pytest.fixture(scope="module")
def ref():
    return import_reference(ARGV)


def t2n(t):
    return t.detach().numpy()


def test_std_layernorm_matches_reference(ref):
    from builder.models.src.transformer.module import LayerNorm as RefLN
    x = np.random.default_rng(0).normal(size=(4, 7, 256)).astype(np.float32)
    ref_ln = RefLN(256)
    ours = StdLayerNorm(256)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = ours.apply(params, jnp.asarray(x))
    expected = t2n(ref_ln(torch.tensor(x)))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_positional_encoding_matches_reference(ref):
    from builder.models.src.transformer.module import PositionalEncoding
    pe_ref = PositionalEncoding(256, max_len=512)
    ours = positional_encoding(100, 256)
    np.testing.assert_allclose(np.asarray(ours),
                               t2n(pe_ref(100)), atol=1e-5)


def _copy_linear(torch_linear, name, params):
    params[name] = {"kernel": jnp.asarray(t2n(torch_linear.weight).T),
                    "bias": jnp.asarray(t2n(torch_linear.bias))}


def test_mha_matches_reference(ref):
    from builder.models.src.transformer.attention import MultiHeadAttention as RefMHA
    torch.manual_seed(0)
    d, h, B, L = 256, 4, 3, 17
    ref_mha = RefMHA(d, h)
    x = np.random.default_rng(1).normal(size=(B, L, d)).astype(np.float32)
    lengths = np.array([17, 5, 0])
    mask_np = np.arange(L)[None, :] >= lengths[:, None]     # [B, L]
    # reference takes a (B, Lq, Lk) bool mask
    ref_mask = torch.tensor(np.broadcast_to(mask_np[:, None, :], (B, L, L)).copy())
    ref_out, _ = ref_mha(torch.tensor(x), torch.tensor(x), torch.tensor(x), ref_mask)

    ours = MultiHeadAttention(d, h)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x),
                       jnp.asarray(x))
    p = dict(params["params"])
    _copy_linear(ref_mha.query_proj.linear, "query_proj", p)
    _copy_linear(ref_mha.key_proj.linear, "key_proj", p)
    _copy_linear(ref_mha.value_proj.linear, "value_proj", p)
    with jax.default_matmul_precision("highest"):
        out = ours.apply({"params": p}, jnp.asarray(x), jnp.asarray(x),
                         jnp.asarray(x), jnp.asarray(mask_np))
    np.testing.assert_allclose(np.asarray(out), t2n(ref_out), atol=2e-5)


def test_encoder_layer_matches_reference(ref):
    from builder.models.src.transformer.encoder import TransformerEncoderLayer as RefLayer
    torch.manual_seed(0)
    d, h, B, L = 256, 4, 2, 13
    ref_layer = RefLayer(d_model=d, num_heads=h, d_ff=4 * d, dropout_p=0.0)
    ref_layer.eval()
    x = np.random.default_rng(2).normal(size=(B, L, d)).astype(np.float32)
    lengths = np.array([13, 6])
    mask_np = np.arange(L)[None, :] >= lengths[:, None]
    ref_mask = torch.tensor(np.broadcast_to(mask_np[:, None, :], (B, L, L)).copy())
    with torch.no_grad():
        ref_out, _ = ref_layer(torch.tensor(x), ref_mask)

    ours = TransformerEncoderLayer(d, h, 4 * d, dropout_p=0.0)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = jax.tree.map(lambda v: v, dict(params["params"]))
    p["attention_prenorm"] = {"gamma": jnp.asarray(t2n(ref_layer.attention_prenorm.gamma)),
                              "beta": jnp.asarray(t2n(ref_layer.attention_prenorm.beta))}
    p["feed_forward_prenorm"] = {"gamma": jnp.asarray(t2n(ref_layer.feed_forward_prenorm.gamma)),
                                 "beta": jnp.asarray(t2n(ref_layer.feed_forward_prenorm.beta))}
    sa = dict(p["self_attention"])
    _copy_linear(ref_layer.self_attention.query_proj.linear, "query_proj", sa)
    _copy_linear(ref_layer.self_attention.key_proj.linear, "key_proj", sa)
    _copy_linear(ref_layer.self_attention.value_proj.linear, "value_proj", sa)
    p["self_attention"] = sa
    # conv1x1 FFN: torch Conv1d weight [out, in, 1] -> Dense kernel [in, out]
    ff = dict(p["feed_forward"])
    ff["w_1"] = {"kernel": jnp.asarray(t2n(ref_layer.feed_forward.w_1.weight)[:, :, 0].T),
                 "bias": jnp.asarray(t2n(ref_layer.feed_forward.w_1.bias))}
    ff["w_2"] = {"kernel": jnp.asarray(t2n(ref_layer.feed_forward.w_2.weight)[:, :, 0].T),
                 "bias": jnp.asarray(t2n(ref_layer.feed_forward.w_2.bias))}
    p["feed_forward"] = ff
    with jax.default_matmul_precision("highest"):
        out = ours.apply({"params": p}, jnp.asarray(x), jnp.asarray(mask_np),
                         True)
    np.testing.assert_allclose(np.asarray(out), t2n(ref_out), atol=5e-5)


def test_fully_masked_row_is_uniform_average():
    # -65504 fill => fully-masked rows softmax to uniform (attention.py:38)
    B, H, L, D = 1, 2, 8, 16
    rng = jax.random.PRNGKey(0)
    # operands are [B, L, H, D] (head axis in place)
    q = jax.random.normal(rng, (B, L, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, L, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, L, H, D))
    mask = length_key_mask(jnp.array([0]), L)
    with jax.default_matmul_precision("highest"):
        out = masked_softmax_attention(q, k, v, mask, math.sqrt(D))
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                               np.asarray(v[0, :, 0].mean(0)), atol=1e-5)


def test_reports_decoder_matches_reference(ref):
    """Numerical parity of the CXR-reports transformer decoder vs the
    reference src/reports_transformer_decoder.py (weight-copied, CPU fp32).
    The reference forward drops the last target token internally
    (:151); ours takes the already-shifted tokens."""
    from builder.models.src.reports_transformer_decoder import (
        TransformerDecoder as RefDecoder)
    from medical_tri_modal_pilot_tpu.models.extras import TransformerDecoder

    torch.manual_seed(3)
    V, D, H, FF, NL, B, L, LM = 50, 64, 4, 128, 2, 3, 9, 11
    ref_dec = RefDecoder(num_classes=V, d_model=D, d_ff=FF, num_layers=NL,
                         num_heads=H, dropout_p=0.0, pad_id=0).eval()

    rng = np.random.default_rng(7)
    tokens = rng.integers(1, V, (B, L)).astype(np.int64)
    tokens[0, -3:] = 0                         # pad tail on one sample
    memory = rng.normal(size=(B, LM, D)).astype(np.float32)
    mem_lengths = np.array([LM, 5, 8], np.int64)

    with torch.no_grad():
        expected = t2n(ref_dec(torch.tensor(tokens),
                               torch.tensor(memory),
                               torch.tensor(mem_lengths)))

    ours = TransformerDecoder(vocab_size=V, d_model=D, num_heads=H, d_ff=FF,
                              n_layers=NL, pad_id=0, dropout_p=0.0)
    shifted = jnp.asarray(tokens[:, :-1])      # reference drops last token
    mem_mask = jnp.arange(LM)[None, :] >= jnp.asarray(mem_lengths)[:, None]
    params = ours.init(jax.random.PRNGKey(0), shifted, jnp.asarray(memory),
                       mem_mask)

    p = jax.tree.map(lambda v: v, dict(params["params"]))
    p["embedding"] = {"embedding":
                      jnp.asarray(t2n(ref_dec.embedding.embedding.weight))}
    for i, rl in enumerate(ref_dec.layers):
        lp = dict(p[f"layers_{i}"])
        for ours_n, ref_ln in [("self_prenorm", rl.self_attention_prenorm),
                               ("cross_prenorm", rl.encoder_attention_prenorm),
                               ("ff_prenorm", rl.feed_forward_prenorm)]:
            lp[ours_n] = {"gamma": jnp.asarray(t2n(ref_ln.gamma)),
                          "beta": jnp.asarray(t2n(ref_ln.beta))}
        for ours_n, ref_mha in [("self_attention", rl.self_attention),
                                ("cross_attention", rl.encoder_attention)]:
            sa = dict(lp[ours_n])
            for name, lin in [("query_proj", ref_mha.query_proj),
                              ("key_proj", ref_mha.key_proj),
                              ("value_proj", ref_mha.value_proj)]:
                sa[name] = {"kernel": jnp.asarray(t2n(lin.linear.weight).T),
                            "bias": jnp.asarray(t2n(lin.linear.bias))}
            lp[ours_n] = sa
        ff = dict(lp["feed_forward"])
        ff["w_1"] = {"kernel": jnp.asarray(t2n(rl.feed_forward.w_1.weight)[:, :, 0].T),
                     "bias": jnp.asarray(t2n(rl.feed_forward.w_1.bias))}
        ff["w_2"] = {"kernel": jnp.asarray(t2n(rl.feed_forward.w_2.weight)[:, :, 0].T),
                     "bias": jnp.asarray(t2n(rl.feed_forward.w_2.bias))}
        lp["feed_forward"] = ff
        p[f"layers_{i}"] = lp
    p["fc_norm"] = {"gamma": jnp.asarray(t2n(ref_dec.fc[0].gamma)),
                    "beta": jnp.asarray(t2n(ref_dec.fc[0].beta))}
    p["vocab_proj"] = {"kernel": jnp.asarray(t2n(ref_dec.fc[1].linear.weight).T)}

    out = ours.apply({"params": p}, shifted, jnp.asarray(memory), mem_mask)
    np.testing.assert_allclose(np.asarray(out), expected,
                               atol=2e-4, rtol=2e-4)
