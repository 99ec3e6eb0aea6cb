"""Full fusion-core parity: the reference TrimodalTransformerEncoder_MBT
(torch, executed from /root/reference) vs our MBTFusion with copied
weights, over every missing-modality case, pre-fusion layers, and the
vsltonly early exit (SURVEY.md §7 build order 4)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from medical_tri_modal_pilot_tpu.models.mbt import MBTFusion

from ref_shim import import_reference

ARGV = ["--input-types", "vslt_img_txt", "--output-type", "mortality",
        "--train-data-path", "/root/reference/data/sample_data/train",
        "--test-data-path", "/root/reference/data/sample_data/test"]

D, H, LAYERS, BN, B = 32, 4, 3, 2, 5
LENS = (12, 6, 9)          # vslt, img, txt fixed lengths (pre-cls)


@pytest.fixture(scope="module")
def ref():
    return import_reference(ARGV)


def t2n(t):
    return t.detach().numpy()


def _copy_params(ref_enc, params):
    """torch state -> our param tree (names from MBTFusion)."""
    p = jax.tree.map(lambda v: v, dict(params))
    for m in range(3):
        p[f"cls_token_{m}"] = jnp.asarray(
            t2n(ref_enc.cls_token_per_modality[m]))
        ln = ref_enc.layer_norms_in[m]
        p[f"layer_norm_in_{m}"] = {"scale": jnp.asarray(t2n(ln.weight)),
                                   "bias": jnp.asarray(t2n(ln.bias))}
    p["bottlenecks"] = jnp.asarray(t2n(ref_enc.bottlenecks))
    for layer in range(LAYERS):
        for m in range(3):
            if f"layers_{layer}_{m}" not in p:
                continue    # vsltonly: last-layer img/txt layers don't exist
            rl = ref_enc.layer_stacks[layer][m]
            lp = dict(p[f"layers_{layer}_{m}"])
            lp["attention_prenorm"] = {
                "gamma": jnp.asarray(t2n(rl.attention_prenorm.gamma)),
                "beta": jnp.asarray(t2n(rl.attention_prenorm.beta))}
            lp["feed_forward_prenorm"] = {
                "gamma": jnp.asarray(t2n(rl.feed_forward_prenorm.gamma)),
                "beta": jnp.asarray(t2n(rl.feed_forward_prenorm.beta))}
            sa = dict(lp["self_attention"])
            for name, lin in [("query_proj", rl.self_attention.query_proj),
                              ("key_proj", rl.self_attention.key_proj),
                              ("value_proj", rl.self_attention.value_proj)]:
                sa[name] = {"kernel": jnp.asarray(t2n(lin.linear.weight).T),
                            "bias": jnp.asarray(t2n(lin.linear.bias))}
            lp["self_attention"] = sa
            ff = dict(lp["feed_forward"])
            ff["w_1"] = {
                "kernel": jnp.asarray(t2n(rl.feed_forward.w_1.weight)[:, :, 0].T),
                "bias": jnp.asarray(t2n(rl.feed_forward.w_1.bias))}
            ff["w_2"] = {
                "kernel": jnp.asarray(t2n(rl.feed_forward.w_2.weight)[:, :, 0].T),
                "bias": jnp.asarray(t2n(rl.feed_forward.w_2.bias))}
            lp["feed_forward"] = ff
            p[f"layers_{layer}_{m}"] = lp
    return p


def _run_pair(ref, fusion_startidx, vsltonly, resbottle, missing, seed=0):
    from builder.models.src.transformer.mbt_encoder import (
        TrimodalTransformerEncoder_MBT)
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    use_pe = [False, False, True]
    mask = [True, False, True]
    ref_enc = TrimodalTransformerEncoder_MBT(
        batch_size=B, n_modality=3, bottlenecks_n=BN,
        fusion_startidx=fusion_startidx, d_input=D, n_layers=LAYERS,
        n_head=H, d_model=D, d_ff=4 * D, dropout=0.0, pe_maxlen=64,
        resbottle=resbottle, txt_idx=2, vsltonly=vsltonly,
        use_pe=use_pe, mask=mask)
    ref_enc.eval()

    inputs = [rng.normal(size=(B, L, D)).astype(np.float32) for L in LENS]
    varying = [np.array([12, 3, 7, 12, 5]), np.full(B, LENS[1]),
               np.array([2, 2, 5, 9, 4])]   # txt row 0/1 -> ==3 after +1? no:
    # reference adds +1 for cls then zeroes txt rows equal to 3
    with torch.no_grad():
        ref_out, _ = ref_enc(
            [torch.tensor(x) for x in inputs],
            fixed_lengths=[int(L) for L in LENS],
            varying_lengths=[torch.tensor(v.copy()) for v in varying],
            missing=torch.tensor(missing))

    fusion = MBTFusion(n_modality=3, bottlenecks_n=BN,
                       fusion_startidx=fusion_startidx, n_layers=LAYERS,
                       n_head=H, d_model=D, d_ff=4 * D, dropout=0.0,
                       txt_idx=2, vsltonly=vsltonly, resbottle=resbottle,
                       use_pe=tuple(use_pe), mask=tuple(mask))
    jx = [jnp.asarray(x) for x in inputs]
    jvar = [jnp.asarray(v) for v in varying]
    jmiss = jnp.asarray(missing)
    variables = fusion.init(jax.random.PRNGKey(1), jx, jvar, jmiss)
    p = _copy_params(ref_enc, variables["params"])
    with jax.default_matmul_precision("highest"):
        ours = fusion.apply({"params": p}, jx, jvar, jmiss)
    return ref_out, ours


@pytest.mark.parametrize("fusion_startidx", [0, 1])
def test_trimodal_mbt_logit_parity(ref, fusion_startidx):
    missing = np.array([0, 1, 2, 3, 0])
    ref_out, ours = _run_pair(ref, fusion_startidx, vsltonly=0,
                              resbottle=False, missing=missing)
    for m in range(3):
        np.testing.assert_allclose(np.asarray(ours[m]), t2n(ref_out[m]),
                                   atol=2e-4,
                                   err_msg=f"modality {m} mismatch")


def test_trimodal_mbt_parity_resbottle(ref):
    missing = np.array([3, 2, 1, 0, 1])
    ref_out, ours = _run_pair(ref, 0, vsltonly=0, resbottle=True,
                              missing=missing)
    for m in range(3):
        np.testing.assert_allclose(np.asarray(ours[m]), t2n(ref_out[m]),
                                   atol=2e-4)


def test_trimodal_mbt_parity_vsltonly(ref):
    missing = np.array([0, 1, 2, 3, 0])
    ref_out, ours = _run_pair(ref, 0, vsltonly=1, resbottle=False,
                              missing=missing)
    # vsltonly: only the vslt stream is defined on the last layer
    np.testing.assert_allclose(np.asarray(ours[0]), t2n(ref_out[0]),
                               atol=2e-4)


# ---------------------------------------------------------------------------
# full-model logit parity: UNIMODAL_TRANSFORMER (TIE) vs the reference
# ---------------------------------------------------------------------------

def _copy_stem(seq, dst):
    """torch Sequential(Linear, LayerNorm, ReLU) -> MLPStem params."""
    dst["Dense_0"] = {"kernel": jnp.asarray(t2n(seq[0].weight).T),
                      "bias": jnp.asarray(t2n(seq[0].bias))}
    dst["LayerNorm_0"] = {"scale": jnp.asarray(t2n(seq[1].weight)),
                          "bias": jnp.asarray(t2n(seq[1].bias))}
    return dst


def _copy_encoder_layer(rl, lp):
    lp["attention_prenorm"] = {
        "gamma": jnp.asarray(t2n(rl.attention_prenorm.gamma)),
        "beta": jnp.asarray(t2n(rl.attention_prenorm.beta))}
    lp["feed_forward_prenorm"] = {
        "gamma": jnp.asarray(t2n(rl.feed_forward_prenorm.gamma)),
        "beta": jnp.asarray(t2n(rl.feed_forward_prenorm.beta))}
    sa = dict(lp["self_attention"])
    for name, lin in [("query_proj", rl.self_attention.query_proj),
                      ("key_proj", rl.self_attention.key_proj),
                      ("value_proj", rl.self_attention.value_proj)]:
        sa[name] = {"kernel": jnp.asarray(t2n(lin.linear.weight).T),
                    "bias": jnp.asarray(t2n(lin.linear.bias))}
    lp["self_attention"] = sa
    ff = dict(lp["feed_forward"])
    ff["w_1"] = {"kernel": jnp.asarray(t2n(rl.feed_forward.w_1.weight)[:, :, 0].T),
                 "bias": jnp.asarray(t2n(rl.feed_forward.w_1.bias))}
    ff["w_2"] = {"kernel": jnp.asarray(t2n(rl.feed_forward.w_2.weight)[:, :, 0].T),
                 "bias": jnp.asarray(t2n(rl.feed_forward.w_2.bias))}
    lp["feed_forward"] = ff
    return lp


def test_unimodal_transformer_full_model_parity(ref):
    """End-to-end logits: reference UNIMODAL_TRANSFORMER (torch, TIE) vs
    our flax model with every weight copied (atol 2e-4)."""
    import importlib
    ref_mod = importlib.import_module(
        "builder.models.8_missing_models.unimodal_transformer")
    args = ref["args"]
    args.vslt_type = "TIE"
    args.transformer_num_layers = 2
    args.transformer_dim = 64
    args.transformer_num_head = 4
    args.dropout = 0.0
    args.output_dim = 1
    args.batch_size = 5
    args.device = torch.device("cpu")
    torch.manual_seed(3)
    ref_model = ref_mod.UNIMODAL_TRANSFORMER(args)
    ref_model.eval()

    B, L = 5, 16
    rng = np.random.default_rng(7)
    tie = np.zeros((B, L, 3), np.float32)
    lengths = np.array([16, 4, 9, 1, 12])
    for i, ln in enumerate(lengths):
        tie[i, :ln, 0] = np.sort(rng.uniform(-24, 0, ln))
        tie[i, :ln, 1] = rng.uniform(0, 1, ln)
        tie[i, :ln, 2] = rng.integers(0, 18, ln)
    age = rng.uniform(0, 1, B).astype(np.float32)
    gen = rng.integers(0, 2, B).astype(np.float32)

    with torch.no_grad():
        ref_logits, _, _ = ref_model(
            torch.tensor(tie), None, None, None, None,
            torch.tensor(age), torch.tensor(gen),
            torch.tensor(lengths), None, None, None, None, None, None,
            None, "test", None, None)

    from medical_tri_modal_pilot_tpu.config import parse_config
    from medical_tri_modal_pilot_tpu.models import get_model
    cfg = parse_config([
        "--input-types", "vslt", "--output-type", "mortality",
        "--train-data-path", "/root/reference/data/sample_data/train",
        "--test-data-path", "/root/reference/data/sample_data/test",
        "--model", "unimodal_transformer", "--vslt-type", "TIE",
        "--transformer-num-layers", "2", "--transformer-dim", "64",
        "--transformer-num-head", "4", "--dropout", "0.0",
        "--batch-size", "5", "--precision", "fp32"])
    model = get_model(cfg)
    batch = {
        "vslt": jnp.asarray(tie),
        "static": jnp.asarray(np.stack([gen, age], axis=1)),
        "input_length": jnp.asarray(lengths),
        "missing": jnp.zeros((B, 3)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        batch, jnp.zeros(B, jnp.int32), True)
    p = jax.tree.map(lambda v: v, dict(variables["params"]))

    umse = dict(p["umse"])
    umse["ie_vslt"] = _copy_stem(ref_model.ie_vslt, dict(umse["ie_vslt"]))
    umse["ie_time"] = _copy_stem(ref_model.ie_time, dict(umse["ie_time"]))
    umse["ie_demo"] = _copy_stem(ref_model.ie_demo, dict(umse["ie_demo"]))
    umse["ie_feat"] = {"embedding": jnp.asarray(t2n(ref_model.ie_feat.weight))}
    p["umse"] = umse

    enc = dict(p["transformer_encoder"])
    enc["cls_tokens"] = jnp.asarray(
        t2n(ref_model.transformer_encoder.cls_tokens))
    rln = ref_model.transformer_encoder.layer_norm_in
    enc["layer_norm_in"] = {"scale": jnp.asarray(t2n(rln.weight)),
                            "bias": jnp.asarray(t2n(rln.bias))}
    for i, rl in enumerate(ref_model.transformer_encoder.layer_stack):
        enc[f"layers_{i}"] = _copy_encoder_layer(rl, dict(enc[f"layers_{i}"]))
    p["transformer_encoder"] = enc

    p["final_ln"] = {"scale": jnp.asarray(t2n(ref_model.layer_norm_final.weight)),
                     "bias": jnp.asarray(t2n(ref_model.layer_norm_final.bias))}
    fc = dict(p["fc_list"])
    fc["fc1"] = {"kernel": jnp.asarray(t2n(ref_model.fc_list[0].weight).T),
                 "bias": jnp.asarray(t2n(ref_model.fc_list[0].bias))}
    fc["bn"] = {"scale": jnp.asarray(t2n(ref_model.fc_list[1].weight)),
                "bias": jnp.asarray(t2n(ref_model.fc_list[1].bias))}
    fc["fc2"] = {"kernel": jnp.asarray(t2n(ref_model.fc_list[3].weight).T),
                 "bias": jnp.asarray(t2n(ref_model.fc_list[3].bias))}
    p["fc_list"] = fc

    with jax.default_matmul_precision("highest"):
        logits, _, _ = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            batch, jnp.zeros(B, jnp.int32), True)
    np.testing.assert_allclose(np.asarray(logits),
                               t2n(ref_logits)[:, 0], atol=2e-4)


# ---------------------------------------------------------------------------
# multitoken MBT parity (the vmulti family fusion core)
# ---------------------------------------------------------------------------

def test_multitoken_mbt_parity(ref):
    """TrimodalTransformerEncoder_Multitokens_MBT vs MultitokenMBTFusion
    with copied weights. Content lengths must match the reference's
    hand-built masks: img=49, txt=128 tokens (mbt_encoder.py:399-423)."""
    from medical_tri_modal_pilot_tpu.models.mbt import MultitokenMBTFusion

    # the reference builds its block masks with .cuda() at __init__
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        from builder.models.src.transformer.mbt_encoder import (
            TrimodalTransformerEncoder_Multitokens_MBT)
        torch.manual_seed(11)
        d, h, layers, bn, b = 32, 4, 2, 4, 5
        lens = (20, 49, 128)
        ref_enc = TrimodalTransformerEncoder_Multitokens_MBT(
            batch_size=b, n_modality=3, bottlenecks_n=bn, fusion_startidx=0,
            d_input=d, n_layers=layers, n_head=h, d_model=d, d_ff=4 * d,
            dropout=0.0, txt_idx=2, use_pe=[False, False, True],
            mask=[True, True, True])
        ref_enc.eval()

        rng = np.random.default_rng(11)
        inputs = [rng.normal(size=(b, L, d)).astype(np.float32)
                  for L in lens]
        varying = [np.array([20, 5, 11, 20, 8]), np.full(b, 49),
                   np.array([2, 5, 128, 60, 2])]
        missing = np.array([0, 1, 2, 3, 0])
        with torch.no_grad():
            ref_out, _ = ref_enc(
                [torch.tensor(x) for x in inputs],
                fixed_lengths=[int(L) for L in lens],
                varying_lengths=[torch.tensor(v.copy()) for v in varying],
                missing=torch.tensor(missing))

        fusion = MultitokenMBTFusion(
            n_modality=3, bottlenecks_n=bn, fusion_startidx=0,
            n_layers=layers, n_head=h, d_model=d, d_ff=4 * d, dropout=0.0,
            txt_idx=2, use_pe=(False, False, True), mask=(True, True, True))
        jx = [jnp.asarray(x) for x in inputs]
        jvar = [jnp.asarray(v) for v in varying]
        variables = fusion.init(jax.random.PRNGKey(2), jx, jvar,
                                jnp.asarray(missing))
        p = jax.tree.map(lambda v: v, dict(variables["params"]))
        for m in range(3):
            p[f"cls_tokens_{m}"] = jnp.asarray(
                t2n(ref_enc.cls_token_per_modality[m]))
            ln = ref_enc.layer_norms_in[m]
            p[f"layer_norm_in_{m}"] = {"scale": jnp.asarray(t2n(ln.weight)),
                                       "bias": jnp.asarray(t2n(ln.bias))}
        for g in range(4):
            p[f"bottlenecks_{g}"] = jnp.asarray(t2n(ref_enc.bottlenecks[g]))
        for layer in range(layers):
            for m in range(3):
                rl = ref_enc.layer_stacks[layer][m]
                p[f"layers_{layer}_{m}"] = _copy_encoder_layer(
                    rl, dict(p[f"layers_{layer}_{m}"]))
        with jax.default_matmul_precision("highest"):
            ours = fusion.apply({"params": p}, jx, jvar, jnp.asarray(missing))
        for m in range(3):
            np.testing.assert_allclose(np.asarray(ours[m]), t2n(ref_out[m]),
                                       atol=3e-4,
                                       err_msg=f"modality {m}")
    finally:
        torch.Tensor.cuda = orig_cuda


def test_bimodal_mbt_parity(ref):
    """BimodalTransformerEncoder_MBT vs MBTFusion(n_modality=2): candidates
    {bi-mean, vslt-only} (mbt_encoder.py:629-632)."""
    from builder.models.src.transformer.mbt_encoder import (
        BimodalTransformerEncoder_MBT)
    torch.manual_seed(5)
    d, h, layers, bn, b = 32, 4, 2, 2, 4
    lens = (12, 9)
    rng = np.random.default_rng(5)
    ref_enc = BimodalTransformerEncoder_MBT(
        batch_size=b, n_modality=2, bottlenecks_n=bn, fusion_startidx=0,
        d_input=d, n_layers=layers, n_head=h, d_model=d, d_ff=4 * d,
        dropout=0.0, txt_idx=1, use_pe=[False, True], mask=[True, True])
    ref_enc.eval()
    inputs = [rng.normal(size=(b, L, d)).astype(np.float32) for L in lens]
    varying = [np.array([12, 3, 7, 12]), np.array([5, 5, 9, 2])]
    missing = np.array([0, 1, 0, 1])
    with torch.no_grad():
        ref_out, _ = ref_enc(
            [torch.tensor(x) for x in inputs],
            fixed_lengths=[int(L) for L in lens],
            varying_lengths=[torch.tensor(v.copy()) for v in varying],
            missing=torch.tensor(missing))

    fusion = MBTFusion(n_modality=2, bottlenecks_n=bn, fusion_startidx=0,
                       n_layers=layers, n_head=h, d_model=d, d_ff=4 * d,
                       dropout=0.0, txt_idx=1, use_pe=(False, True),
                       mask=(True, True))
    jx = [jnp.asarray(x) for x in inputs]
    jvar = [jnp.asarray(v) for v in varying]
    variables = fusion.init(jax.random.PRNGKey(3), jx, jvar,
                            jnp.asarray(missing))
    p = jax.tree.map(lambda v: v, dict(variables["params"]))
    for m in range(2):
        p[f"cls_token_{m}"] = jnp.asarray(
            t2n(ref_enc.cls_token_per_modality[m]))
        ln = ref_enc.layer_norms_in[m]
        p[f"layer_norm_in_{m}"] = {"scale": jnp.asarray(t2n(ln.weight)),
                                   "bias": jnp.asarray(t2n(ln.bias))}
    p["bottlenecks"] = jnp.asarray(t2n(ref_enc.bottlenecks))
    for layer in range(layers):
        for m in range(2):
            p[f"layers_{layer}_{m}"] = _copy_encoder_layer(
                ref_enc.layer_stacks[layer][m],
                dict(p[f"layers_{layer}_{m}"]))
    with jax.default_matmul_precision("highest"):
        ours = fusion.apply({"params": p}, jx, jvar, jnp.asarray(missing))
    for m in range(2):
        np.testing.assert_allclose(np.asarray(ours[m]), t2n(ref_out[m]),
                                   atol=2e-4, err_msg=f"modality {m}")


# ---------------------------------------------------------------------------
# dead-in-reference MBT variants, ported for completeness of record
# (VERDICT r3 missing #3): MBTEncoder + TrimodalTransformerEncoder_MBT_VSLTMAIN
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_modality,fusion_startidx,use_pe,mask", [
    (2, 1, [True, False], [True, False]),
    (2, 0, [True, True], [True, True]),
    (3, 0, [True, True], [True, True]),   # forced all-True inside forward
])
def test_mbt_encoder_parity(ref, n_modality, fusion_startidx, use_pe, mask):
    """MBTEncoder (dead in the reference, mbt_encoder.py:786-891) vs our
    MBTEncoderFusion with copied weights — covers the stale-index
    bottleneck-mask gate (mask[-1] gates every modality) and the
    bottlenecks-at-END prefix-mask quirk."""
    from builder.models.src.transformer.mbt_encoder import MBTEncoder
    from medical_tri_modal_pilot_tpu.models.mbt import MBTEncoderFusion

    torch.manual_seed(7)
    d, h, layers, bn, b = 32, 4, 3, 2, 4
    lens = (10, 7, 9)[:n_modality]
    ref_enc = MBTEncoder(
        n_modality=n_modality, bottlenecks_n=bn,
        fusion_startidx=fusion_startidx, d_input=d, n_layers=layers,
        n_head=h, d_model=d, d_ff=4 * d, dropout=0.0,
        use_pe=list(use_pe), mask=list(mask))
    ref_enc.eval()
    rng = np.random.default_rng(7)
    inputs = [rng.normal(size=(b, L, d)).astype(np.float32) for L in lens]
    lengths = [np.array([10, 3, 7, 5]), np.array([7, 2, 7, 4]),
               np.array([9, 3, 1, 9])][:n_modality]
    with torch.no_grad():
        ref_out, _ = ref_enc([torch.tensor(x) for x in inputs],
                             lengths=[torch.tensor(v.copy())
                                      for v in lengths])

    fusion = MBTEncoderFusion(
        n_modality=n_modality, bottlenecks_n=bn,
        fusion_startidx=fusion_startidx, n_layers=layers, n_head=h,
        d_model=d, d_ff=4 * d, dropout=0.0, use_pe=tuple(use_pe),
        mask=tuple(mask))
    jx = [jnp.asarray(x) for x in inputs]
    jlen = [jnp.asarray(v) for v in lengths]
    variables = fusion.init(jax.random.PRNGKey(4), jx, jlen)
    p = jax.tree.map(lambda v: v, dict(variables["params"]))
    for m in range(n_modality):
        p[f"cls_token_{m}"] = jnp.asarray(
            t2n(ref_enc.cls_token_per_modality[m]))
        ln = ref_enc.layer_norms_in[m]
        p[f"layer_norm_in_{m}"] = {"scale": jnp.asarray(t2n(ln.weight)),
                                   "bias": jnp.asarray(t2n(ln.bias))}
    p["bottlenecks"] = jnp.asarray(t2n(ref_enc.bottlenecks))
    for layer in range(layers):
        for m in range(n_modality):
            p[f"layers_{layer}_{m}"] = _copy_encoder_layer(
                ref_enc.layer_stacks[layer][m],
                dict(p[f"layers_{layer}_{m}"]))
    with jax.default_matmul_precision("highest"):
        ours = fusion.apply({"params": p}, jx, jlen)
    for m in range(n_modality):
        np.testing.assert_allclose(np.asarray(ours[m]), t2n(ref_out[m]),
                                   atol=2e-4, err_msg=f"modality {m}")


def test_mbt_vsltmain_parity(ref):
    """TrimodalTransformerEncoder_MBT_VSLTMAIN (dead in the reference,
    mbt_encoder.py:195-327) vs our MBTVSLTMAINFusion with copied weights,
    at the class's only executable envelope (cls_num == n_modality,
    fusion_startidx == 0 — anything else raises in torch). The last fusion
    layer returns only the vslt stream."""
    from builder.models.src.transformer.mbt_encoder import (
        TrimodalTransformerEncoder_MBT_VSLTMAIN)
    from medical_tri_modal_pilot_tpu.models.mbt import MBTVSLTMAINFusion

    torch.manual_seed(9)
    d, h, layers, bn, b = 32, 4, 3, 2, 4
    lens = (10, 7, 9)
    use_pe, mask = [True, True, True], [True, False, True]
    ref_enc = TrimodalTransformerEncoder_MBT_VSLTMAIN(
        batch_size=b, n_modality=3, bottlenecks_n=bn, fusion_startidx=0,
        d_input=d, n_layers=layers, n_head=h, d_model=d, d_ff=4 * d,
        dropout=0.0, txt_idx=2, cls_num=3, use_pe=use_pe, mask=mask)
    ref_enc.eval()
    rng = np.random.default_rng(9)
    inputs = [rng.normal(size=(b, L, d)).astype(np.float32) for L in lens]
    # txt row 1 has raw varying length 3 -> zeroed (pre-+1, unlike MBT)
    varying = [np.array([10, 3, 7, 5]), np.array([7, 2, 7, 4]),
               np.array([9, 3, 1, 9])]
    missing = np.array([0, 1, 2, 3])
    with torch.no_grad():
        ref_out, _ = ref_enc(
            [torch.tensor(x) for x in inputs],
            fixed_lengths=list(lens),
            varying_lengths=[torch.tensor(v.copy()) for v in varying],
            missing=torch.tensor(missing))
    assert len(ref_out) == 1   # last layer keeps only the vslt stream

    fusion = MBTVSLTMAINFusion(
        n_modality=3, bottlenecks_n=bn, n_layers=layers, n_head=h,
        d_model=d, d_ff=4 * d, dropout=0.0, txt_idx=2,
        use_pe=tuple(use_pe), mask=tuple(mask))
    jx = [jnp.asarray(x) for x in inputs]
    jvar = [jnp.asarray(v) for v in varying]
    variables = fusion.init(jax.random.PRNGKey(5), jx, jvar,
                            jnp.asarray(missing))
    p = jax.tree.map(lambda v: v, dict(variables["params"]))
    for k in range(3):
        p[f"cls_token_{k}"] = jnp.asarray(
            t2n(ref_enc.cls_token_per_modality[k]))
    for m in range(3):
        ln = ref_enc.layer_norms_in[m]
        p[f"layer_norm_in_{m}"] = {"scale": jnp.asarray(t2n(ln.weight)),
                                   "bias": jnp.asarray(t2n(ln.bias))}
    p["bottlenecks"] = jnp.asarray(t2n(ref_enc.bottlenecks))
    for layer in range(layers):
        for m in range(3):
            if f"layers_{layer}_{m}" not in p:
                continue   # last layer: only the vslt stack exists
            p[f"layers_{layer}_{m}"] = _copy_encoder_layer(
                ref_enc.layer_stacks[layer][m],
                dict(p[f"layers_{layer}_{m}"]))
    with jax.default_matmul_precision("highest"):
        ours = fusion.apply({"params": p}, jx, jvar, jnp.asarray(missing))
    assert len(ours) == 1
    np.testing.assert_allclose(np.asarray(ours[0]), t2n(ref_out[0]),
                               atol=2e-4)


def test_vflexible_head_formula():
    """TRI_MBT_VFLEXIBLE's masked-softmax cls weighting reproduces the
    reference formula (tri_mbt_vflexible.py:148-165, 268-286): weights
    masked per missing case with -1e9, softmaxed over modalities, weighted
    logits summed over the case's available subset."""
    torch.manual_seed(0)
    B = 4
    logits = torch.randn(3, B)
    flexavg = torch.randn(3, 1)
    masks = torch.tensor([[False, False, False], [False, False, True],
                          [False, True, False], [False, True, True]])
    missing = torch.tensor([0, 1, 2, 3])
    w = flexavg.repeat(1, B).clone()
    w.masked_fill_(masks[missing].permute(1, 0), -1e9)
    cls_w = torch.softmax(w, dim=0)
    weighted = logits * cls_w
    tri = weighted.sum(0)
    vi = weighted[0] + weighted[1]
    vt = weighted[0] + weighted[2]
    vv = weighted[0]
    expect = torch.stack([tri, vi, vt, vv])[missing, torch.arange(B)]

    # ours (models.py TRI_MBT_VFLEXIBLE body, extracted math)
    m = np.asarray(masks[missing.numpy()])
    wj = np.broadcast_to(flexavg.numpy(), (3, B)).copy()
    wj = np.where(m.T, -1e9, wj)
    cw = np.asarray(jax.nn.softmax(jnp.asarray(wj), axis=0))
    wl = logits.numpy() * cw
    cands = np.stack([wl.sum(0), wl[0] + wl[1], wl[0] + wl[2], wl[0]])
    ours = cands[missing.numpy(), np.arange(B)]
    np.testing.assert_allclose(ours, expect.numpy(), atol=1e-6)
