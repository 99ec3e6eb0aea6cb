"""Modality-Aware Bottleneck Transformer fusion cores (flax).

Reimplements the reference's MBT encoders (mbt_encoder.py:519-891) with a
TPU-first formulation of missing-modality handling: instead of the dynamic
``all_bottleneck_stack[missing_num, idx_order]`` gather
(mbt_encoder.py:764-776), the per-sample candidate selection is a one-hot
matmul over a constant candidate-weight matrix — the same math, fully
static, fusible by XLA:

    candidates_k = sum_m W[k, m] * bottleneck_out_m          (W constant)
    bottlenecks_b = sum_k onehot(missing_num_b)[k] * candidates_kb

For n_modality == 3, W rows are {tri-mean, vslt+img, vslt+txt, vslt-only};
for n_modality == 2, {bi-mean, vslt-only} (mbt_encoder.py:629-632).

Parity quirks preserved:
  * text varying length == 3 (BOS/EOS-only note) is zeroed so the whole
    text stack is masked (mbt_encoder.py:707);
  * modalities with mask[m] == False (single-image stack) run unmasked even
    when the image is a zero tensor (constructor arg ``mask``,
    tri_mbt_vsltcls.py:144);
  * bottleneck masks use varying+bottlenecks_n over the concatenated
    sequence (mbt_encoder.py:748);
  * ``vsltonly`` skips the img/txt stacks and the bottleneck mix in the
    final layer (mbt_encoder.py:757-763);
  * ``resbottle`` averages new bottlenecks with the previous ones
  (mbt_encoder.py:778-779).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .modules import (StdLayerNorm, TransformerEncoderLayer, encoder_layer, length_key_mask, LayerNorm,
                      positional_encoding)


def missing_candidate_weights(n_modality: int) -> np.ndarray:
    if n_modality == 3:
        return np.array([
            [1 / 3, 1 / 3, 1 / 3],   # 0: tri mean
            [1 / 2, 1 / 2, 0.0],     # 1: vslt + img
            [1 / 2, 0.0, 1 / 2],     # 2: vslt + txt
            [1.0, 0.0, 0.0],         # 3: vslt only
        ], dtype=np.float32)
    if n_modality == 2:
        return np.array([
            [1 / 2, 1 / 2],          # 0: both
            [1.0, 0.0],              # 1: vslt only
        ], dtype=np.float32)
    raise ValueError(f"n_modality must be 2 or 3, got {n_modality}")


class MBTFusion(nn.Module):
    """Bi/Tri-modal bottleneck fusion (TrimodalTransformerEncoder_MBT /
    BimodalTransformerEncoder_MBT, mbt_encoder.py:519-784)."""
    n_modality: int
    bottlenecks_n: int = 4
    fusion_startidx: int = 0
    n_layers: int = 6
    n_head: int = 4
    d_model: int = 256
    d_ff: int = 1024
    dropout: float = 0.1
    pe_maxlen: int = 2500
    txt_idx: int = 2
    vsltonly: int = 0
    resbottle: bool = False
    use_pe: Tuple[bool, ...] = (False, False, True)
    mask: Tuple[bool, ...] = (True, False, True)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_inputs: Sequence[jnp.ndarray],
                 varying_lengths: Sequence[jnp.ndarray],
                 missing_num: jnp.ndarray,
                 deterministic: bool = True) -> List[jnp.ndarray]:
        """enc_inputs[m]: [B, L_m, D] (no cls yet); varying_lengths[m]: [B]
        int; missing_num: [B] int in [0, n_candidates). Returns per-modality
        [B, 1+L_m, D] with cls at position 0."""
        M = self.n_modality
        B = enc_inputs[0].shape[0]
        D = self.d_model

        cls_tokens = [
            self.param(f"cls_token_{m}", nn.initializers.normal(1.0), (1, 1, D))
            for m in range(M)]
        bottleneck_init = self.param("bottlenecks", nn.initializers.normal(1.0),
                                     (1, self.bottlenecks_n, D))

        xs, key_masks, b_key_masks = [], [], []
        for m in range(M):
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_tokens[m], (B, 1, D)).astype(self.dtype),
                 enc_inputs[m].astype(self.dtype)], axis=1)
            # Pre-pad long streams so [bottlenecks | cls | tokens] lands on
            # the flash kernel's q-tile (256): the per-layer q/k/v pads and
            # output slices inside the kernel wrapper then become no-ops —
            # they showed up as ~15 ms/step of pure copies in the profile.
            # Padded rows are masked via the length masks below (never fully
            # masked rows here: vslt is always present, vlen >= 1+min_len).
            if self.mask[m] and x.shape[1] + self.bottlenecks_n > 512:
                tgt = -(-(x.shape[1] + self.bottlenecks_n) // 256) * 256
                x = jnp.pad(x, ((0, 0),
                                (0, tgt - self.bottlenecks_n - x.shape[1]),
                                (0, 0)))
            L = x.shape[1]
            vlen = varying_lengths[m] + 1
            if m == self.txt_idx:
                vlen = jnp.where(vlen == 3, 0, vlen)
            if self.mask[m]:
                key_masks.append(length_key_mask(vlen, L))
                b_key_masks.append(length_key_mask(
                    vlen + self.bottlenecks_n, L + self.bottlenecks_n))
            else:
                key_masks.append(None)
                b_key_masks.append(None)
            # torch nn.LayerNorm in the reference (mbt_encoder.py:683) — NOT
            # the custom std-based LayerNorm used inside encoder-layer prenorms
            h = LayerNorm(dtype=self.dtype, name=f"layer_norm_in_{m}")(x)
            if self.use_pe[m]:
                h = h + positional_encoding(L, D, self.dtype)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            xs.append(h)

        W = jnp.asarray(missing_candidate_weights(M), dtype=jnp.float32)
        onehot = jax.nn.one_hot(missing_num, W.shape[0], dtype=jnp.float32)
        # per-sample mixing coefficients over modalities: [B, M]
        mix = jnp.einsum('bk,km->bm', onehot, W,
                         precision=jax.lax.Precision.HIGHEST)

        bottlenecks = jnp.broadcast_to(
            bottleneck_init, (B, self.bottlenecks_n, D)).astype(self.dtype)

        # Fusion layers keep the bottleneck rows RESIDENT in each stream
        # buffer: the reference re-concatenates [bottlenecks | stream] and
        # slices it apart every layer (mbt_encoder.py:729-768) — under XLA
        # those are 4 full-stream HBM copies per layer on the TIE stream.
        # Here the streams are concatenated once at fusion start and the
        # per-layer bottleneck refresh is a tiny dynamic_update_slice over
        # rows [0:n] (in-place under XLA buffer reuse). Identical math.
        n = self.bottlenecks_n
        in_fusion = False
        for layer in range(self.n_layers):
            if layer < self.fusion_startidx:
                xs = [
                    encoder_layer(
                        D, self.n_head, self.d_ff, self.dropout, self.dtype,
                        name=f"layers_{layer}_{m}")(xs[m], key_masks[m],
                                                    deterministic)
                    for m in range(M)]
                continue
            if not in_fusion:
                xs = [jnp.concatenate([bottlenecks, x], axis=1) for x in xs]
                in_fusion = True
            else:
                xs = [jax.lax.dynamic_update_slice(
                          x, bottlenecks.astype(x.dtype), (0, 0, 0))
                      for x in xs]
            last_layer = (layer == self.n_layers - 1)
            new_xs, bn_outs = [], []
            for m in range(M):
                if self.vsltonly == 1 and last_layer and m > 0:
                    # stream skipped this layer; stale bottleneck rows in
                    # front are sliced off on return
                    new_xs.append(xs[m])
                    continue
                out = encoder_layer(
                    D, self.n_head, self.d_ff, self.dropout, self.dtype,
                    name=f"layers_{layer}_{m}")(xs[m], b_key_masks[m],
                                                deterministic)
                bn_outs.append(out[:, :n])
                new_xs.append(out)
            xs = new_xs
            if self.vsltonly == 1 and last_layer:
                break
            stack = jnp.stack(bn_outs)                       # [M, B, n, D]
            mixed = jnp.einsum("bm,mbnd->bnd", mix.astype(stack.dtype), stack,
                               precision=jax.lax.Precision.HIGHEST)
            if self.resbottle:
                mixed = (mixed + bottlenecks) / 2.0
            bottlenecks = mixed
        return [x[:, n:] for x in xs] if in_fusion else xs


class MBTEncoderFusion(nn.Module):
    """MBTEncoder (mbt_encoder.py:786-891): the generic n-modality MBT
    variant with bottleneck tokens appended at the END of each stream and a
    missing-agnostic plain-mean bottleneck refresh.

    Dead code in the reference — no module under ``8_missing_models/``
    constructs it (VERDICT r3 missing #3) — ported for completeness of
    record. Executed-behavior quirks preserved (verified by running the
    torch class, not its comments):

      * ``n_modality == 3`` force-overwrites mask/use_pe to all-True
        (mbt_encoder.py:843,851);
      * the bottleneck-mask gate reads ``self.mask[i]`` where ``i`` is the
        STALE index of an earlier loop — i.e. ``mask[n_modality-1]`` gates
        every modality's bottleneck mask (mbt_encoder.py:879);
      * bottleneck masks are valid-PREFIX masks of count ``length+1+n``
        over ``[stream | bottlenecks]`` even though the bottlenecks sit at
        the END — with padded streams the bottleneck rows are masked out
        and pad rows unmasked (mbt_encoder.py:879);
      * no txt ``==3`` zeroing, no missing-aware mixing: the refresh is a
        plain mean over all modalities every fusion layer
        (mbt_encoder.py:889-890).
    """
    n_modality: int = 2
    bottlenecks_n: int = 4
    fusion_startidx: int = 0
    n_layers: int = 6
    n_head: int = 4
    d_model: int = 256
    d_ff: int = 1024
    dropout: float = 0.1
    use_pe: Tuple[bool, ...] = (True, True)
    mask: Tuple[bool, ...] = (True, True)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_inputs: Sequence[jnp.ndarray],
                 lengths: Sequence[jnp.ndarray],
                 deterministic: bool = True) -> List[jnp.ndarray]:
        M, n = self.n_modality, self.bottlenecks_n
        B, D = enc_inputs[0].shape[0], self.d_model
        use_pe = (True,) * M if M == 3 else self.use_pe
        mask = (True,) * M if M == 3 else self.mask

        cls_tokens = [
            self.param(f"cls_token_{m}", nn.initializers.normal(1.0),
                       (1, 1, D)) for m in range(M)]
        bottleneck_init = self.param(
            "bottlenecks", nn.initializers.normal(1.0), (1, n, D))

        xs, key_masks, b_key_masks = [], [], []
        for m in range(M):
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_tokens[m], (B, 1, D)).astype(self.dtype),
                 enc_inputs[m].astype(self.dtype)], axis=1)
            L = x.shape[1]
            vlen = lengths[m] + 1
            key_masks.append(length_key_mask(vlen, L) if mask[m] else None)
            # stale-index bug: gated on the LAST modality's mask flag
            b_key_masks.append(
                length_key_mask(vlen + n, L + n) if mask[M - 1] else None)
            h = LayerNorm(dtype=self.dtype, name=f"layer_norm_in_{m}")(x)
            if use_pe[m]:
                h = h + positional_encoding(L, D, self.dtype)
            xs.append(nn.Dropout(self.dropout)(h, deterministic=deterministic))

        bottlenecks = jnp.broadcast_to(
            bottleneck_init, (B, n, D)).astype(self.dtype)
        for layer in range(self.n_layers):
            if layer < self.fusion_startidx:
                xs = [encoder_layer(
                          D, self.n_head, self.d_ff, self.dropout, self.dtype,
                          name=f"layers_{layer}_{m}")(xs[m], key_masks[m],
                                                      deterministic)
                      for m in range(M)]
                continue
            bn_outs, new_xs = [], []
            for m in range(M):
                L = xs[m].shape[1]
                out = encoder_layer(
                    D, self.n_head, self.d_ff, self.dropout, self.dtype,
                    name=f"layers_{layer}_{m}")(
                        jnp.concatenate([xs[m], bottlenecks.astype(xs[m].dtype)],
                                        axis=1),
                        b_key_masks[m], deterministic)
                bn_outs.append(out[:, L:])
                new_xs.append(out[:, :L])
            xs = new_xs
            bottlenecks = jnp.mean(jnp.stack(bn_outs), axis=0)
        return xs


class MBTVSLTMAINFusion(nn.Module):
    """TrimodalTransformerEncoder_MBT_VSLTMAIN (mbt_encoder.py:195-327):
    MBT fusion whose LAST layer runs only the vslt stream and returns it
    alone, with the same missing-aware candidate mixing as MBTFusion.

    Dead code in the reference — no module under ``8_missing_models/``
    constructs it (VERDICT r3 missing #3) — ported for completeness of
    record at its only executable envelope, verified by running the torch
    class: ``cls_num == n_modality`` (each modality consumes one slot of
    the cls ParameterList; fewer slots raise IndexError) and
    ``fusion_startidx == 0`` (pre-fusion masks are built over
    ``fixed+cls_num`` positions while each stream only gained ONE cls
    token, so any pre-fusion layer raises a size mismatch in torch).

    Quirks preserved:
      * modality 0's valid length grows by ``cls_num`` even though only one
        cls token is prepended (mbt_encoder.py:264-265) — the mask
        over-counts by cls_num-1 valid positions;
      * txt rows with RAW varying length == 3 are zeroed (no +1 first,
        mbt_encoder.py:267);
      * the last fusion layer breaks after modality 0 and the module
        returns ``[vslt_stream]`` only (mbt_encoder.py:311-315);
      * ``layer_norms_after_concat`` exists in the reference but is never
        applied (mbt_encoder.py:234) — not reproduced.
    """
    n_modality: int = 3
    bottlenecks_n: int = 4
    n_layers: int = 6
    n_head: int = 4
    d_model: int = 256
    d_ff: int = 1024
    dropout: float = 0.1
    txt_idx: int = 2
    use_pe: Tuple[bool, ...] = (True, True, True)
    mask: Tuple[bool, ...] = (True, False, True)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_inputs: Sequence[jnp.ndarray],
                 varying_lengths: Sequence[jnp.ndarray],
                 missing_num: jnp.ndarray,
                 deterministic: bool = True) -> List[jnp.ndarray]:
        M, n = self.n_modality, self.bottlenecks_n
        B, D = enc_inputs[0].shape[0], self.d_model
        cls_num = M   # the only executable envelope (class docstring)

        cls_tokens = [
            self.param(f"cls_token_{k}", nn.initializers.normal(1.0),
                       (1, 1, D)) for k in range(cls_num)]
        bottleneck_init = self.param(
            "bottlenecks", nn.initializers.normal(1.0), (1, n, D))

        xs, b_key_masks = [], []
        for m in range(M):
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_tokens[m], (B, 1, D)).astype(self.dtype),
                 enc_inputs[m].astype(self.dtype)], axis=1)
            L = x.shape[1]
            vlen = varying_lengths[m] + (cls_num if m == 0 else 0)
            if m == self.txt_idx:
                vlen = jnp.where(varying_lengths[m] == 3, 0, vlen)
            # bottlenecks are PREPENDED here, so the valid-prefix mask over
            # [bottlenecks | cls | stream] is structurally consistent
            b_key_masks.append(
                length_key_mask(vlen + n, L + n) if self.mask[m] else None)
            h = LayerNorm(dtype=self.dtype, name=f"layer_norm_in_{m}")(x)
            if self.use_pe[m]:
                h = h + positional_encoding(L, D, self.dtype)
            xs.append(nn.Dropout(self.dropout)(h, deterministic=deterministic))

        W = jnp.asarray(missing_candidate_weights(M), dtype=jnp.float32)
        onehot = jax.nn.one_hot(missing_num, W.shape[0], dtype=jnp.float32)
        mix = jnp.einsum('bk,km->bm', onehot, W,
                         precision=jax.lax.Precision.HIGHEST)

        bottlenecks = jnp.broadcast_to(
            bottleneck_init, (B, n, D)).astype(self.dtype)
        for layer in range(self.n_layers):
            last_layer = (layer == self.n_layers - 1)
            bn_outs, new_xs = [], []
            for m in range(M):
                out = encoder_layer(
                    D, self.n_head, self.d_ff, self.dropout, self.dtype,
                    name=f"layers_{layer}_{m}")(
                        jnp.concatenate(
                            [bottlenecks.astype(xs[m].dtype), xs[m]], axis=1),
                        b_key_masks[m], deterministic)
                bn_outs.append(out[:, :n])
                new_xs.append(out[:, n:])
                if last_layer:
                    break   # reference :311: only the vslt stream survives
            if last_layer:
                return [new_xs[0]]
            xs = new_xs
            stack = jnp.stack(bn_outs)                       # [M, B, n, D]
            bottlenecks = jnp.einsum(
                "bm,mbnd->bnd", mix.astype(stack.dtype), stack,
                precision=jax.lax.Precision.HIGHEST)
        return [xs[0]]   # unreachable for n_layers >= 1; keeps jit happy


# ---------------------------------------------------------------------------
# Multi-token MBT (the "vmulti" family)
# ---------------------------------------------------------------------------

# bottleneck groups: 0=vit, 1=vi, 2=vt, 3=it; each modality carries three
# groups (mbt_encoder.py:380): vslt->(vit,vi,vt), img->(vit,vi,it),
# txt->(vit,vt,it)
GROUPS_PER_MODALITY = ((0, 1, 2), (0, 1, 3), (0, 2, 3))

# which modality contributes to each group, in modality order
_GROUP_CONTRIBUTORS = ((0, 1, 2), (0, 1), (0, 2), (1, 2))

# per-group, per-missing-case contributor-index subsets to average
# (mbt_encoder.py:427-430, keyed by GROUP; items indexed by missing case)
_GROUP_CASE_SUBSETS = (
    ((0, 1, 2), (0, 1), (0, 2), (0,)),   # group vit
    ((0, 1), (0, 1), (0,), (0,)),        # group vi
    ((0, 1), (0,), (0, 1), (0,)),        # group vt (case 3 falls back to
                                         # the vslt contribution — verified
                                         # against the live reference map)
    ((0, 1), (0,), (1,), (0,)),          # group it (case 3 unused downstream)
)


def _group_case_weights() -> np.ndarray:
    """[G, 4 cases, max_contrib] normalized mean weights over each group's
    contributor list."""
    W = np.zeros((4, 4, 3), dtype=np.float32)
    for g, cases in enumerate(_GROUP_CASE_SUBSETS):
        for c, subset in enumerate(cases):
            for i in subset:
                W[g, c, i] = 1.0 / len(subset)
    return W


def _block_mask_vslt(n: int) -> np.ndarray:
    """16x16 block over [3 bottleneck groups ∥ 4 cls] for the vslt stack
    (mbt_encoder.py:381-396). True = masked."""
    assert n == 4, "reference block masks are hand-built for bottlenecks_n=4"
    m = np.zeros((16, 16))
    m[:16, :16] = 1
    for s in range(3):
        m[4 * s:4 * (s + 1), 4 * s:4 * (s + 1)] = 0
    for c in range(4):
        m[12 + c, 12 + c] = 0
    for c, s in ((12, 0), (13, 1), (14, 2)):
        m[c, 4 * s:4 * (s + 1)] = 0
        m[4 * s:4 * (s + 1), c] = 0
    return m >= 0.5


def _block_mask_imgtxt(L_total: int, n: int) -> np.ndarray:
    """Full-sequence additive mask for img/txt stacks
    (mbt_encoder.py:398-422): the hand pattern is written over the first 16
    positions even though those stacks have 12 bottlenecks + 2 cls — the
    first two content tokens get caught in the masked block (quirk
    preserved)."""
    assert n == 4
    m = np.zeros((L_total, L_total))
    m[:16, :16] = 1
    for s in range(3):
        m[4 * s:4 * (s + 1), 4 * s:4 * (s + 1)] = 0
    m[12, 12] = 0
    m[13, 13] = 0
    m[12, :4] = 0
    m[:4, 12] = 0
    m[13, 4:8] = 0
    m[4:8, 13] = 0
    return m >= 0.5


def _block_mask_groups12(n: int) -> np.ndarray:
    """12x12 group-diagonal mask for img/txt in the VSLTMAIN variant
    (mbt_encoder.py:81-93)."""
    m = np.ones((3 * n, 3 * n))
    for s in range(3):
        m[n * s:n * (s + 1), n * s:n * (s + 1)] = 0
    return m >= 0.5


class MultitokenMBTFusion(nn.Module):
    """TrimodalTransformerEncoder_Multitokens_MBT (mbt_encoder.py:329-517).

    Per-modality cls token counts [4, 2, 2]; four bottleneck groups
    (vit/vi/vt/it) of n tokens each; every modality concatenates its three
    relevant groups + cls + tokens. Hand-built block masks confine
    bottleneck/cls attention; per-group missing-aware means are computed as
    static weight matrices selected by one-hot missing case."""
    n_modality: int = 3
    bottlenecks_n: int = 4
    fusion_startidx: int = 0
    n_layers: int = 6
    n_head: int = 4
    d_model: int = 256
    d_ff: int = 1024
    dropout: float = 0.1
    txt_idx: int = 2
    use_pe: Tuple[bool, ...] = (False, False, True)
    mask: Tuple[bool, ...] = (True, True, True)
    dtype: jnp.dtype = jnp.float32

    CLS_NUM = (4, 2, 2)

    @nn.compact
    def __call__(self, enc_inputs, varying_lengths, missing_num,
                 deterministic: bool = True):
        M, n = self.n_modality, self.bottlenecks_n
        B, D = enc_inputs[0].shape[0], self.d_model

        cls_tokens = [
            self.param(f"cls_tokens_{m}", nn.initializers.normal(1.0),
                       (1, self.CLS_NUM[m], D)) for m in range(M)]
        group_params = [
            self.param(f"bottlenecks_{g}", nn.initializers.normal(1.0),
                       (1, n, D)) for g in range(4)]

        xs, b_key_masks, plain_masks = [], [], []
        for m in range(M):
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_tokens[m], (B, self.CLS_NUM[m], D)
                                  ).astype(self.dtype),
                 enc_inputs[m].astype(self.dtype)], axis=1)
            L = x.shape[1]
            vlen = varying_lengths[m] + self.CLS_NUM[m]
            if m == self.txt_idx:
                vlen = jnp.where(vlen == 3, 0, vlen)
            plain_masks.append(length_key_mask(vlen, L) if self.mask[m] else None)
            Lb = L + 3 * n
            if self.mask[m]:
                pad = length_key_mask(vlen + 3 * n, Lb)       # [B, Lb]
                full = jnp.broadcast_to(pad[:, None, :], (B, Lb, Lb))
                if m == 0:
                    block = jnp.asarray(_block_mask_vslt(n))
                    full = full.at[:, :16, :16].set(block[None])
                else:
                    block = jnp.asarray(_block_mask_imgtxt(Lb, n))
                    full = full | block[None]
                b_key_masks.append(full)
            else:
                b_key_masks.append(None)
            # torch nn.LayerNorm in the reference (mbt_encoder.py:683) — NOT
            # the custom std-based LayerNorm used inside encoder-layer prenorms
            h = LayerNorm(dtype=self.dtype, name=f"layer_norm_in_{m}")(x)
            if self.use_pe[m]:
                h = h + positional_encoding(L, D, self.dtype)
            xs.append(nn.Dropout(self.dropout)(h, deterministic=deterministic))

        groups = [jnp.broadcast_to(p, (B, n, D)).astype(self.dtype)
                  for p in group_params]
        case_w = jnp.asarray(_group_case_weights())           # [G, 4, 3]
        onehot = jax.nn.one_hot(missing_num, 4, dtype=jnp.float32)

        for layer in range(self.n_layers):
            if layer < self.fusion_startidx:
                for m in range(M):
                    xs[m] = encoder_layer(
                        D, self.n_head, self.d_ff, self.dropout, self.dtype,
                        name=f"layers_{layer}_{m}")(xs[m], plain_masks[m],
                                                    deterministic)
                continue
            new_xs = [None] * M
            contribs = [[] for _ in range(4)]   # group -> per-modality outs
            for m in range(M):
                b_in = jnp.concatenate(
                    [jnp.concatenate([groups[g] for g in
                                      GROUPS_PER_MODALITY[m]], axis=1), xs[m]],
                    axis=1)
                out = encoder_layer(
                    D, self.n_head, self.d_ff, self.dropout, self.dtype,
                    name=f"layers_{layer}_{m}")(b_in, b_key_masks[m],
                                                deterministic)
                for slot, g in enumerate(GROUPS_PER_MODALITY[m]):
                    contribs[g].append(out[:, n * slot:n * (slot + 1)])
                new_xs[m] = out[:, 3 * n:]
            xs = new_xs
            new_groups = []
            for g in range(4):
                stack = jnp.stack(contribs[g])                # [C, B, n, D]
                C = stack.shape[0]
                mix = jnp.einsum("bk,kc->bc", onehot, case_w[g, :, :C],
                                 precision=jax.lax.Precision.HIGHEST)
                new_groups.append(jnp.einsum(
                    "bc,cbnd->bnd", mix.astype(stack.dtype), stack,
                    precision=jax.lax.Precision.HIGHEST))
            groups = new_groups
        return xs


class MultitokenMBTVSLTMAINFusion(nn.Module):
    """TrimodalTransformerEncoder_Multitokens_MBTVSLTMAIN
    (mbt_encoder.py:9-193): only the vslt stack carries the 4 cls tokens;
    one shared bottleneck parameter replicated into the three group slots at
    the first fusion layer; img/txt block masks are 12x12 group-diagonal
    over the bottlenecks only."""
    n_modality: int = 3
    bottlenecks_n: int = 4
    fusion_startidx: int = 0
    n_layers: int = 6
    n_head: int = 4
    d_model: int = 256
    d_ff: int = 1024
    dropout: float = 0.1
    txt_idx: int = 2
    use_pe: Tuple[bool, ...] = (False, False, True)
    mask: Tuple[bool, ...] = (True, True, True)
    dtype: jnp.dtype = jnp.float32

    N_CLS = 4

    @nn.compact
    def __call__(self, enc_inputs, varying_lengths, missing_num,
                 deterministic: bool = True):
        M, n = self.n_modality, self.bottlenecks_n
        B, D = enc_inputs[0].shape[0], self.d_model

        cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                               (1, self.N_CLS, D))
        bottleneck_init = self.param("bottlenecks", nn.initializers.normal(1.0),
                                     (1, n, D))

        xs, b_key_masks, plain_masks = [], [], []
        for m in range(M):
            x = enc_inputs[m].astype(self.dtype)
            vlen = varying_lengths[m]
            if m == 0:
                x = jnp.concatenate(
                    [jnp.broadcast_to(cls_token, (B, self.N_CLS, D)
                                      ).astype(self.dtype), x], axis=1)
                vlen = vlen + self.N_CLS
            if m == self.txt_idx:
                vlen = jnp.where(vlen == 3, 0, vlen)
            L = x.shape[1]
            plain_masks.append(length_key_mask(vlen, L) if self.mask[m] else None)
            Lb = L + 3 * n
            if self.mask[m]:
                pad = length_key_mask(vlen + 3 * n, Lb)
                full = jnp.broadcast_to(pad[:, None, :], (B, Lb, Lb))
                if m == 0:
                    block = jnp.asarray(_block_mask_vslt(n))
                    full = full.at[:, :16, :16].set(block[None])
                else:
                    block = jnp.asarray(_block_mask_groups12(n))
                    full = full.at[:, :3 * n, :3 * n].set(block[None])
                b_key_masks.append(full)
            else:
                b_key_masks.append(None)
            # torch nn.LayerNorm in the reference (mbt_encoder.py:683) — NOT
            # the custom std-based LayerNorm used inside encoder-layer prenorms
            h = LayerNorm(dtype=self.dtype, name=f"layer_norm_in_{m}")(x)
            if self.use_pe[m]:
                h = h + positional_encoding(L, D, self.dtype)
            xs.append(nn.Dropout(self.dropout)(h, deterministic=deterministic))

        groups = None   # first fusion layer replicates the shared parameter
        case_w = jnp.asarray(_group_case_weights())
        onehot = jax.nn.one_hot(missing_num, 4, dtype=jnp.float32)
        shared = jnp.broadcast_to(bottleneck_init, (B, n, D)).astype(self.dtype)

        for layer in range(self.n_layers):
            if layer < self.fusion_startidx:
                for m in range(M):
                    xs[m] = encoder_layer(
                        D, self.n_head, self.d_ff, self.dropout, self.dtype,
                        name=f"layers_{layer}_{m}")(xs[m], plain_masks[m],
                                                    deterministic)
                continue
            new_xs = [None] * M
            contribs = [[] for _ in range(4)]
            for m in range(M):
                if groups is None:
                    bottlenecks = jnp.concatenate([shared] * 3, axis=1)
                else:
                    bottlenecks = jnp.concatenate(
                        [groups[g] for g in GROUPS_PER_MODALITY[m]], axis=1)
                b_in = jnp.concatenate([bottlenecks, xs[m]], axis=1)
                out = encoder_layer(
                    D, self.n_head, self.d_ff, self.dropout, self.dtype,
                    name=f"layers_{layer}_{m}")(b_in, b_key_masks[m],
                                                deterministic)
                for slot, g in enumerate(GROUPS_PER_MODALITY[m]):
                    contribs[g].append(out[:, n * slot:n * (slot + 1)])
                new_xs[m] = out[:, 3 * n:]
            xs = new_xs
            new_groups = []
            for g in range(4):
                stack = jnp.stack(contribs[g])
                C = stack.shape[0]
                mix = jnp.einsum("bk,kc->bc", onehot, case_w[g, :, :C],
                                 precision=jax.lax.Precision.HIGHEST)
                new_groups.append(jnp.einsum(
                    "bc,cbnd->bnd", mix.astype(stack.dtype), stack,
                    precision=jax.lax.Precision.HIGHEST))
            groups = new_groups
        return xs
