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

from .modules import (StdLayerNorm, TransformerEncoderLayer, length_key_mask,
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
            h = StdLayerNorm(D, dtype=self.dtype, name=f"layer_norm_in_{m}")(x)
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

        for layer in range(self.n_layers):
            if layer < self.fusion_startidx:
                xs = [
                    TransformerEncoderLayer(
                        D, self.n_head, self.d_ff, self.dropout, self.dtype,
                        name=f"layers_{layer}_{m}")(xs[m], key_masks[m],
                                                    deterministic)
                    for m in range(M)]
                continue
            last_layer = (layer == self.n_layers - 1)
            new_xs, bn_outs = [], []
            for m in range(M):
                if self.vsltonly == 1 and last_layer and m > 0:
                    new_xs.append(xs[m])
                    continue
                b_in = jnp.concatenate([bottlenecks, xs[m]], axis=1)
                out = TransformerEncoderLayer(
                    D, self.n_head, self.d_ff, self.dropout, self.dtype,
                    name=f"layers_{layer}_{m}")(b_in, b_key_masks[m],
                                                deterministic)
                bn_outs.append(out[:, :self.bottlenecks_n])
                new_xs.append(out[:, self.bottlenecks_n:])
            xs = new_xs
            if self.vsltonly == 1 and last_layer:
                break
            stack = jnp.stack(bn_outs)                       # [M, B, n, D]
            mixed = jnp.einsum("bm,mbnd->bnd", mix.astype(stack.dtype), stack,
                               precision=jax.lax.Precision.HIGHEST)
            if self.resbottle:
                mixed = (mixed + bottlenecks) / 2.0
            bottlenecks = mixed
        return xs


class MultitokenMBTFusion(nn.Module):
    """Multi-cls-token MBT (TrimodalTransformerEncoder_Multitokens_MBT,
    mbt_encoder.py:329-517): 4 cls tokens per modality — one per modality
    subset — each attending with its subset's bottleneck group; the trainer
    selects the cls matching each sample's missing_num."""
    n_modality: int = 3
    bottlenecks_n: int = 4
    fusion_startidx: int = 0
    n_layers: int = 6
    n_head: int = 4
    d_model: int = 256
    d_ff: int = 1024
    dropout: float = 0.1
    txt_idx: int = 2
    vslt_main: bool = False   # MBTVSLTMAIN variant: subsets always incl. vslt
    use_pe: Tuple[bool, ...] = (False, False, True)
    mask: Tuple[bool, ...] = (True, False, True)
    dtype: jnp.dtype = jnp.float32

    N_GROUPS: int = 4  # modality subsets: tri, v+i, v+t, v

    @nn.compact
    def __call__(self, enc_inputs, varying_lengths, missing_num,
                 deterministic: bool = True):
        M, G = self.n_modality, self.N_GROUPS
        B, D = enc_inputs[0].shape[0], self.d_model
        n = self.bottlenecks_n

        cls_tokens = [
            self.param(f"cls_tokens_{m}", nn.initializers.normal(1.0), (1, G, D))
            for m in range(M)]
        bottleneck_init = self.param(
            "bottlenecks", nn.initializers.normal(1.0), (1, G * n, D))

        # group membership: which modalities feed each bottleneck group
        member = np.zeros((G, M), dtype=np.float32)
        member[0, :] = 1                    # tri
        member[1, [0, 1]] = 1               # vslt + img
        member[2, [0, 2]] = 1               # vslt + txt
        member[3, 0] = 1                    # vslt only
        member /= member.sum(1, keepdims=True)
        member = jnp.asarray(member)

        xs, b_key_masks = [], []
        for m in range(M):
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_tokens[m], (B, G, D)).astype(self.dtype),
                 enc_inputs[m].astype(self.dtype)], axis=1)
            L = x.shape[1]
            vlen = varying_lengths[m] + G
            if m == self.txt_idx:
                vlen = jnp.where(vlen == 2 + G, 0, vlen)
            if self.mask[m]:
                b_key_masks.append(length_key_mask(vlen + G * n, L + G * n))
            else:
                b_key_masks.append(None)
            h = StdLayerNorm(D, dtype=self.dtype, name=f"layer_norm_in_{m}")(x)
            if self.use_pe[m]:
                h = h + positional_encoding(L, D, self.dtype)
            xs.append(nn.Dropout(self.dropout)(h, deterministic=deterministic))

        bottlenecks = jnp.broadcast_to(
            bottleneck_init, (B, G * n, D)).astype(self.dtype)

        for layer in range(self.n_layers):
            new_xs, bn_outs = [], []
            for m in range(M):
                b_in = jnp.concatenate([bottlenecks, xs[m]], axis=1)
                out = TransformerEncoderLayer(
                    D, self.n_head, self.d_ff, self.dropout, self.dtype,
                    name=f"layers_{layer}_{m}")(b_in, b_key_masks[m],
                                                deterministic)
                bn_outs.append(out[:, :G * n])
                new_xs.append(out[:, G * n:])
            xs = new_xs
            stack = jnp.stack(bn_outs)                    # [M, B, G*n, D]
            stack = stack.reshape(M, B, G, n, D)
            mixed = jnp.einsum("gm,mbgnd->bgnd", member.astype(stack.dtype),
                               stack, precision=jax.lax.Precision.HIGHEST)
            bottlenecks = mixed.reshape(B, G * n, D)
        return xs
