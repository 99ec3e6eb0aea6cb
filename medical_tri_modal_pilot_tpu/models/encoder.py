"""Generic transformer encoders (reference encoder.py:36-249).

``TransformerEncoder`` — optional input linear, optional cls token,
optional sinusoidal PE, stack of pre-norm layers. Used by
unimodal_transformer and the text/vslt baselines.

``MTFusion`` — the concat-fusion trimodal baseline
(TrimodalTransformerEncoder_MT, encoder.py:120-249): per-modality stacks for
the first fusion_startidx layers, then one joint stack over
[final_cls ∥ vslt ∥ img ∥ txt] with a combined pad mask.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .modules import (StdLayerNorm, TransformerEncoderLayer, encoder_layer, length_key_mask, LayerNorm,
                      positional_encoding)


class TransformerEncoder(nn.Module):
    d_input: int
    n_layers: int
    n_head: int
    d_model: int
    d_ff: int
    dropout: float = 0.1
    pe_maxlen: int = 5000
    use_pe: bool = True
    classification: bool = False
    mask: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, input_lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        B = x.shape[0]
        if self.classification:
            cls = self.param("cls_tokens", nn.initializers.zeros,
                             (1, 1, self.d_model))
            # note: cls prepended BEFORE the input linear in the reference
            # only when d_input == d_model (encoder.py:84-96); models using
            # this class always pass d_input == d_model.
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (B, 1, self.d_model)).astype(x.dtype), x],
                axis=1)
        key_mask = None
        if self.mask and input_lengths is not None:
            if x.shape[1] > 512:
                # align long streams to the flash kernel's q tile so the
                # per-layer pads/slices inside the kernel wrapper are no-ops
                # (padded rows are masked below; callers read cls/row 0)
                tgt = -(-x.shape[1] // 256) * 256
                x = jnp.pad(x, ((0, 0), (0, tgt - x.shape[1]), (0, 0)))
            key_mask = length_key_mask(input_lengths, x.shape[1])
        if self.d_input != self.d_model:
            x = nn.Dense(self.d_model, dtype=self.dtype, name="linear_in")(x)
        h = LayerNorm(dtype=self.dtype, name="layer_norm_in")(x)
        if self.use_pe:
            h = h + positional_encoding(x.shape[1], self.d_model, self.dtype)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        for i in range(self.n_layers):
            h = encoder_layer(
                self.d_model, self.n_head, self.d_ff, self.dropout,
                self.dtype, name=f"layers_{i}")(h, key_mask, deterministic)
        return h


class MTFusion(nn.Module):
    """Concat-fusion trimodal encoder (encoder.py:120-249). A final cls
    token is prepended at the first fusion layer; the joint mask is the
    concatenation of per-modality pad masks."""
    n_modality: int = 3
    fusion_startidx: int = 0
    n_layers: int = 6
    n_head: int = 4
    d_model: int = 256
    d_ff: int = 1024
    dropout: float = 0.1
    txt_idx: int = 2
    use_pe: bool = True
    mask: Tuple[bool, ...] = (True, False, True)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_inputs: Sequence[jnp.ndarray],
                 varying_lengths: Sequence[jnp.ndarray],
                 deterministic: bool = True):
        M = self.n_modality
        B, D = enc_inputs[0].shape[0], self.d_model
        img_cls = self.param("cls_token_for_img", nn.initializers.normal(1.0),
                             (1, 1, D))
        final_cls = self.param("final_cls_tokens", nn.initializers.zeros,
                               (1, 1, D))

        xs, masks, vlens = [], [], []
        for m in range(M):
            x = enc_inputs[m].astype(self.dtype)
            vlen = varying_lengths[m]
            if m == 1:
                x = jnp.concatenate(
                    [jnp.broadcast_to(img_cls, (B, 1, D)).astype(self.dtype), x],
                    axis=1)
                vlen = vlen + 1
            h = StdLayerNorm(D, dtype=self.dtype, name=f"layer_norm_in_{m}")(x)
            if self.use_pe:
                h = h + positional_encoding(h.shape[1], D, self.dtype)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            if m == self.txt_idx:
                vlen = jnp.where(vlen == 2, 0, vlen)
            masks.append(length_key_mask(vlen, h.shape[1])
                         if self.mask[m] else None)
            vlens.append(vlen)
            xs.append(h)

        joint = None
        joint_mask = None
        for layer in range(self.n_layers):
            if layer < self.fusion_startidx:
                for m in range(M):
                    xs[m] = encoder_layer(
                        D, self.n_head, self.d_ff, self.dropout, self.dtype,
                        name=f"specific_{m}_{layer}")(xs[m], masks[m],
                                                      deterministic)
            else:
                if joint is None:
                    joint = jnp.concatenate(
                        [jnp.broadcast_to(final_cls, (B, 1, D)).astype(self.dtype)]
                        + xs, axis=1)
                    parts = [jnp.zeros((B, 1), bool)]
                    for m in range(M):
                        L = xs[m].shape[1]
                        parts.append(length_key_mask(vlens[m], L)
                                     if self.mask[m] else jnp.zeros((B, L), bool))
                    joint_mask = jnp.concatenate(parts, axis=1)
                joint = encoder_layer(
                    D, self.n_head, self.d_ff, self.dropout, self.dtype,
                    name=f"fusion_{layer}")(joint, joint_mask, deterministic)
        return joint if joint is not None else jnp.concatenate(xs, axis=1)
