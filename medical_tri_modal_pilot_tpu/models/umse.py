"""UMSE — Unified Multi-modal Set Embedding stems.

Every live model shares these input stems (tri_mbt_vsltcls.py:59-76,
:183-224): per-TIE-token value/time/feature-id embeddings summed, a
demographics stem, a text projection (BioBERT 768 -> d or token embedding),
and optional modality-timestamp embeddings for img/txt tokens
(feature ids 18/19) when --imgtxt-time 1. QIE additionally adds the demo
embedding to every token.

The TIE token path (value/time stems + feature table + sum) declares its
weights explicitly (same param-tree names as MLPStem/nn.Embed would
produce) so the fused Pallas kernel (kernels/umse.py) can compute the
whole chain in VMEM; ops.configure picks the kernel or the pure-jnp
formula.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..constants import IMG_FEATURE_ID, N_FEATURE_IDS, TXT_FEATURE_ID
from ..kernels.umse import xla_umse, _stem as stem_formula
from .modules import MLPStem

_UMSE_IMPL = xla_umse


def set_umse_impl(fn) -> None:
    global _UMSE_IMPL
    _UMSE_IMPL = fn


class _StemParams(nn.Module):
    """MLPStem-shaped params (Dense_0/LayerNorm_0 children, identical names
    and initializers), returned raw for the fused kernel."""
    d_model: int

    @nn.compact
    def __call__(self, in_features: int = 1):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.d_model))
        b = self.param("bias", nn.initializers.zeros, (self.d_model,))
        return w, b


class _LNParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class _TIEStem(nn.Module):
    """Declares one MLPStem-equivalent param set under this module's name
    (children Dense_0 + LayerNorm_0, matching MLPStem's auto-names)."""
    d_model: int

    @nn.compact
    def __call__(self):
        w, b = _StemParams(self.d_model, name="Dense_0")(1)
        s, bb = _LNParams(self.d_model, name="LayerNorm_0")()
        return w, b, s, bb


class UMSE(nn.Module):
    """Produces (vslt_embedding, txt_embedding, demo_embedding) and offers
    img/txt time-feature enrichment. Shared stems unless share=False
    (tri_mbt_vsltcls_noshareumse.py keeps separate per-modality stems)."""
    d_model: int = 256
    vslt_type: str = "TIE"           # carryforward | TIE | QIE
    berttype: str = "biobert"        # biobert (Linear 768->d) | bert (Embed)
    imgtxt_time: int = 0
    vslt_input_size: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.vslt_type == "carryforward":
            self.vslt_enc = MLPStem(self.d_model, self.dtype)
        else:
            self.ie_vslt = _TIEStem(self.d_model)
        self.ie_time = _TIEStem(self.d_model)
        # keep the nn.Embed param tree (ie_feat/embedding) and initializer;
        # the raw table feeds the fused kernel
        self.ie_feat = nn.Embed(N_FEATURE_IDS, self.d_model,
                                dtype=self.dtype)
        self.ie_demo = MLPStem(self.d_model, self.dtype)
        if self.berttype == "bert":
            self.txt_embedding = nn.Embed(30000, self.d_model, dtype=self.dtype)
        else:
            self.txt_embedding = nn.Dense(self.d_model, dtype=self.dtype)

    def _time_stem(self, t_col: jnp.ndarray) -> jnp.ndarray:
        """relu(LN(t*W + b)) via the shared formula (t_col: [R, 1])."""
        wt, bt, st, bbt = self.ie_time()
        return stem_formula(t_col, wt, bt, st, bbt, self.dtype).astype(
            self.dtype)

    def embed_vslt(self, x: jnp.ndarray, age: jnp.ndarray, gen: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: TIE [B, L, 3] or carryforward [B, T, F].
        Returns (vslt tokens [B, L, D], demo embedding [B, D])."""
        demographic = jnp.stack([age, gen], axis=1).astype(self.dtype)
        demo = self.ie_demo(demographic)
        if self.vslt_type == "carryforward":
            if x.ndim == 4:
                # dataset ships the [B, 3(data,mask,delta), T, F] stack;
                # the reference trainer feeds vslt_enc the DATA channel
                # only (trainer.py:40-44 data = train_x[0];
                # tri_mbt_vsltcls.py:180 vslt_enc(x))
                x = x[:, 0]
            return self.vslt_enc(x.astype(self.dtype)), demo
        wv, bv, sv, bbv = self.ie_vslt()
        wt, bt, st, bbt = self.ie_time()
        tokens = _UMSE_IMPL(x.astype(jnp.float32), wv, bv, sv, bbv,
                            wt, bt, st, bbt, self.ie_feat.embedding,
                            self.dtype)
        if self.vslt_type == "QIE":
            tokens = tokens + demo[:, None, :]
        return tokens, demo

    def embed_txt(self, txt: jnp.ndarray) -> jnp.ndarray:
        if self.berttype == "bert":
            return self.txt_embedding(txt.astype(jnp.int32))
        return self.txt_embedding(txt.astype(self.dtype))

    def add_time_feature(self, tokens: jnp.ndarray, t: jnp.ndarray,
                         feature_id: int, demo: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
        """imgtxt-time enrichment (tri_mbt_vsltcls.py:216-224): add the
        modality timestamp embedding + a constant feature-id embedding
        (18 img / 19 txt) to every token; QIE also adds demo."""
        B = tokens.shape[0]
        te = self._time_stem(t.reshape(B, 1).astype(jnp.float32))[:, None, :]
        fe = self.ie_feat.embedding[feature_id].astype(
            self.dtype)[None, None, :]
        out = tokens + te + fe
        if self.vslt_type == "QIE" and demo is not None:
            out = out + demo[:, None, :]
        return out
