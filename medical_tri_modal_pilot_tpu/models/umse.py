"""UMSE — Unified Multi-modal Set Embedding stems.

Every live model shares these input stems (tri_mbt_vsltcls.py:59-76,
:183-224): per-TIE-token value/time/feature-id embeddings summed, a
demographics stem, a text projection (BioBERT 768 -> d or token embedding),
and optional modality-timestamp embeddings for img/txt tokens
(feature ids 18/19) when --imgtxt-time 1. QIE additionally adds the demo
embedding to every token.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..constants import IMG_FEATURE_ID, N_FEATURE_IDS, TXT_FEATURE_ID
from .modules import MLPStem


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
            self.ie_vslt = MLPStem(self.d_model, self.dtype)
        self.ie_time = MLPStem(self.d_model, self.dtype)
        self.ie_feat = nn.Embed(N_FEATURE_IDS, self.d_model, dtype=self.dtype)
        self.ie_demo = MLPStem(self.d_model, self.dtype)
        if self.berttype == "bert":
            self.txt_embedding = nn.Embed(30000, self.d_model, dtype=self.dtype)
        else:
            self.txt_embedding = nn.Dense(self.d_model, dtype=self.dtype)

    def embed_vslt(self, x: jnp.ndarray, age: jnp.ndarray, gen: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: TIE [B, L, 3] or carryforward [B, T, F].
        Returns (vslt tokens [B, L, D], demo embedding [B, D])."""
        demographic = jnp.stack([age, gen], axis=1).astype(self.dtype)
        demo = self.ie_demo(demographic)
        if self.vslt_type == "carryforward":
            return self.vslt_enc(x.astype(self.dtype)), demo
        value = self.ie_vslt(x[:, :, 1:2].astype(self.dtype))
        time = self.ie_time(x[:, :, 0:1].astype(self.dtype))
        feat = self.ie_feat(x[:, :, 2].astype(jnp.int32))
        tokens = value + time + feat
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
        te = self.ie_time(t.reshape(B, 1).astype(self.dtype))[:, None, :]
        fid = jnp.full((B, 1), feature_id, dtype=jnp.int32)
        fe = self.ie_feat(fid)
        out = tokens + te + fe
        if self.vslt_type == "QIE" and demo is not None:
            out = out + demo[:, None, :]
        return out
