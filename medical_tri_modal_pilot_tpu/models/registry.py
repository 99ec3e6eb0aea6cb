"""Model registry: --model name -> constructor (reference
builder/models/__init__.py:14-51 imports 8_missing_models.<name> and
returns class <NAME-UPPERCASED>).

Every live registry name is mapped; reference files that are wiring
variants of one core (v1/v2/v3, flexible/flexible2/flexible3) share an
implementation parameterized by the distinguishing knob (head norm /
freeze / stem for v*, softmax temperature for flexible*). mt_v1 is dead
in the reference (undefined MultimodalTransformerEncoder) and mapped to
the working concat-fusion core here.
"""
from __future__ import annotations

from typing import Callable, Dict

from ..config import Config
from . import baselines as B
from . import extras as X
from . import models as M

_REGISTRY: Dict[str, Callable] = {
    # flagship + variants
    "tri_mbt_vsltcls": M.TRI_MBT_VSLTCLS,
    "tri_mbt_vsltcls_noshareumse": M.TRI_MBT_VSLTCLS_NOSHAREUMSE,
    "tri_mbt_v1": M.TRI_MBT_V1,
    # v2/v3 differ in wiring, not head math — see TRI_MBT_V1 docstring
    "tri_mbt_v2": lambda cfg: M.TRI_MBT_V1(cfg, variant=2),
    "tri_mbt_v3": lambda cfg: M.TRI_MBT_V1(cfg, variant=3),
    "tri_mbt_vflexible": M.TRI_MBT_VFLEXIBLE,
    # flexible2/3 scale the masked weights before the softmax
    # (tri_mbt_vflexible2.py:279 *10, vflexible3.py:279 *3.334)
    "tri_mbt_vflexible2": lambda cfg: M.TRI_MBT_VFLEXIBLE(cfg, flex_temp=10.0),
    "tri_mbt_vflexible3": lambda cfg: M.TRI_MBT_VFLEXIBLE(cfg, flex_temp=3.334),
    "tri_mbt_vnoshavgtr": M.TRI_MBT_VNOSHAVGTR,
    "tri_mbt_vnoshnoavgtr": M.TRI_MBT_VNOSHNOAVGTR,
    # multitoken family
    "tri_mbt_vmulti": M.TRI_MBT_VMULTI,
    "tri_mbt_vmulti2": M.TRI_MBT_VMULTI2,
    "tri_mbt_vmultivslt": M.TRI_MBT_VMULTIVSLT,
    # bimodal counterparts of the flagship (reference files are broken —
    # see models.py module docstring — implemented functionally)
    "biimg_mbt_vsltcls": M.TRI_MBT_VSLTCLS,
    "bitxt_mbt_vsltcls": M.TRI_MBT_VSLTCLS,
    # missing-selected cls-vector mean -> one shared head (NOT the
    # per-modality-logit mixing of tri_mbt_v1 — the reference bimodal v1
    # files mean the vectors before the head, bi_vslttxt_mbt_v1.py:167-172)
    "bi_vsltimg_mbt_v1": M.BI_MBT_V1,
    "bi_vslttxt_mbt_v1": M.BI_MBT_V1,
    "biimg_mbt_vflexible1": M.TRI_MBT_VFLEXIBLE,
    "bitxt_mbt_vflexible1": M.TRI_MBT_VFLEXIBLE,
    # concat-fusion baselines
    "tri_mt_v1": M.MT_FUSION_MODEL,
    "biimg_mt_v1": M.MT_FUSION_MODEL,
    "bitxt_mt_v1": M.MT_FUSION_MODEL,
    # mt_v1.py references an undefined MultimodalTransformerEncoder in the
    # reference (dead file); mapped to the working concat-fusion core here
    "mt_v1": M.MT_FUSION_MODEL,
    # unimodal
    "unimodal_transformer": M.UNIMODAL_TRANSFORMER,
    # legacy / baseline families (SURVEY.md §2.5)
    "gru_d": B.GRU_D,
    "lstm": B.LSTM_MODEL,
    "fusiontrainer": B.FUSIONTRAINER,
    "feature_temporal_v1": X.FEATURE_TEMPORAL_V1,
}


def _register_legacy_families() -> None:
    """Legacy families (builder/models/{1,2,4,5,6}_*) — see legacy.py."""
    from .legacy import register_legacy
    register_legacy(register)


def get_model(cfg: Config):
    """Instantiate the flax module for cfg.model."""
    name = cfg.model
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](cfg)


def available_models():
    return sorted(_REGISTRY)


# Models whose swin trunk runs under torch.no_grad in the reference: the
# trunk's grads are None there, so torch's AdamW SKIPS those params (no
# update, no weight decay, no moment state). The trainer mirrors that with
# optax.masked over the ``img_encoder`` subtree — without it, optax would
# weight-decay the frozen encoder (drift) and waste optimizer bandwidth.
_ALWAYS_FROZEN_IMG = {
    # tri_mbt_v1.py:228 wraps the swin call in no_grad unconditionally
    "tri_mbt_v1", "bi_vsltimg_mbt_v1", "bi_vslttxt_mbt_v1",
}
_PRETRAIN_FROZEN_IMG = {
    # flagship rule (tri_mbt_vsltcls.py:208-209): no_grad swin; the
    # reference constructs it frozen regardless, but only the pretrained
    # configuration is meaningful — mirror ImageEncoder's dispatch
    "tri_mbt_vsltcls", "tri_mbt_vsltcls_noshareumse",
    "biimg_mbt_vsltcls", "bitxt_mbt_vsltcls",
    "tri_mbt_vflexible", "tri_mbt_vflexible2", "tri_mbt_vflexible3",
    "biimg_mbt_vflexible1", "bitxt_mbt_vflexible1",
    "tri_mbt_vnoshavgtr", "tri_mbt_vnoshnoavgtr",
    "tri_mbt_vmulti", "tri_mbt_vmulti2", "tri_mbt_vmultivslt",
    "tri_mt_v1", "biimg_mt_v1", "bitxt_mt_v1", "mt_v1",
}


def frozen_img_trunk(cfg: Config) -> bool:
    """True when the model's swin image trunk receives zero gradients
    (jax.lax.stop_gradient in ImageEncoder), i.e. the param subtree named
    ``img_encoder`` must be excluded from optimizer updates."""
    if "img" not in cfg.input_types or cfg.img_model_type != "swin":
        return False
    if cfg.model in _ALWAYS_FROZEN_IMG:
        return True
    return cfg.model in _PRETRAIN_FROZEN_IMG and cfg.img_pretrain == "Yes"


def register(name: str, ctor: Callable) -> None:
    _REGISTRY[name] = ctor


_register_legacy_families()
