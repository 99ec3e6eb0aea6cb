"""Compute-op dispatch: selects the Pallas fused kernels or the XLA
reference implementations for the model hot loops."""
from __future__ import annotations

from ..models import modules as _modules
from ..models import swin as _swin


def configure(use_pallas: bool) -> None:
    if use_pallas:
        from ..kernels.attention import pallas_masked_attention
        from ..kernels.swin_attention import pallas_window_attention
        _modules.set_attention_impl(pallas_masked_attention)
        _swin.set_window_attention_impl(pallas_window_attention)
    else:
        from ..kernels.swin_attention import xla_window_attention
        _modules.set_attention_impl(_modules.masked_softmax_attention)
        _swin.set_window_attention_impl(xla_window_attention)


def current_attention_impl():
    return _modules.get_attention_impl()
