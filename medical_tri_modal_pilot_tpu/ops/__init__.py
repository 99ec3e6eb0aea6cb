"""Compute-op dispatch: selects the Pallas fused kernels or the XLA
reference implementations for the model hot loops."""
from __future__ import annotations

from ..models import modules as _modules
from ..models import swin as _swin
from ..models import umse as _umse


def configure(use_pallas: bool) -> None:
    if use_pallas:
        from ..kernels.attention import pallas_masked_attention
        from ..kernels.ffn import pallas_ffn
        from ..kernels.swin_attention import pallas_window_attention
        from ..kernels.swin_mlp import pallas_swin_mlp
        from ..kernels.umse import pallas_umse
        _modules.set_attention_impl(pallas_masked_attention)
        _modules.set_ffn_impl(pallas_ffn)
        _swin.set_window_attention_impl(pallas_window_attention)
        _swin.set_swin_mlp_impl(pallas_swin_mlp)
        _umse.set_umse_impl(pallas_umse)
    else:
        from ..kernels.swin_attention import xla_window_attention
        from ..kernels.swin_mlp import xla_swin_mlp
        from ..kernels.umse import xla_umse
        _modules.set_attention_impl(_modules.masked_softmax_attention)
        _modules.set_ffn_impl(None)
        _swin.set_window_attention_impl(xla_window_attention)
        _swin.set_swin_mlp_impl(xla_swin_mlp)
        _umse.set_umse_impl(xla_umse)


def current_attention_impl():
    return _modules.get_attention_impl()
