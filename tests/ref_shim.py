"""Import helper that lets the reference dataset code at /root/reference run
in-process (CPU torch) for golden-value extraction in parity tests.

The reference imports torchvision / pickle5 / monai which aren't installed;
only their names are needed for the dataset __init__ index machinery (the
transform objects are constructed but not called), so we install minimal
stand-ins before importing reference modules. Nothing from the reference is
copied — it is executed as-is from its own tree.
"""
from __future__ import annotations

import pickle
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_stub_torchvision():
    if "torchvision" in sys.modules:
        return
    import torch
    from torch import nn

    import importlib.machinery
    tv = types.ModuleType("torchvision")
    # transformers probes importlib.util.find_spec("torchvision"), which
    # requires a real-looking __spec__ on the stub
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    tv.__version__ = "0.15.2"
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")

    class _Dummy:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    for name in ["Compose", "Resize", "CenterCrop", "ToTensor", "RandomAffine",
                 "RandomResizedCrop", "RandAugment", "Normalize"]:
        setattr(transforms, name, _Dummy)
    functional.equalize = lambda x: x
    transforms.functional = functional
    tv.transforms = transforms

    # ---- functional pieces the reference's swin/vit copies import ----
    # (public torchvision API semantics reimplemented on plain torch, so the
    # reference model files execute as-is for golden runs / benchmarking)
    ops = types.ModuleType("torchvision.ops")
    misc = types.ModuleType("torchvision.ops.misc")
    sdepth = types.ModuleType("torchvision.ops.stochastic_depth")

    class MLP(nn.Sequential):
        def __init__(self, in_channels, hidden_channels, norm_layer=None,
                     activation_layer=nn.ReLU, inplace=None, bias=True,
                     dropout=0.0):
            params = {} if inplace is None else {"inplace": inplace}
            layers = []
            in_dim = in_channels
            for hidden_dim in hidden_channels[:-1]:
                layers.append(nn.Linear(in_dim, hidden_dim, bias=bias))
                if norm_layer is not None:
                    layers.append(norm_layer(hidden_dim))
                layers.append(activation_layer(**params))
                layers.append(nn.Dropout(dropout, **params))
                in_dim = hidden_dim
            layers.append(nn.Linear(in_dim, hidden_channels[-1], bias=bias))
            layers.append(nn.Dropout(dropout, **params))
            super().__init__(*layers)

    class Permute(nn.Module):
        def __init__(self, dims):
            super().__init__()
            self.dims = dims

        def forward(self, x):
            return torch.permute(x, self.dims)

    class Conv2dNormActivation(nn.Sequential):
        def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                     padding=None, groups=1, norm_layer=nn.BatchNorm2d,
                     activation_layer=nn.ReLU, dilation=1, inplace=True,
                     bias=None, **kwargs):
            if padding is None:
                padding = (kernel_size - 1) // 2 * dilation
            if bias is None:
                bias = norm_layer is None
            layers = [nn.Conv2d(in_channels, out_channels, kernel_size,
                                stride, padding, dilation=dilation,
                                groups=groups, bias=bias)]
            if norm_layer is not None:
                layers.append(norm_layer(out_channels))
            if activation_layer is not None:
                params = {} if inplace is None else {"inplace": inplace}
                layers.append(activation_layer(**params))
            super().__init__(*layers)
            self.out_channels = out_channels

    def stochastic_depth(inp, p, mode, training=True):
        if p == 0.0 or not training:
            return inp
        survival = 1.0 - p
        size = ([inp.shape[0]] + [1] * (inp.ndim - 1)
                if mode == "row" else [1] * inp.ndim)
        noise = torch.empty(size, dtype=inp.dtype,
                            device=inp.device).bernoulli_(survival)
        if survival > 0.0:
            noise.div_(survival)
        return inp * noise

    class StochasticDepth(nn.Module):
        def __init__(self, p, mode):
            super().__init__()
            self.p, self.mode = p, mode

        def forward(self, x):
            return stochastic_depth(x, self.p, self.mode, self.training)

    misc.MLP = MLP
    misc.Permute = Permute
    misc.Conv2dNormActivation = Conv2dNormActivation
    sdepth.stochastic_depth = stochastic_depth
    sdepth.StochasticDepth = StochasticDepth
    ops.misc = misc
    ops.stochastic_depth = sdepth
    tv.ops = ops

    presets = types.ModuleType("torchvision.transforms._presets")

    class InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"
        NEAREST = "nearest"

    presets.ImageClassification = _Dummy
    presets.InterpolationMode = InterpolationMode

    utils_mod = types.ModuleType("torchvision.utils")
    utils_mod._log_api_usage_once = lambda *a, **k: None

    models = types.ModuleType("torchvision.models")
    api = types.ModuleType("torchvision.models._api")

    class Weights:
        """Weight-entry record. ``get_state_dict`` cannot download in this
        environment; tests/benchmarks that construct pretrained variants
        monkeypatch it per-instance with a shape-correct fake."""
        def __init__(self, url=None, transforms=None, meta=None):
            self.url, self.transforms, self.meta = url, transforms, meta

        def get_state_dict(self, progress=True):
            raise RuntimeError(
                "no network in this environment — install a fake state dict "
                "on this Weights instance for pretrained-path runs")

    class WeightsEnum:
        @classmethod
        def verify(cls, obj):
            return obj

    def register_model(name=None):
        def deco(fn):
            return fn
        return deco

    api.Weights = Weights
    api.WeightsEnum = WeightsEnum
    api.register_model = register_model

    meta_mod = types.ModuleType("torchvision.models._meta")
    meta_mod._IMAGENET_CATEGORIES = [f"class_{i}" for i in range(1000)]

    mutils = types.ModuleType("torchvision.models._utils")

    def _ovewrite_named_param(kwargs, name, value):
        if name in kwargs and kwargs[name] != value:
            raise ValueError(f"param {name}={kwargs[name]} != {value}")
        kwargs[name] = value

    def handle_legacy_interface(**weights):
        def deco(fn):
            return fn
        return deco

    class _ModelURLs(dict):
        pass

    mutils._ovewrite_named_param = _ovewrite_named_param
    mutils.handle_legacy_interface = handle_legacy_interface
    mutils._ModelURLs = _ModelURLs

    models._api = api
    models._meta = meta_mod
    models._utils = mutils
    tv.models = models
    tv.utils = utils_mod

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional
    sys.modules["torchvision.transforms._presets"] = presets
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.misc"] = misc
    sys.modules["torchvision.ops.stochastic_depth"] = sdepth
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models._api"] = api
    sys.modules["torchvision.models._meta"] = meta_mod
    sys.modules["torchvision.models._utils"] = mutils
    sys.modules["torchvision.utils"] = utils_mod


def _install_stub_monai():
    if "monai" in sys.modules:
        return
    import torch
    from torch import nn

    monai = types.ModuleType("monai")
    networks = types.ModuleType("monai.networks")
    blocks = types.ModuleType("monai.networks.blocks")
    patchembedding = types.ModuleType("monai.networks.blocks.patchembedding")

    class PatchEmbeddingBlock(nn.Module):
        """monai conv patch embedding (the only mode the reference uses:
        pos_embed='conv', spatial_dims=2)."""
        def __init__(self, in_channels, img_size, patch_size, hidden_size,
                     num_heads, pos_embed="conv", dropout_rate=0.0,
                     spatial_dims=2):
            super().__init__()
            self.patch_embeddings = nn.Conv2d(
                in_channels, hidden_size, kernel_size=patch_size,
                stride=patch_size)
            n = (img_size // patch_size) ** 2
            self.position_embeddings = nn.Parameter(
                torch.zeros(1, n, hidden_size))
            self.dropout = nn.Dropout(dropout_rate)

        def forward(self, x):
            x = self.patch_embeddings(x).flatten(2).transpose(1, 2)
            return self.dropout(x + self.position_embeddings)

    patchembedding.PatchEmbeddingBlock = PatchEmbeddingBlock
    blocks.patchembedding = patchembedding
    networks.blocks = blocks
    monai.networks = networks
    sys.modules["monai"] = monai
    sys.modules["monai.networks"] = networks
    sys.modules["monai.networks.blocks"] = blocks
    sys.modules["monai.networks.blocks.patchembedding"] = patchembedding


def import_reference(argv):
    """(Re)import reference control/config + dataset modules with the given
    CLI argv. Returns the reference package namespace dict."""
    sys.modules.setdefault("pickle5", pickle)
    _install_stub_torchvision()
    _install_stub_monai()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # reference config parses sys.argv at import time; reset module state
    for mod in list(sys.modules):
        if mod.startswith(("control", "builder")):
            del sys.modules[mod]
    old_argv = sys.argv
    sys.argv = ["ref"] + list(argv)
    try:
        import torch
        from control.config import args  # noqa: F401
        import builder.data.dataset_new as dataset_new
        import builder.utils.utils as ref_utils
        # runtime-injected fields (reference data_preprocess.py:43,80-84)
        args.feature_mins = torch.Tensor(
            [0.0, 0.0, 25.0, 0.0, 0.0, 0.0, 9.0, 0.0, 5.0,
             0.0, 0.0, 0.94, 2.0, 0.0, 0.0, 0.8, 67.0, 0.2])
        args.feature_maxs = torch.Tensor(
            [295.0, 120.0, 43.05555555556, 299.0, 298.0, 100.0, 15.0, 68.6,
             1000.0, 100.0, 75.0, 9.38, 50.0, 20.0, 20.0, 14.7, 185.0, 531.3])
        args.vslt_mask = [name not in args.vitalsign_labtest
                          for name in dataset_new.VITALSIGN_LABTEST]
        return {"args": args, "dataset_new": dataset_new, "utils": ref_utils}
    finally:
        sys.argv = old_argv
