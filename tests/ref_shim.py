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

    # ---- transform pieces the reference data pipeline actually calls ----
    # (public torchvision semantics reimplemented on PIL/torch so the
    # reference dataset code runs as-is for golden end-to-end runs; the
    # deterministic eval stacks — Resize/CenterCrop/ToTensor/equalize —
    # are exact, the random train ops are faithful analogs)
    from PIL import Image, ImageOps

    class Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class Resize:
        """torchvision Resize: int -> shorter edge = size, longer edge
        int-truncated; (h, w) -> exact. Bilinear."""
        def __init__(self, size, *a, **k):
            self.size = size

        def __call__(self, img):
            if isinstance(self.size, (tuple, list)):
                h, w = self.size
                return img.resize((w, h), Image.BILINEAR)
            size = self.size
            w, h = img.size
            if w <= h:
                if w == size:
                    return img
                nw, nh = size, max(1, int(size * h / w))
            else:
                if h == size:
                    return img
                nh, nw = size, max(1, int(size * w / h))
            return img.resize((nw, nh), Image.BILINEAR)

    class CenterCrop:
        def __init__(self, size):
            self.size = (size, size) if isinstance(size, int) else tuple(size)

        def __call__(self, img):
            ch, cw = self.size
            w, h = img.size
            if w < cw or h < ch:
                canvas = Image.new(img.mode, (max(w, cw), max(h, ch)), 0)
                canvas.paste(img, ((canvas.size[0] - w) // 2,
                                   (canvas.size[1] - h) // 2))
                img, (w, h) = canvas, canvas.size
            left = int(round((w - cw) / 2.0))
            top = int(round((h - ch) / 2.0))
            return img.crop((left, top, left + cw, top + ch))

    class ToTensor:
        def __call__(self, img):
            import numpy as np
            arr = np.asarray(img, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[None]
            else:
                arr = arr.transpose(2, 0, 1)
            return torch.from_numpy(arr.copy())

    class RandomResizedCrop:
        def __init__(self, size, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3), **k):
            self.size, self.scale, self.ratio = size, scale, ratio

        def __call__(self, img):
            import math
            import random as pyrandom
            w, h = img.size
            area = w * h
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            for _ in range(10):
                target_area = area * pyrandom.uniform(*self.scale)
                aspect = math.exp(pyrandom.uniform(*log_ratio))
                cw = int(round(math.sqrt(target_area * aspect)))
                ch = int(round(math.sqrt(target_area / aspect)))
                if 0 < cw <= w and 0 < ch <= h:
                    left = pyrandom.randint(0, w - cw)
                    top = pyrandom.randint(0, h - ch)
                    return img.crop((left, top, left + cw, top + ch)).resize(
                        (self.size, self.size), Image.BILINEAR)
            return img.resize((self.size, self.size), Image.BILINEAR)

    class RandomAffine:
        def __init__(self, degrees=0, translate=None, scale=None, shear=0, **k):
            self.degrees, self.translate, self.scale = degrees, translate, scale

        def __call__(self, img):
            import math
            import random as pyrandom
            angle = math.radians(pyrandom.uniform(-self.degrees, self.degrees))
            s = pyrandom.uniform(*self.scale) if self.scale else 1.0
            w, h = img.size
            tx = (pyrandom.uniform(-self.translate[0], self.translate[0]) * w
                  if self.translate else 0.0)
            ty = (pyrandom.uniform(-self.translate[1], self.translate[1]) * h
                  if self.translate else 0.0)
            cx, cy = w * 0.5, h * 0.5
            cos_a, sin_a = math.cos(angle) / s, math.sin(angle) / s
            a, b = cos_a, sin_a
            c = cx - a * (cx + tx) - b * (cy + ty)
            d, e = -sin_a, cos_a
            f = cy - d * (cx + tx) - e * (cy + ty)
            return img.transform((w, h), Image.AFFINE, (a, b, c, d, e, f),
                                 Image.BILINEAR)

    transforms.Compose = Compose
    transforms.Resize = Resize
    transforms.CenterCrop = CenterCrop
    transforms.ToTensor = ToTensor
    transforms.RandomResizedCrop = RandomResizedCrop
    transforms.RandomAffine = RandomAffine
    for name in ["RandAugment", "Normalize"]:
        setattr(transforms, name, _Dummy)
    functional.equalize = lambda x: (ImageOps.equalize(x)
                                     if isinstance(x, Image.Image) else x)
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
    utils_mod.make_grid = lambda t, *a, **k: t  # logger.py:25 imports it

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


def _install_stub_torchmetrics():
    """torchmetrics isn't installed; the reference Evaluator
    (builder/utils/metrics.py:20-22) uses binary AUROC / AveragePrecision /
    F1Score whose math equals the sklearn equivalents — back the stub with
    those so the reference's own metric path executes unmodified."""
    if "torchmetrics" in sys.modules:
        return
    import numpy as np
    import torch
    from sklearn.metrics import (average_precision_score, f1_score as _sk_f1,
                                 roc_auc_score)

    def _np(t):
        return np.asarray(t.detach().cpu(), dtype=np.float64).reshape(-1)

    class _Binary:
        def __init__(self, *a, task="binary", **k):
            pass

        def __call__(self, preds, target):
            raise NotImplementedError

    class AUROC(_Binary):
        def __call__(self, preds, target):
            return torch.tensor(roc_auc_score(_np(target), _np(preds)))

    class AveragePrecision(_Binary):
        def __call__(self, preds, target):
            return torch.tensor(
                average_precision_score(_np(target), _np(preds)))

    class F1Score(_Binary):
        def __call__(self, preds, target):
            return torch.tensor(
                _sk_f1(_np(target), (_np(preds) >= 0.5).astype(int)))

    class ROC(_Binary):
        pass

    def f1_score(preds, target, task="binary", threshold=0.5):
        return torch.tensor(
            _sk_f1(_np(target), (_np(preds) >= threshold).astype(int)))

    tm = types.ModuleType("torchmetrics")
    tm.AUROC, tm.AveragePrecision, tm.ROC, tm.F1Score = (
        AUROC, AveragePrecision, ROC, F1Score)
    cls_mod = types.ModuleType("torchmetrics.classification")
    for name in ("MulticlassAUROC", "MulticlassAveragePrecision",
                 "MulticlassF1Score"):
        setattr(cls_mod, name, _Binary)
    fn_mod = types.ModuleType("torchmetrics.functional")
    fn_mod.f1_score = f1_score
    tm.classification = cls_mod
    tm.functional = fn_mod
    sys.modules["torchmetrics"] = tm
    sys.modules["torchmetrics.classification"] = cls_mod
    sys.modules["torchmetrics.functional"] = fn_mod


def patch_torch_for_cpu_run():
    """Patches that let the reference's CUDA-assuming train/eval flow
    (hard ``.cuda()`` calls, HalfTensor input casts under GPU autocast —
    builder/trainer/trainer.py:77,122; 2_train.py:164) execute on CPU
    torch. HalfTensor becomes FloatTensor: CPU has no autocast to remarry
    half inputs with fp32 weights, and golden runs compare fp32-vs-fp32."""
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.HalfTensor = torch.FloatTensor
    torch.autograd.set_detect_anomaly = lambda *a, **k: None
    # torch>=2.6 defaults weights_only=True, rejecting the numpy scalars the
    # reference pickles into its own checkpoints (2_train.py:312 loads a
    # ckpt this very run just wrote)
    _load = torch.load

    def _load_unsafe(*a, **k):
        k.setdefault("weights_only", False)
        return _load(*a, **k)

    torch.load = _load_unsafe


def import_reference(argv):
    """(Re)import reference control/config + dataset modules with the given
    CLI argv. Returns the reference package namespace dict."""
    sys.modules.setdefault("pickle5", pickle)
    _install_stub_torchvision()
    _install_stub_monai()
    _install_stub_torchmetrics()
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
