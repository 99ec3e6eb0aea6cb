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
    tv = types.ModuleType("torchvision")
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
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def import_reference(argv):
    """(Re)import reference control/config + dataset modules with the given
    CLI argv. Returns the reference package namespace dict."""
    sys.modules.setdefault("pickle5", pickle)
    _install_stub_torchvision()
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
