"""Offline conversion: torchvision swin_t / vit_b_16 state_dict (.pth)
-> flax encoder weights consumable via --img-pretrain-path.

The reference freezes an ImageNet/chx-pretrained torchvision encoder
(tri_mbt_vsltcls.py:95-100). On a machine with torchvision, export it:

    import torch, torchvision
    m = torchvision.models.swin_t(weights="IMAGENET1K_V1")
    torch.save(m.state_dict(), "swin_t_imagenet.pth")

then convert here (no torchvision needed, only CPU torch):

    python tools/convert_torchvision.py --arch swin_t \
        --state-dict swin_t_imagenet.pth --out swin_t_flax.pkl

and train with `--img-pretrain-path swin_t_flax.pkl`.
"""
from __future__ import annotations

import argparse
import pickle
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", choices=["swin_t", "vit_b_16"], required=True)
    ap.add_argument("--state-dict", required=True,
                    help=".pth file holding the torchvision state_dict")
    ap.add_argument("--out", required=True, help="output .pkl")
    ap.add_argument("--in-channels", type=int, default=1, choices=[1, 3])
    ap.add_argument("--depths", type=int, nargs="+", default=[2, 2, 6, 2],
                    help="stage depths (swin_t default)")
    args = ap.parse_args(argv)

    import torch

    from medical_tri_modal_pilot_tpu.models.convert import (convert_swin_t,
                                                            convert_vit_b_16)

    sd = torch.load(args.state_dict, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    if args.arch == "swin_t":
        params = convert_swin_t(sd, in_channels=args.in_channels,
                                depths=tuple(args.depths))
    else:
        params = convert_vit_b_16(sd, in_channels=args.in_channels)
    with open(args.out, "wb") as f:
        pickle.dump({"arch": args.arch, "params": params}, f,
                    pickle.HIGHEST_PROTOCOL)
    print(f"wrote {args.out} ({args.arch}, in_channels={args.in_channels})")


if __name__ == "__main__":
    main()
