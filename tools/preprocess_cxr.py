"""Offline CXR preprocessing: DICOM/JPEG -> grayscale 224x224 JPEG
(reference 1_mimic_cxr_preprocess.py:17-88: shorter edge to 256, center
crop 224, grayscale), fanned out over a process pool
(builder/utils/process_util.py:17-29 analog).

Usage:
  python tools/preprocess_cxr.py --src <dcm_or_jpg_root> --dst <out_root> \
      [--workers 30] [--size 224] [--resize-to 256]
"""
from __future__ import annotations

import argparse
import os
import sys

from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from medical_tri_modal_pilot_tpu.utils.process_util import run_multi_process


def _load(path: str):
    if path.endswith(".dcm"):
        try:
            import pydicom  # optional: not baked into this image
        except ImportError as e:
            raise RuntimeError(
                "pydicom is required for DICOM inputs; convert to jpg first"
            ) from e
        dcm = pydicom.dcmread(path)
        return Image.fromarray(dcm.pixel_array)
    return Image.open(path)


def process_one(task):
    src_path, dst_path, size, resize_to = task
    if os.path.exists(dst_path):
        return "skip"
    try:
        img = _load(src_path)
    except Exception:
        return f"io-error {src_path}"
    w, h = img.size
    if w <= h:
        new = (resize_to, max(1, round(resize_to * h / w)))
    else:
        new = (max(1, round(resize_to * w / h)), resize_to)
    img = img.resize(new, Image.BILINEAR)
    left = (img.size[0] - size) // 2
    top = (img.size[1] - size) // 2
    img = img.crop((left, top, left + size, top + size)).convert("L")
    os.makedirs(os.path.dirname(dst_path), exist_ok=True)
    img.save(dst_path)
    return "ok"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--workers", type=int, default=30)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--resize-to", type=int, default=256)
    args = p.parse_args(argv)

    tasks = []
    for root, _dirs, files in os.walk(args.src):
        for fn in files:
            ext = os.path.splitext(fn)[-1].lower()
            if ext in (".dcm", ".jpg", ".jpeg", ".png"):
                src_path = os.path.join(root, fn)
                rel = os.path.relpath(src_path, args.src)
                dst_path = os.path.join(
                    args.dst, os.path.splitext(rel)[0] + ".jpg")
                tasks.append((src_path, dst_path, args.size, args.resize_to))
    results = run_multi_process(process_one, tasks, n_processes=args.workers)
    ok = sum(1 for r in results if r == "ok")
    print(f"{ok}/{len(tasks)} images written to {args.dst}")


if __name__ == "__main__":
    main()
