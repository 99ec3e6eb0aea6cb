"""Measure the reference's flagship train step on this host (torch CPU).

Runs the ACTUAL reference model — ``TRI_MBT_VSLTCLS`` executed as-is from
/root/reference (via tests/ref_shim.py's functional torchvision/monai
stand-ins) — through the reference's training arithmetic (BCEWithLogits ->
backward -> AdamW step) on synthetic batch-64 tensors with the BASELINE.json
shapes (TIE 1000, d=256, 6 fusion layers, frozen Swin-T 224, BioBERT
128x768 text).

This is the only reference denominator measurable in this environment (no
CUDA for the reference, no published numbers — BASELINE.md). The result is
written to BASELINE_TORCH.json with provenance and read by bench.py for its
``vs_baseline`` field, clearly labeled as a torch-CPU-on-this-host number.

Pretrained swin weights cannot be downloaded here; a shape-correct random
state dict is installed instead (weight VALUES don't affect speed).
"""
from __future__ import annotations

import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 64
WARMUP = 1
ITERS = 3

ARGV = [
    "--input-types", "vslt_img_txt",
    "--output-type", "intubation",
    "--modality-inclusion", "train-missing_test-missing",
    "--model", "tri_mbt_vsltcls",
    "--batch-size", str(BATCH),
    "--vslt-type", "TIE",
    "--TIE-len", "1000",
    "--transformer-num-layers", "6",
    "--transformer-dim", "256",
    "--transformer-num-head", "4",
    "--img-model-type", "swin",
    "--img-pretrain", "No",
    "--imgtxt-time", "1",
    "--train-data-path", "/root/reference/data/sample_data/train",
    "--test-data-path", "/root/reference/data/sample_data/test",
]


def main() -> None:
    from ref_shim import import_reference

    ref = import_reference(ARGV)
    args = ref["args"]

    import torch
    torch.manual_seed(0)
    args.device = torch.device("cpu")

    # install a shape-correct fake pretrained state dict (no network here)
    import builder.models.src.swin_transformer as ref_swin
    def fake_state_dict(progress=True):
        m = ref_swin.SwinTransformer(
            patch_size=[4, 4], embed_dim=96, depths=[2, 2, 6, 2],
            num_heads=[3, 6, 12, 24], window_size=[7, 7],
            stochastic_depth_prob=0.2, num_classes=1000)
        return m.state_dict()
    ref_swin.Swin_T_Weights.IMAGENET1K_V1.get_state_dict = fake_state_dict

    mod = importlib.import_module(
        "builder.models.8_missing_models.tri_mbt_vsltcls")
    model = mod.TRI_MBT_VSLTCLS(args)
    model.train()

    optimizer = torch.optim.AdamW(model.parameters(), lr=1e-5,
                                  weight_decay=args.weight_decay)
    criterion = torch.nn.BCEWithLogitsLoss()

    g = torch.Generator().manual_seed(0)
    x = torch.rand(BATCH, args.TIE_len, 3, generator=g)
    x[:, :, 2] = torch.randint(0, 18, (BATCH, args.TIE_len), generator=g).float()
    age = torch.rand(BATCH)
    gen = torch.randint(0, 2, (BATCH,), generator=g).float()
    input_lengths = torch.randint(100, args.TIE_len, (BATCH,), generator=g)
    txts = torch.rand(BATCH, 128, 768, generator=g)
    txt_lengths = torch.randint(4, 126, (BATCH,), generator=g)
    img = torch.rand(BATCH, 1, 224, 224, generator=g)
    missing_num = torch.randint(0, 4, (BATCH,), generator=g)
    img_time = torch.rand(BATCH)
    txt_time = torch.rand(BATCH)
    target = torch.randint(0, 2, (BATCH,), generator=g).float()

    def step() -> float:
        optimizer.zero_grad()
        out1, _out2, _out3 = model(
            x, None, None, None, None, age, gen, input_lengths, txts,
            txt_lengths, img, missing_num, None, img_time, txt_time,
            "train", None, None)
        loss = criterion(out1.squeeze(), target)
        loss.backward()
        optimizer.step()
        return float(loss.detach())

    for _ in range(WARMUP):
        step()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        step()
    dt = time.perf_counter() - t0

    samples_per_sec = BATCH * ITERS / dt
    payload = {
        "samples_per_sec": round(samples_per_sec, 2),
        "ms_per_step": round(1000 * dt / ITERS, 1),
        "batch": BATCH,
        "iters": ITERS,
        "torch_threads": torch.get_num_threads(),
        "provenance": (
            "reference TRI_MBT_VSLTCLS executed as-is from /root/reference "
            "(torch CPU fp32, this host) — fwd+bwd+AdamW at batch 64, TIE "
            "1000, d=256, 6 layers, frozen Swin-T. The reference's CUDA "
            "target is not available in this environment and the repo "
            "publishes no throughput numbers (SURVEY.md §6)."),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "BASELINE_TORCH.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
