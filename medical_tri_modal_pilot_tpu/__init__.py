"""medical_tri_modal_pilot_tpu — a TPU-native (JAX/Flax/Pallas/pjit) framework
with the capabilities of AITRICS/Medical_Tri_Modal_Pilot.

Trains clinical early-warning models (mortality / vasopressor / intubation /
CPR within N hours) from up to three modalities per ICU stay:

1. ``vslt`` — irregularly-sampled vital-sign + lab time series embedded as
   carry-forward grids or TIE/QIE triplet streams (UMSE).
2. ``img``  — chest X-ray JPEGs through a Swin-T/ViT encoder.
3. ``txt``  — clinical notes as BioBERT embeddings or integer tokens.

Fusion is a Modality-Aware Bottleneck Transformer (MBT); missing modalities
select which modality subsets' bottleneck averages propagate per sample.

Reference behavior: /root/reference (PyTorch, single GPU). This package is a
ground-up TPU redesign: static shapes, one-hot (not gather) missing-modality
mixing, Pallas fused attention, data-parallel pjit over a device mesh.
"""

__version__ = "0.1.0"
