"""TPU-native fingerprint biometric framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
``GiovanniIacuzzo/multimodal_biometric_fingerprints_palms`` (see SURVEY.md):

- catalog / dataset management (PolyU HRF DBII + NIST filename schemas)
- classical enhancement chain (normalize, CLAHE, denoise, segment, Sauvola
  binarization, orientation field, anisotropic smoothing, skeletonization)
  as batched, jit-fused image ops over (B, H, W) tensors
- crossing-number minutiae extraction with quality scoring + adaptive NMS
- RANSAC rigid-transform matching as vmapped on-device hypothesis batches
- FRR/FAR/ROC/EER evaluation, sharded 1:N identification over a device mesh
- SSL (SimCLR-style) embedding model + KMeans/agglomerative clustering
- optional UNet++ segmentation model

The design replaces the reference's file-per-image, thread-pool CPU dataflow
with fixed-shape batched tensors resident in HBM; files remain only at
pipeline boundaries, where the catalog CSV and minutiae JSON schemas stay
bit-compatible with the reference
(src/catalog/prepare_catalog.py:95-105, src/features/extract_features.py:104-105).
"""

__version__ = "0.1.0"
