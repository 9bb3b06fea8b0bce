"""Pallas TPU kernels: flash attention (segment ids + GQA), RMSNorm, CE loss."""
