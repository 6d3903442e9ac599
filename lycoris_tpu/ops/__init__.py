"""lycoris_tpu.ops — fused Pallas TPU kernels for the hot adapter math."""
