"""Device (TPU) kernels: limb-plane field arithmetic, curve ops, MSM, NTT.

This package is the TPU-native replacement for everything the reference
delegates to arkworks (SURVEY.md §2.3): prime fields, G1 group ops, MSM,
FFT/IFFT and batch inversion, re-designed as batched JAX/XLA programs over
16x16-bit limb planes rather than serial bigint code.
"""
