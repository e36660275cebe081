"""Pallas kernel module (matmul_w4) — implemented in the kernel phase."""
