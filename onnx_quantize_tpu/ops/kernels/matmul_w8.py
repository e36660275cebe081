"""Pallas kernel module (matmul_w8) — implemented in the kernel phase."""
