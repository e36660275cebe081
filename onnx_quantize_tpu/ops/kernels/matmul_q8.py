"""Pallas kernel module (matmul_q8) — implemented in the kernel phase."""
