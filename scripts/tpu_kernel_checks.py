"""On-TPU validation of kernel paths the CPU interpreter cannot emulate
(the fused-attention dropout PRNG). Run: python scripts/tpu_kernel_checks.py"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import pytest

if jax.default_backend() != "tpu":
    raise SystemExit("needs real TPU")

raise SystemExit(pytest.main([
    os.path.join(os.path.dirname(__file__), "..", "tests", "test_fused_attention.py"),
    "-v", "-x",
]))
