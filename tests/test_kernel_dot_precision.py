"""Every dot_general inside a Pallas kernel module must pin `precision`.

The package forces ``jax_default_matmul_precision=highest`` at import (the
r5 groundtruth-precision fix, vaq_tpu/__init__.py). That global default
reaches any ``lax.dot_general`` traced WITHOUT an explicit ``precision``
— including dots inside Pallas kernels — and Mosaic rejects fp32 contract
precision on bf16/int8 operands at hardware compile time:

    Mosaic failed to compile TPU kernel: Bad lhs type
      tpu.matmul ... precision = #tpu.contract_precision<fp32>
      (vector<256x128xbf16>, vector<128x128xbf16>) -> vector<256x128xf32>

(hit live on the 100M d=96 probe compile, round 5). CPU interpret-mode
tests cannot see this — interpret never lowers through Mosaic — so this
test pins the contract at the source level: every ``dot_general`` call in
the kernel modules must pass ``precision=`` explicitly (DEFAULT for
bf16/int8 operands, HIGHEST for the f32 norm accumulations).
"""
import ast
import os

import pytest

KERNEL_MODULES = ["scan_pallas.py", "probe_pallas.py", "rescore_pallas.py"]
OPS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "vaq_tpu", "ops")


def _dot_general_calls(tree):
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            fn = node.func
            name = fn.attr if isinstance(fn, ast.Attribute) else (
                fn.id if isinstance(fn, ast.Name) else None)
            if name == "dot_general":
                yield node


@pytest.mark.parametrize("fname", KERNEL_MODULES)
def test_every_kernel_dot_pins_precision(fname):
    path = os.path.join(OPS_DIR, fname)
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    missing = [
        node.lineno for node in _dot_general_calls(tree)
        if not any(kw.arg == "precision" for kw in node.keywords)
    ]
    assert not missing, (
        f"{fname}:{missing}: dot_general without explicit precision= — "
        "the global jax_default_matmul_precision=highest would trace fp32 "
        "contract precision onto it, which Mosaic rejects on bf16/int8 "
        "operands (see module docstring)")
