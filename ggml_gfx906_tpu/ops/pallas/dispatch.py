"""Dispatch kernel-layout QuantTensors to the fused Pallas matmuls."""
from __future__ import annotations

from ...quant.types import GGMLType
from . import qmm

KERNEL_TYPES = {GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.Q4_0,
                GGMLType.Q6_K, GGMLType.Q5_K}


def matmul(x, qt):
    """x (..., K) @ qt(N, K).T → (..., N) f32 via the fused kernel.
    qt must be in kernel layout."""
    if qt.layout != "kernel":
        raise ValueError(f"expected kernel-layout QuantTensor, got {qt.layout}")
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    f = qt.fields
    if qt.qtype == GGMLType.Q4_K:
        out = qmm.qmm_q4_K(x2, f["qs"], f["dsclo"], f["dschi"],
                           f["dmlo"], f["dmhi"])
    elif qt.qtype == GGMLType.Q8_0:
        out = qmm.qmm_q8_0(x2, f["qs"], f["d"])
    elif qt.qtype == GGMLType.Q4_0:
        out = qmm.qmm_q4_0(x2, f["qs"], f["d"])
    elif qt.qtype == GGMLType.Q6_K:
        out = qmm.qmm_q6_K(x2, f["qs"], f["dsc"])
    elif qt.qtype == GGMLType.Q5_K:
        out = qmm.qmm_q5_K(x2, f["qs"], f["dsc"], f["dm"])
    else:
        raise KeyError(qt.qtype)
    return out.reshape(*lead, qt.shape[0])
