"""Dispatch kernel-layout QuantTensors to the fused Pallas matmuls."""
from __future__ import annotations

from ...quant.types import GGMLType
from ...utils import config
from . import qmm

KERNEL_TYPES = {GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.Q4_0,
                GGMLType.Q6_K, GGMLType.Q5_K, GGMLType.Q4_1,
                GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q2_K,
                GGMLType.Q3_K}

# integer-MXU (int8×int8→int32) prefill kernels — the reference's mmq/V_DOT
# analogue (src/ggml-cuda/mmq.cu, quantize.cu). Decode (small M) stays on
# the f32-expand kernels: it is HBM-bound and the int8 path's extra
# activation-quantize work buys nothing there. Threshold knob:
# config "int8_min_m" / env GGML_TPU_INT8_MIN_M (0 disables).
INT8_TYPES = {GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.Q4_0}

# decode matvecs through the manual-DMA pipelined kernels (single grid
# step, wire-density streaming — see qmm.py "manual-pipeline decode").
# config "qmm_pipeline": on/auto (TPU m==1 matvecs) | off (default —
# measured 0.46x the int8-XLA path end-to-end on the tunnel runtime,
# docs/PERFORMANCE.md; per-call it already ties at 1.7x fewer bytes).
PIPELINE_TYPES = {GGMLType.Q4_K}


def _use_pipeline(m: int, qt) -> bool:
    mode = config.get("qmm_pipeline")
    if mode == "off" or qt.qtype not in PIPELINE_TYPES:
        return False
    if qmm._FORCE_INTERPRET[0]:
        return False          # conformance CPU-oracle leg: outer-grid path
    import jax

    if mode == "auto" and jax.default_backend() != "tpu":
        return False
    n, k = qt.shape
    return m == 1 and n % 128 == 0 and k % 256 == 0 and n >= 256


def matmul(x, qt):
    """x (..., K) @ qt(N, K).T → (..., N) f32 via the fused kernel.
    qt must be in kernel layout."""
    if qt.layout != "kernel":
        raise ValueError(f"expected kernel-layout QuantTensor, got {qt.layout}")
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    f = qt.fields
    min_m = config.get("int8_min_m")
    if _use_pipeline(x2.shape[0], qt):
        out = qmm.qmm_q4_K_pipelined(x2, f["qs"], f["scm"], f["dd"])
        return out.reshape(*lead, qt.shape[0])
    if (qt.qtype in INT8_TYPES and min_m > 0 and x2.shape[0] >= min_m):
        if qt.qtype == GGMLType.Q4_K:
            out = qmm.qmm_q4_K_i8(x2, f["qs"], f["scm"], f["dd"])
        elif qt.qtype == GGMLType.Q8_0:
            out = qmm.qmm_q8_0_i8(x2, f["qs"], f["d"])
        else:
            out = qmm.qmm_q4_0_i8(x2, f["qs"], f["d"])
        return out.reshape(*lead, qt.shape[0])
    if qt.qtype == GGMLType.Q4_K:
        out = qmm.qmm_q4_K(x2, f["qs"], f["scm"], f["dd"])
    elif qt.qtype == GGMLType.Q8_0:
        out = qmm.qmm_q8_0(x2, f["qs"], f["d"])
    elif qt.qtype == GGMLType.Q4_0:
        out = qmm.qmm_q4_0(x2, f["qs"], f["d"])
    elif qt.qtype == GGMLType.Q6_K:
        out = qmm.qmm_q6_K(x2, f["ql"], f["qh"], f["sc"], f["dq"])
    elif qt.qtype == GGMLType.Q5_K:
        out = qmm.qmm_q5_K(x2, f["ql"], f["qh"], f["scm"], f["d"],
                           f["dmin"])
    elif qt.qtype == GGMLType.Q4_1:
        out = qmm.qmm_q4_1(x2, f["qs"], f["d"], f["m"])
    elif qt.qtype == GGMLType.Q5_0:
        out = qmm.qmm_q5_0(x2, f["qs"], f["qh"], f["d"])
    elif qt.qtype == GGMLType.Q5_1:
        out = qmm.qmm_q5_1(x2, f["qs"], f["qh"], f["d"], f["m"])
    elif qt.qtype == GGMLType.Q2_K:
        out = qmm.qmm_q2_K(x2, f["qs"], f["scm"], f["dq"], f["dm"])
    elif qt.qtype == GGMLType.Q3_K:
        out = qmm.qmm_q3_K(x2, f["qs"], f["hm"], f["sc"], f["dq"])
    else:
        raise KeyError(qt.qtype)
    return out.reshape(*lead, qt.shape[0])
