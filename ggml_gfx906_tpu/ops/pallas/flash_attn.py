"""Flash-attention Pallas kernel (placeholder gate until the kernel lands).

The XLA reference path in ops/attention.py is used whenever `supported`
returns False.
"""
from __future__ import annotations


def supported(q, k, v, mask, max_bias, logit_softcap, sinks) -> bool:
    return False


def flash_attention(q, k, v, mask, scale, logit_softcap):
    raise NotImplementedError
