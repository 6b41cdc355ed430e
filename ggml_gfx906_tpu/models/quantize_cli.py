"""Model quantization CLI — the `gpt-2-quantize` / common-ggml analogue.

ref: examples/common-ggml.cpp:41 ggml_common_quantize_0 (per-tensor loop:
2-D matmul weights → target type, everything else passes through; prints
per-tensor stats and the size reduction) + examples/gpt-2/quantize.cpp;
imatrix-aware quantization mirrors ggml_quantize_chunk's quant_weights
argument (include/ggml.h:2406-2416 — REQUIRED for IQ2_XXS/XS and
IQ1_S/M; collect one with models/imatrix.py).

    python -m ggml_gfx906_tpu.models.quantize_cli in.gguf out.gguf q4_K
    python -m ggml_gfx906_tpu.models.quantize_cli in.gguf out.gguf iq2_xxs \
        --imatrix cal.imatrix.npz
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..gguf import GGUFReader, GGUFWriter
from ..quant import GGMLType, TYPE_TRAITS
from ..quant.registry import (
    _QUANTIZE_IMATRIX, quantize, supported_quant_types)
from .convert import QUANT_PATTERNS
import re

# formats whose reference quantizer asserts on a missing imatrix
IMATRIX_REQUIRED = {GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ1_S}


def quantize_gguf(src_path, dst_path, ftype: GGMLType, verbose: bool = True,
                  imatrix: dict | None = None):
    r = GGUFReader(src_path)
    w = GGUFWriter(alignment=r.alignment)
    for key, value in r.kv.items():
        if key == "general.alignment":
            continue
        w.set(key, value, r.kv_types[key])
    w.set("general.file_type", int(ftype))

    total_in = total_out = 0
    for name, ti in r.tensors.items():
        t0 = time.time()
        eligible = (ti.type in (GGMLType.F32, GGMLType.F16) and len(ti.ne) == 2
                    and any(re.fullmatch(p, name) for p in QUANT_PATTERNS)
                    and ti.ne[0] % TYPE_TRAITS[ftype].blck_size == 0)
        if eligible:
            data = r.tensor_float(name).astype(np.float32)
            qw = imatrix.get(name) if imatrix else None
            if ftype in IMATRIX_REQUIRED and qw is None:
                raise ValueError(
                    f"{TYPE_TRAITS[ftype].name} requires an imatrix entry "
                    f"for {name!r} (--imatrix, models/imatrix.py)")
            if qw is not None and ftype not in _QUANTIZE_IMATRIX:
                qw = None          # type has no imatrix-aware path
            raw = np.ascontiguousarray(
                quantize(ftype, data, qw)).tobytes()
            out_type = ftype
        else:
            raw = np.ascontiguousarray(r.tensor_bytes(name)).tobytes()
            out_type = ti.type
        w.add_tensor(name, ti.ne, out_type, raw)
        total_in += ti.n_bytes
        total_out += len(raw)
        if verbose:
            tag = f"→ {TYPE_TRAITS[out_type].name}" if eligible else "(copy)"
            print(f"  {name:40s} {str(ti.shape):>16s} "
                  f"{ti.n_bytes/1e6:8.2f} MB {tag} ({time.time()-t0:.1f}s)",
                  file=sys.stderr)
    w.write(dst_path)
    if verbose:
        print(f"total: {total_in/1e6:.1f} MB → {total_out/1e6:.1f} MB "
              f"({100*total_out/max(total_in,1):.1f}%)", file=sys.stderr)
    return total_in, total_out


def main(argv=None):
    ap = argparse.ArgumentParser(description="Quantize a GGUF model")
    ap.add_argument("src")
    ap.add_argument("dst")
    all_types = sorted(set(supported_quant_types()) | set(_QUANTIZE_IMATRIX))
    ap.add_argument("type", help="target type: " + ", ".join(
        t.name.lower() for t in all_types))
    ap.add_argument("--imatrix", help="importance matrix .npz "
                    "(models/imatrix.py output; required for "
                    + ", ".join(t.name.lower() for t in IMATRIX_REQUIRED)
                    + ")")
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)
    try:
        ftype = GGMLType[args.type.upper()]
    except KeyError:
        print(f"error: unknown type {args.type!r}", file=sys.stderr)
        return 1
    if not TYPE_TRAITS[ftype].is_quantized:
        print(f"error: {args.type} is not a quantized type", file=sys.stderr)
        return 1
    im = dict(np.load(args.imatrix)) if args.imatrix else None
    quantize_gguf(args.src, args.dst, ftype, verbose=not args.quiet,
                  imatrix=im)
    return 0


if __name__ == "__main__":
    sys.exit(main())
