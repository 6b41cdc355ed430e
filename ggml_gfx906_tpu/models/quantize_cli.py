"""Model quantization CLI — the `gpt-2-quantize` / common-ggml analogue.

ref: examples/common-ggml.cpp:41 ggml_common_quantize_0 (per-tensor loop:
2-D matmul weights → target type, everything else passes through; prints
per-tensor stats and the size reduction) + examples/gpt-2/quantize.cpp.

    python -m ggml_gfx906_tpu.models.quantize_cli in.gguf out.gguf q4_K
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..gguf import GGUFReader, GGUFWriter
from ..quant import GGMLType, TYPE_TRAITS, quantize_to_bytes
from .convert import QUANT_PATTERNS
import re


def quantize_gguf(src_path, dst_path, ftype: GGMLType, verbose: bool = True):
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
            raw = quantize_to_bytes(ftype, data)
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
    ap.add_argument("type", help="target type: " + ", ".join(
        t.name.lower() for t in
        [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
         GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
         GGMLType.Q5_K, GGMLType.Q6_K]))
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
    quantize_gguf(args.src, args.dst, ftype, verbose=not args.quiet)
    return 0


if __name__ == "__main__":
    sys.exit(main())
