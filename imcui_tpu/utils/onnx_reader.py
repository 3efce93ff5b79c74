"""Minimal ONNX weight extraction — no ``onnx`` package required.

OmniGlue ships its pretrained weights as ONNX graphs
(reference: imcui/hloc/matchers/omniglue.py:29-40 runs them through
onnxruntime). This environment has neither onnx nor onnxruntime, but the
weights themselves are just protobuf ``TensorProto`` initializers inside
``ModelProto.graph`` — a few hundred lines of varint/field parsing
recovers them as a flat ``{name: np.ndarray}`` dict that feeds the same
torch→JAX conversion engine as every .pth checkpoint
(utils/weights.convert_state_dict_auto).

Wire-format subset implemented (onnx.proto3):
- ModelProto: field 7 = graph (GraphProto)
- GraphProto: field 5 = initializer (repeated TensorProto); nested
  subgraphs inside node attributes are NOT walked (OmniGlue's graphs
  keep all weights top-level)
- TensorProto: 1 dims (int64, packed or not), 2 data_type, 8 name,
  9 raw_data, 4 float_data, 5 int32_data, 7 int64_data, 10 double_data
External/segmented tensors raise (not silently skipped).
"""

import struct

import numpy as np

# onnx TensorProto.DataType → numpy dtype
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}
_BF16 = 16


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long (corrupt ONNX file)")


def _iter_fields(buf, start=0, end=None):
    """Yield (field_number, wire_type, value, value_span) tuples.
    For wire type 2 the value is a (start, end) span into buf."""
    pos = start
    end = len(buf) if end is None else end
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == 1:
            yield field, wire, buf[pos:pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, wire, (pos, pos + ln)
            pos += ln
        elif wire == 5:
            yield field, wire, buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_tensor(buf, start, end):
    dims = []
    dtype_id = 1
    name = ""
    raw = None
    typed = None
    for field, wire, val in _iter_fields(buf, start, end):
        if field == 1:  # dims
            if wire == 0:
                dims.append(val)
            else:  # packed
                s, e = val
                pos = s
                while pos < e:
                    d, pos = _read_varint(buf, pos)
                    dims.append(d)
        elif field == 2 and wire == 0:
            dtype_id = val
        elif field == 8 and wire == 2:
            s, e = val
            name = bytes(buf[s:e]).decode("utf-8")
        elif field == 9 and wire == 2:
            s, e = val
            raw = bytes(buf[s:e])
        elif field == 4 and wire == 2:      # packed float_data
            s, e = val
            typed = np.frombuffer(buf[s:e], dtype="<f4")
        elif field == 4 and wire == 5:
            typed = np.concatenate([
                np.frombuffer(val, dtype="<f4")
                if typed is None else typed,
                np.frombuffer(val, dtype="<f4")]) \
                if typed is not None else np.frombuffer(val, dtype="<f4")
        elif field == 10 and wire == 2:     # packed double_data
            s, e = val
            typed = np.frombuffer(buf[s:e], dtype="<f8")
        elif field in (5, 7) and wire == 2:  # packed int32/int64 varints
            s, e = val
            out = []
            pos = s
            while pos < e:
                v, pos = _read_varint(buf, pos)
                out.append(v)
            typed = np.asarray(out, dtype=np.int64)
        elif field == 13:
            raise ValueError(
                f"ONNX tensor {name or '<unnamed>'} uses external data"
                " — not supported by the minimal reader")

    if dtype_id == _BF16:
        if raw is None:
            raise ValueError(f"bfloat16 tensor {name} without raw_data")
        u16 = np.frombuffer(raw, dtype="<u2").astype(np.uint32) << 16
        arr = u16.view(np.float32) if u16.flags.owndata else \
            np.ascontiguousarray(u16).view(np.float32)
    elif raw is not None:
        dt = _DTYPES.get(dtype_id)
        if dt is None:
            raise ValueError(f"unsupported ONNX dtype {dtype_id} ({name})")
        arr = np.frombuffer(raw, dtype=np.dtype(dt).newbyteorder("<"))
    elif typed is not None:
        arr = typed.astype(_DTYPES.get(dtype_id, np.float32))
    else:
        arr = np.zeros(0, np.float32)
    return name, arr.reshape(dims) if dims else arr.reshape(())


def read_onnx_initializers(path):
    """Parse an .onnx file → flat {initializer_name: np.ndarray}."""
    buf = memoryview(open(path, "rb").read())
    out = {}
    for field, wire, val in _iter_fields(buf):
        if field == 7 and wire == 2:                   # ModelProto.graph
            gs, ge = val
            for gf, gw, gv in _iter_fields(buf, gs, ge):
                if gf == 5 and gw == 2:                # initializer
                    name, arr = _parse_tensor(buf, *gv)
                    out[name] = arr
    return out


def onnx_to_state_dict(path, rename=()):
    """Read ONNX initializers and canonicalise names into the dotted
    torch-style convention the auto-converter consumes. ONNX exporters
    name tensors like ``model/kenc/encoder/Conv_1/W:0`` or keep torch
    names verbatim; ``rename`` (regex, repl) pairs map graph-specific
    prefixes. Slashes and ':0' suffixes are normalised to dots/removed."""
    import re

    sd = {}
    for name, arr in read_onnx_initializers(path).items():
        k = name.replace("/", ".").strip(".")
        k = re.sub(r":\d+$", "", k)
        for pattern, repl in rename:
            k = re.sub(pattern, repl, k)
        sd[k] = arr
    return sd
