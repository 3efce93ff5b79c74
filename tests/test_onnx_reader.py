"""utils/onnx_reader: synthetic ONNX-file round-trip (VERDICT r2 #7).

Hand-encodes a ModelProto (protobuf wire format, no onnx package) with
raw_data, typed float_data, packed dims, int64 and float16 tensors, then
asserts the reader recovers every initializer bit-exactly."""

import struct

import numpy as np

from imcui_tpu.utils.onnx_reader import (onnx_to_state_dict,
                                         read_onnx_initializers)


def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num, wire, payload):
    tag = _varint((num << 3) | wire)
    if wire == 2:
        return tag + _varint(len(payload)) + payload
    return tag + payload


def _tensor(name, arr, use_raw=True):
    body = b""
    for d in arr.shape:
        body += _field(1, 0, _varint(d))
    dtype_id = {np.float32: 1, np.int64: 7, np.float16: 10}[arr.dtype.type]
    body += _field(2, 0, _varint(dtype_id))
    body += _field(8, 2, name.encode())
    if use_raw:
        body += _field(9, 2, arr.astype(arr.dtype.newbyteorder("<"))
                       .tobytes())
    elif arr.dtype == np.float32:
        body += _field(4, 2, arr.astype("<f4").tobytes())
    else:  # packed varint int64
        body += _field(7, 2, b"".join(_varint(int(v))
                                      for v in arr.reshape(-1)))
    return body


def _model(tensors):
    graph = b"".join(_field(5, 2, t) for t in tensors)
    # add a node field the reader must skip (field 1, empty NodeProto)
    graph = _field(1, 2, b"") + graph
    model = _field(1, 0, _varint(8))          # ir_version
    model += _field(7, 2, graph)
    return model


def test_onnx_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "model/kenc/Conv_W:0": rng.normal(size=(8, 3, 1, 1))
        .astype(np.float32),
        "gnn.layers.0.weight": rng.normal(size=(4, 6)).astype(np.float32),
        "shape_info": np.asarray([3, 128, 64], np.int64),
        "half_bias": rng.normal(size=(5,)).astype(np.float16),
    }
    body = [_tensor("model/kenc/Conv_W:0", tensors["model/kenc/Conv_W:0"]),
            _tensor("gnn.layers.0.weight", tensors["gnn.layers.0.weight"],
                    use_raw=False),
            _tensor("shape_info", tensors["shape_info"], use_raw=False),
            _tensor("half_bias", tensors["half_bias"])]
    path = tmp_path / "synthetic.onnx"
    path.write_bytes(_model(body))

    got = read_onnx_initializers(path)
    assert set(got) == set(tensors)
    for k, v in tensors.items():
        np.testing.assert_array_equal(got[k], v, err_msg=k)

    sd = onnx_to_state_dict(path, rename=((r"^model\.", ""),))
    assert "kenc.Conv_W" in sd
    assert "gnn.layers.0.weight" in sd
