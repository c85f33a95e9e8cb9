"""Minimal protobuf wire-format reader for Objectron ``.pbdata`` sequences.

The reference imports generated bindings from the Objectron vendor repo
(``objectron.schema.annotation_data_pb2``, used in
/root/reference/annotation_converters/objectron_helpers.py:14).  That
submodule is not vendored here, so this module decodes the wire format
directly with a tiny declarative schema covering exactly the fields the
converter and evaluator consume.  Field numbers follow the public Objectron
schema (annotation_data.proto / object.proto).

Wire format essentials: each field is (tag = field_number << 3 | wire_type)
varint, then  0 = varint, 1 = fixed64, 2 = length-delimited, 5 = fixed32.
"""

import struct

__all__ = ['parse_sequence', 'decode_message']


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


def _skip(buf, pos, wire_type):
    if wire_type == 0:
        _, pos = _read_varint(buf, pos)
    elif wire_type == 1:
        pos += 8
    elif wire_type == 2:
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire_type == 5:
        pos += 4
    else:
        raise ValueError(f'unsupported wire type {wire_type}')
    return pos


def decode_message(buf, schema):
    """Decode one message given {field_number: (name, kind, sub)} where kind
    ∈ {'varint','float','double','string','message','packed_float'} and
    names ending in '[]' collect into lists."""
    out = {}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field = tag >> 3
        wire = tag & 7
        spec = schema.get(field)
        if spec is None:
            pos = _skip(buf, pos, wire)
            continue
        name, kind, sub = spec
        repeated = name.endswith('[]')
        key = name[:-2] if repeated else name
        if kind == 'varint':
            val, pos = _read_varint(buf, pos)
        elif kind == 'float':
            if wire == 5:
                val = struct.unpack_from('<f', buf, pos)[0]
                pos += 4
            else:  # packed
                ln, pos = _read_varint(buf, pos)
                val = list(struct.unpack_from(f'<{ln // 4}f', buf, pos))
                pos += ln
                out.setdefault(key, []).extend(val) if repeated else None
                if repeated:
                    continue
        elif kind == 'double':
            if wire == 1:
                val = struct.unpack_from('<d', buf, pos)[0]
                pos += 8
            else:
                ln, pos = _read_varint(buf, pos)
                val = list(struct.unpack_from(f'<{ln // 8}d', buf, pos))
                pos += ln
                if repeated:
                    out.setdefault(key, []).extend(val)
                    continue
        elif kind == 'string':
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln].decode('utf-8', errors='replace')
            pos += ln
        elif kind == 'message':
            ln, pos = _read_varint(buf, pos)
            val = decode_message(buf[pos:pos + ln], sub)
            pos += ln
        else:
            raise ValueError(kind)
        if repeated:
            out.setdefault(key, []).append(val)
        else:
            out[key] = val
    return out


# ---- Objectron schema subset (public annotation_data.proto / object.proto)

POINT3D = {1: ('x', 'float', None), 2: ('y', 'float', None),
           3: ('z', 'float', None)}
POINT2D = {1: ('x', 'float', None), 2: ('y', 'float', None),
           3: ('depth', 'float', None)}

ANNOTATED_KEYPOINT = {
    1: ('id', 'varint', None),
    2: ('point_3d', 'message', POINT3D),
    3: ('point_2d', 'message', POINT2D),
}

OBJECT_ANNOTATION = {
    1: ('object_id', 'varint', None),
    2: ('keypoints[]', 'message', ANNOTATED_KEYPOINT),
    3: ('visibility', 'float', None),
}

VIEW_MATRIX = {1: ('transform[]', 'float', None)}

AR_CAMERA = {
    1: ('transform[]', 'float', None),          # 4x4 row-major pose
    2: ('projection_matrix[]', 'float', None),
    3: ('view_matrix[]', 'float', None),
    4: ('intrinsics[]', 'float', None),
    5: ('image_resolution_width', 'varint', None),
    6: ('image_resolution_height', 'varint', None),
}

FRAME_ANNOTATION = {
    1: ('frame_id', 'varint', None),
    2: ('annotations[]', 'message', OBJECT_ANNOTATION),
    3: ('camera', 'message', AR_CAMERA),
    4: ('timestamp', 'double', None),
}

OBJECT = {
    1: ('id', 'varint', None),
    2: ('category', 'string', None),
    3: ('type', 'varint', None),
    4: ('keypoints[]', 'message', POINT3D),
    5: ('rotation[]', 'float', None),
    6: ('translation[]', 'float', None),
    7: ('scale[]', 'float', None),
}

SEQUENCE = {
    1: ('objects[]', 'message', OBJECT),
    2: ('frame_annotations[]', 'message', FRAME_ANNOTATION),
}


def parse_sequence(data: bytes):
    """Objectron .pbdata bytes → nested dict per SEQUENCE schema."""
    return decode_message(data, SEQUENCE)
