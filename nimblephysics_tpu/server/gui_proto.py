"""Protobuf `dart.proto.CommandList` wire codec for the GUI stream.

Reference wire parity: the reference server serializes GUI state as
proto3 `CommandList` frames (dart/proto/GUI.proto; filled in
GUIStateMachine.cpp:46-80 and broadcast by GUIWebsocketServer), which the
published JS client (javascript/src/NimbleRemote.ts / NimbleStandalone)
decodes. This module hand-rolls the proto3 wire format (same technique as
biomechanics/b3d_writer.py — no protobuf runtime needed) with the exact
field numbers from GUI.proto, so the reference's npm client can render
this engine's scenes.

Internal commands (the JSON dicts queued by server/state_machine.py) are
translated to proto Commands; string object keys map to stable int codes
(reference: GUIStateMachine::getStringCode, GUIStateMachine.hpp:459).

A schema-driven decoder is included for round-trip tests and for parsing
frames recorded from the reference server.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# proto3 wire primitives
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _string(field: int, s: str) -> bytes:
    return _len_delim(field, s.encode("utf-8"))


def _packed_floats(field: int, vals) -> bytes:
    if vals is None or len(vals) == 0:
        return b""
    return _len_delim(
        field, b"".join(struct.pack("<f", float(v)) for v in vals)
    )


def _packed_int32(field: int, vals) -> bytes:
    if vals is None or len(vals) == 0:
        return b""
    return _len_delim(field, b"".join(_varint(int(v)) for v in vals))


def _int32(field: int, v: int) -> bytes:
    if int(v) == 0:
        return b""  # proto3 default elision
    return _tag(field, 0) + _varint(int(v))


def _bool(field: int, v: bool) -> bytes:
    if not v:
        return b""
    return _tag(field, 0) + _varint(1)


def _float(field: int, v: float) -> bytes:
    if float(v) == 0.0:
        return b""
    return _tag(field, 5) + struct.pack("<f", float(v))


# ---------------------------------------------------------------------------
# Command encoding (field numbers from dart/proto/GUI.proto)
# ---------------------------------------------------------------------------

# Command oneof field numbers (GUI.proto `message Command`).
CMD_FIELD = {
    "set_frames_per_second": 31,
    "clear_all": 16,
    "layer": 1,
    "create_box": 2,
    "create_sphere": 9,
    "create_cone": 36,
    "create_cylinder": 35,
    "create_capsule": 10,
    "create_line": 11,
    "create_mesh": 3,
    "create_texture": 4,
    "set_pos": 5,
    "set_euler": 6,
    "set_color": 7,
    "set_scale": 8,
    "set_object_tooltip": 32,
    "delete_object_tooltip": 33,
    "set_span_warning": 38,
    "set_object_warning": 37,
    "delete_object_warning": 39,
    "enable_drag": 18,
    "enable_edit_tooltip": 34,
    "create_text": 12,
    "set_text": 23,
    "create_button": 13,
    "create_slider": 14,
    "create_plot": 15,
    "delete": 22,
    "delete_ui": 21,
    "set_button_label": 24,
    "set_slider_value": 25,
    "set_slider_min": 26,
    "set_slider_max": 27,
    "set_plot_data": 28,
    "create_rich_plot": 29,
    "set_rich_plot_data": 17,
    "set_rich_plot_bounds": 30,
    "set_ui_elem_pos": 19,
    "set_ui_elem_size": 20,
}

# CMD_FIELD key -> GUI.proto `Command` oneof member name. Where the names
# differ it is because our internal JSON command types predate the wire
# codec; the wire uses exactly the reference's member names (GUI.proto:
# 11-50), which are also the property names the published JS client's
# handleCommand dispatch reads (javascript/src/NimbleRemote.ts).
ONEOF_MEMBER = {
    "layer": "layer",
    "create_box": "box",
    "create_sphere": "sphere",
    "create_cone": "cone",
    "create_cylinder": "cylinder",
    "create_capsule": "capsule",
    "create_line": "line",
    "create_mesh": "mesh",
    "create_texture": "texture",
    "set_pos": "set_object_position",
    "set_euler": "set_object_rotation",
    "set_color": "set_object_color",
    "set_scale": "set_object_scale",
    "create_text": "text",
    "set_text": "set_text_contents",
    "create_button": "button",
    "create_slider": "slider",
    "create_plot": "plot",
    "delete": "delete_object",
    "delete_ui": "delete_ui_elem",
    "create_rich_plot": "rich_plot",
}
ONEOF_MEMBER.update(
    {k: k for k in CMD_FIELD if k not in ONEOF_MEMBER}
)


class KeyCodes:
    """String key -> stable int code (GUIStateMachine::getStringCode)."""

    def __init__(self):
        self._codes: Dict[str, int] = {}

    def code(self, key: str) -> int:
        if key not in self._codes:
            self._codes[key] = len(self._codes) + 1
        return self._codes[key]


def _shape_data(cmd: dict, lead: List[float]) -> List[float]:
    """size/pos/euler/color concatenated `data` vector (proto comment:
    'Concatenates size, pos, euler, and color into a single vector')."""
    return (
        list(lead)
        + list(cmd.get("pos", (0, 0, 0)))
        + list(cmd.get("euler", (0, 0, 0)))
        + list(cmd.get("color", (0.5, 0.5, 0.5, 1.0)))
    )


def encode_command(cmd: dict, keys: KeyCodes) -> Optional[bytes]:
    """One internal JSON command dict -> serialized proto `Command`.

    Returns None for commands with no wire counterpart (private viewer
    extensions like request_screenshot stay on the JSON channel).
    """
    t = cmd.get("type")
    k = keys.code(cmd["key"]) if "key" in cmd else 0
    # Layer references are string keys mapped through the same code table
    # (reference: getStringCode); empty/absent layer elides to proto 0.
    lcode = keys.code(cmd["layer"]) if cmd.get("layer") else 0

    def obj(payload: bytes, field: str) -> bytes:
        return _len_delim(CMD_FIELD[field], payload)

    if t == "create_box":
        sz = list(cmd.get("size", (1, 1, 1)))
        payload = _int32(1, k) + _packed_floats(2, _shape_data(cmd, sz))
        payload += _int32(3, lcode)
        payload += _bool(4, True) + _bool(5, True)
        return obj(payload, "create_box")
    if t == "create_sphere":
        payload = _int32(1, k) + _packed_floats(
            2, _shape_data(cmd, [float(cmd.get("radius", 0.5))])
        )
        payload += _int32(3, lcode)
        payload += _bool(4, True) + _bool(5, True)
        return obj(payload, "create_sphere")
    if t in ("create_cone", "create_cylinder"):
        lead = [float(cmd.get("radius", 0.1)), float(cmd.get("height", 1.0))]
        payload = _int32(1, k) + _packed_floats(2, _shape_data(cmd, lead))
        payload += _int32(3, lcode)
        payload += _bool(4, True) + _bool(5, True)
        return obj(payload, t)
    if t == "set_plot_data":
        payload = _int32(1, k)
        payload += _packed_floats(4, cmd.get("bounds", (0, 1, 0, 1)))
        payload += _packed_floats(5, cmd.get("xs", ()))
        payload += _packed_floats(6, cmd.get("ys", ()))
        return obj(payload, "set_plot_data")
    if t == "create_capsule":
        lead = [float(cmd.get("radius", 0.1)), float(cmd.get("length", 1.0))]
        payload = _int32(1, k) + _packed_floats(2, _shape_data(cmd, lead))
        payload += _int32(3, lcode)
        payload += _bool(4, True) + _bool(5, True)
        return obj(payload, "create_capsule")
    if t == "create_plane":
        # The reference wire has no plane primitive (renderWorld emits a
        # large flat box for ground planes); mirror that.
        n = list(cmd.get("normal", (0, 0, 1)))
        size = [20.0, 20.0, 0.01] if abs(n[2]) >= abs(n[0]) else [0.01, 20.0, 20.0]
        box_cmd = dict(cmd, type="create_box", size=size)
        return encode_command(box_cmd, keys)
    if t == "create_line":
        pts: List[float] = []
        for p in cmd.get("points", []):
            pts += list(p)
        payload = _int32(1, k) + _packed_floats(2, pts)
        payload += _packed_floats(3, cmd.get("color", (1, 0.5, 0.5, 1)))
        payload += _int32(4, lcode)
        return obj(payload, "create_line")
    if t == "create_mesh":
        verts: List[float] = []
        for v in cmd.get("verts", []):
            verts += list(v)
        faces: List[int] = []
        for f in cmd.get("faces", []):
            faces += [int(i) for i in f]
        payload = _int32(1, k) + _packed_floats(2, verts)
        payload += _packed_int32(4, faces)
        payload += _packed_floats(
            8, _shape_data(cmd, list(cmd.get("scale", (1, 1, 1))))
        )
        payload += _int32(9, lcode)
        payload += _bool(10, True) + _bool(11, True)
        return obj(payload, "create_mesh")
    if t == "set_pos":
        return obj(
            _int32(1, k) + _packed_floats(2, cmd.get("pos", (0, 0, 0))),
            "set_pos",
        )
    if t == "set_euler":
        return obj(
            _int32(1, k) + _packed_floats(2, cmd.get("euler", (0, 0, 0))),
            "set_euler",
        )
    if t == "set_color":
        return obj(
            _int32(1, k) + _packed_floats(2, cmd.get("color", (1, 1, 1, 1))),
            "set_color",
        )
    if t == "set_scale":
        return obj(
            _int32(1, k) + _packed_floats(2, cmd.get("scale", (1, 1, 1))),
            "set_scale",
        )
    if t == "set_frames_per_second":
        return obj(
            _int32(1, int(cmd.get("fps", 60))), "set_frames_per_second"
        )
    if t == "clear_all":
        # ClearAll{bool dummy=1}: encode dummy=true so the message is
        # non-empty on the wire.
        return obj(_bool(1, True), "clear_all")
    if t == "create_layer":
        payload = _int32(1, k)
        payload += _string(2, cmd.get("name", ""))
        payload += _packed_floats(3, cmd.get("color", (1, 1, 1, 1)))
        payload += _bool(4, bool(cmd.get("default_show", True)))
        return obj(payload, "layer")
    if t == "delete":
        return obj(_int32(1, k), "delete")
    if t == "set_object_tooltip":
        return obj(
            _int32(1, k) + _string(2, cmd.get("tooltip", "")),
            "set_object_tooltip",
        )
    if t == "delete_object_tooltip":
        return obj(_int32(1, k), "delete_object_tooltip")
    if t == "set_span_warning":
        payload = _int32(1, int(cmd.get("start_timestep", 0)))
        payload += _int32(2, int(cmd.get("end_timestep", 0)))
        payload += _int32(3, keys.code(cmd.get("warning_key", "")))
        payload += _string(4, cmd.get("warning", ""))
        payload += _int32(5, lcode)
        return obj(payload, "set_span_warning")
    if t == "set_object_warning":
        payload = _int32(1, k)
        payload += _string(2, cmd.get("warning", ""))
        payload += _int32(3, keys.code(cmd.get("warning_key", "")))
        payload += _int32(4, lcode)
        return obj(payload, "set_object_warning")
    if t == "delete_object_warning":
        payload = _int32(1, k)
        payload += _int32(2, keys.code(cmd.get("warning_key", "")))
        return obj(payload, "delete_object_warning")
    if t == "enable_drag":
        return obj(_int32(1, k), "enable_drag")
    if t == "enable_edit_tooltip":
        return obj(_int32(1, k), "enable_edit_tooltip")
    if t == "set_button_label":
        return obj(
            _int32(1, k) + _string(2, cmd.get("label", "")),
            "set_button_label",
        )
    if t == "set_slider_value":
        return obj(
            _int32(1, k) + _float(2, cmd.get("value", 0.0)),
            "set_slider_value",
        )
    if t == "set_slider_min":
        return obj(
            _int32(1, k) + _float(2, cmd.get("value", 0.0)), "set_slider_min"
        )
    if t == "set_slider_max":
        return obj(
            _int32(1, k) + _float(2, cmd.get("value", 0.0)), "set_slider_max"
        )
    if t == "create_text":
        payload = _int32(1, k)
        payload += _packed_int32(
            3, list(cmd.get("pos", (10, 10))) + list(cmd.get("size", (200, 30)))
        )
        payload += _string(4, cmd.get("contents", ""))
        return obj(payload, "create_text")
    if t == "set_text":
        return obj(
            _int32(1, k) + _string(2, cmd.get("contents", "")), "set_text"
        )
    if t == "create_button":
        payload = _int32(1, k)
        payload += _packed_int32(
            3, list(cmd.get("pos", (10, 50))) + list(cmd.get("size", (100, 30)))
        )
        payload += _string(4, cmd.get("label", ""))
        return obj(payload, "create_button")
    if t == "create_slider":
        payload = _int32(1, k)
        payload += _packed_int32(
            3, list(cmd.get("pos", (10, 90))) + list(cmd.get("size", (150, 30)))
        )
        payload += _packed_floats(
            4,
            [
                float(cmd.get("min", 0.0)),
                float(cmd.get("max", 1.0)),
                float(cmd.get("value", 0.0)),
            ],
        )
        payload += _bool(6, True)  # horizontal
        return obj(payload, "create_slider")
    if t == "create_plot":
        payload = _int32(1, k)
        payload += _packed_int32(
            3, list(cmd.get("pos", (10, 130))) + list(cmd.get("size", (200, 100)))
        )
        payload += _packed_floats(4, cmd.get("bounds", (0, 1, 0, 1)))
        payload += _packed_floats(5, cmd.get("xs", ()))
        payload += _packed_floats(6, cmd.get("ys", ()))
        payload += _string(7, cmd.get("plot_type", "line"))
        return obj(payload, "create_plot")
    if t == "create_rich_plot":
        # GUI.proto CreateRichPlot: pos = 4 ints (from-top-left ++ size),
        # bounds = [minX, maxX, minY, maxY].
        payload = _int32(1, k)
        payload += _packed_int32(
            3, list(cmd.get("pos", (10, 130))) + list(cmd.get("size", (300, 200)))
        )
        payload += _packed_floats(4, cmd.get("bounds", (0, 1, 0, 1)))
        payload += _string(5, cmd.get("title", ""))
        payload += _string(6, cmd.get("x_axis_label", ""))
        payload += _string(7, cmd.get("y_axis_label", ""))
        return obj(payload, "create_rich_plot")
    if t == "set_rich_plot_data":
        payload = _int32(1, k)
        payload += _string(2, cmd.get("name", ""))
        payload += _string(3, cmd.get("color", ""))
        payload += _string(4, cmd.get("plot_type", "line"))
        payload += _packed_floats(6, cmd.get("xs", ()))
        payload += _packed_floats(7, cmd.get("ys", ()))
        return obj(payload, "set_rich_plot_data")
    if t == "set_rich_plot_bounds":
        payload = _int32(1, k)
        payload += _packed_floats(4, cmd.get("bounds", (0, 1, 0, 1)))
        return obj(payload, "set_rich_plot_bounds")
    if t == "create_texture":
        payload = _int32(1, k) + _string(2, cmd.get("base64", ""))
        return obj(payload, "create_texture")
    if t == "set_ui_elem_pos":
        payload = _int32(1, k) + _packed_int32(2, cmd.get("pos", (0, 0)))
        return obj(payload, "set_ui_elem_pos")
    if t == "set_ui_elem_size":
        payload = _int32(1, k) + _packed_int32(2, cmd.get("size", (0, 0)))
        return obj(payload, "set_ui_elem_size")
    if t == "delete_ui":
        return obj(_int32(1, k), "delete_ui")
    return None


def encode_command_list(cmds: List[dict], keys: KeyCodes) -> bytes:
    """Internal command dicts -> serialized proto `CommandList` frame."""
    out = bytearray()
    for c in cmds:
        enc = encode_command(c, keys)
        if enc is not None:
            out += _len_delim(1, enc)  # CommandList.command = 1
    return bytes(out)


# ---------------------------------------------------------------------------
# Schema-driven decoder (for tests / reading reference recordings)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def _decode_fields(buf: bytes) -> Dict[int, list]:
    """Raw field map: field number -> list of (wire_type, value)."""
    out: Dict[int, list] = {}
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wire == 5:
            v = struct.unpack("<f", buf[i : i + 4])[0]
            i += 4
        elif wire == 1:
            v = struct.unpack("<d", buf[i : i + 8])[0]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        out.setdefault(field, []).append((wire, v))
    return out


def unpack_floats(raw: bytes) -> List[float]:
    return [
        struct.unpack("<f", raw[i : i + 4])[0] for i in range(0, len(raw), 4)
    ]


def unpack_int32s(raw: bytes) -> List[int]:
    out = []
    i = 0
    while i < len(raw):
        v, i = _read_varint(raw, i)
        out.append(v)
    return out


_CMD_NAME = {v: k for k, v in CMD_FIELD.items()}


def decode_command_list(frame: bytes) -> List[Tuple[str, Dict[int, list]]]:
    """Frame -> [(command_kind, raw field map of the submessage)]."""
    out = []
    for wire, sub in _decode_fields(frame).get(1, []):
        assert wire == 2
        fields = _decode_fields(sub)
        (fnum, entries), = fields.items()
        kind = _CMD_NAME.get(fnum, f"field_{fnum}")
        out.append((kind, _decode_fields(entries[0][1])))
    return out
