"""Validate the GUI wire against the PUBLISHED reference JS client.

The point of speaking the reference's protobuf CommandList wire
(dart/proto/GUI.proto) is that the reference's 21k-LoC TypeScript client
(javascript/src/NimbleRemote.ts, prebuilt as
python/nimblephysics/web_gui/bundle.js) just works against this server.
No JS engine ships in this environment, so instead of executing the
bundle these tests extract the client's ACTUAL decode/dispatch tables
from the prebuilt bundle source and hold our encoder to them:

  1. the generated `Command` deserializer switch in the bundle
     (`case <field>: t.readMessage(r.<member>, ...)`) must agree with
     every (member, field-number) pair our encoder emits;
  2. every command kind we emit must be dispatched by the client's
     handleCommand (`null != e.<member>` guards in NimbleRemote);
  3. a full-scene frame from our GUIStateMachine must decode cleanly and
     only ever use members the client handles.

The live-render proof (real bundle.js in a browser against our
websocket server) is documented in benchmarks/README.md; it cannot run
headless here (no JS runtime), so these source-extraction checks are the
CI gate pinning us to the published client.
"""

from __future__ import annotations

import os
import re

import pytest

from nimblephysics_tpu.server.gui_proto import (
    CMD_FIELD,
    ONEOF_MEMBER,
    KeyCodes,
    decode_command_list,
    encode_command,
    encode_command_list,
)
from nimblephysics_tpu.server.state_machine import GUIStateMachine

BUNDLE = "/root/reference/python/nimblephysics/web_gui/bundle.js"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BUNDLE),
    reason="reference prebuilt web_gui bundle not available",
)


def _bundle_src() -> str:
    with open(BUNDLE, "r", encoding="utf-8", errors="replace") as f:
        return f.read()


def _client_decode_pairs(src: str):
    """(member, field) pairs from generated deserializer switches."""
    return set(
        (m.group(2), int(m.group(1)))
        for m in re.finditer(
            r"case (\d+):\w+\.readMessage\(\w+\.(\w+),", src
        )
    )


def _client_handled_members(src: str):
    """Members NimbleRemote.handleCommand dispatches on."""
    return set(m.group(1) for m in re.finditer(r"null!=e\.(\w+)", src))


def _all_command_dicts():
    """One internal command dict of every wire kind our server can emit."""
    return [
        dict(type="create_layer", key="lay", name="lay", color=[1, 0, 0, 1]),
        dict(type="create_box", key="b", size=[1, 1, 1], layer="lay"),
        dict(type="create_sphere", key="s", radius=0.3),
        dict(type="create_capsule", key="c", radius=0.1, length=0.8),
        dict(type="create_cone", key="cn", radius=0.1, height=0.4),
        dict(type="create_cylinder", key="cy", radius=0.1, height=0.4),
        dict(type="create_line", key="l", points=[[0, 0, 0], [1, 1, 1]]),
        dict(type="create_mesh", key="m", verts=[[0, 0, 0], [1, 0, 0],
                                                 [0, 1, 0]],
             faces=[[0, 1, 2]]),
        dict(type="create_texture", key="tx", base64="aGk="),
        dict(type="set_pos", key="b", pos=[1, 2, 3]),
        dict(type="set_euler", key="b", euler=[0.1, 0.2, 0.3]),
        dict(type="set_color", key="b", color=[0, 1, 0, 1]),
        dict(type="set_scale", key="b", scale=[2, 2, 2]),
        dict(type="set_object_tooltip", key="b", tooltip="hello"),
        dict(type="delete_object_tooltip", key="b"),
        dict(type="enable_edit_tooltip", key="b"),
        dict(type="enable_drag", key="b"),
        dict(type="set_object_warning", key="b", warning="bad contact",
             warning_key="w1", layer="lay"),
        dict(type="delete_object_warning", key="b", warning_key="w1"),
        dict(type="set_span_warning", start_timestep=3, end_timestep=9,
             warning_key="w2", warning="span", layer="lay"),
        dict(type="create_text", key="t", contents="hi"),
        dict(type="set_text", key="t", contents="bye"),
        dict(type="create_button", key="btn", label="go"),
        dict(type="set_button_label", key="btn", label="stop"),
        dict(type="create_slider", key="sl", pos=(10, 90), size=(150, 30),
             min=0.0, max=2.0, value=1.0),
        dict(type="set_slider_value", key="sl", value=1.5),
        dict(type="set_slider_min", key="sl", value=0.5),
        dict(type="set_slider_max", key="sl", value=3.0),
        dict(type="create_plot", key="p", pos=(10, 130), size=(200, 100),
             bounds=(0, 1, 0, 1), xs=[0, 1], ys=[0, 1]),
        dict(type="set_plot_data", key="p", bounds=(0, 1, 0, 2),
             xs=[0, 1], ys=[0, 2]),
        dict(type="create_rich_plot", key="rp", pos=(10, 130),
             size=(300, 200), bounds=(0, 1, 0, 1), title="T"),
        dict(type="set_rich_plot_data", key="rp", name="a", color="blue",
             plot_type="line", xs=[0, 1], ys=[1, 0]),
        dict(type="set_rich_plot_bounds", key="rp", bounds=(0, 2, 0, 2)),
        dict(type="set_ui_elem_pos", key="btn", pos=(5, 5)),
        dict(type="set_ui_elem_size", key="btn", size=(50, 20)),
        dict(type="set_frames_per_second", fps=90),
        dict(type="delete", key="s"),
        dict(type="delete_ui", key="t"),
        dict(type="clear_all"),
    ]


def test_every_wire_kind_has_an_encoder():
    keys = KeyCodes()
    kinds = set()
    for cmd in _all_command_dicts():
        enc = encode_command(cmd, keys)
        assert enc is not None, f"no encoder for {cmd['type']}"
        frame = encode_command_list([cmd], KeyCodes())
        (kind, _fields), = decode_command_list(frame)
        kinds.add(kind)
    # The full GUI.proto Command oneof (39 members) is covered.
    assert kinds == set(CMD_FIELD), sorted(set(CMD_FIELD) - kinds)


def test_field_numbers_match_client_deserializer():
    """Our Command oneof numbers == the bundle's decode switch."""
    pairs = _client_decode_pairs(_bundle_src())
    members = set(p[0] for p in pairs)
    for internal, field in CMD_FIELD.items():
        member = ONEOF_MEMBER[internal]
        # `command` (CommandList.command=1) aside, every member the
        # client knows appears in some readMessage switch with its field
        # number; ours must agree exactly.
        assert member in members, f"client never decodes {member}"
        assert (member, field) in pairs, (
            f"client decodes {member} at a different field number than "
            f"our {field}"
        )


def test_client_handles_everything_we_emit():
    handled = _client_handled_members(_bundle_src())
    for internal in CMD_FIELD:
        member = ONEOF_MEMBER[internal]
        assert member in handled, (
            f"published client's handleCommand ignores {member}"
        )


def test_full_scene_frame_decodes_with_client_known_members():
    gui = GUIStateMachine()
    gui.create_layer("lay")
    gui.create_box("b", size=[1, 1, 1], pos=[0, 0, 1], layer="lay")
    gui.create_sphere("s", 0.2)
    gui.set_object_tooltip("b", "a box")
    gui.set_object_warning("b", "deep penetration", "w1", layer="lay")
    gui.set_object_drag_enabled("b")
    gui.set_object_tooltip_editable("b")
    gui.create_button("btn", "run")
    gui.set_button_label("btn", "pause")
    gui.create_slider("sl", (10, 90), (150, 30), 0.0, 2.0, 1.0)
    gui.set_slider_min("sl", 0.25)
    gui.set_slider_max("sl", 4.0)
    gui.set_span_warning(0, 10, "w2", "bad span")
    gui.set_frames_per_second(120)

    handled = _client_handled_members(_bundle_src())
    keys = KeyCodes()
    frame = encode_command_list(gui.flush_commands(), keys)
    decoded = decode_command_list(frame)
    assert len(decoded) >= 14
    for kind, _fields in decoded:
        assert ONEOF_MEMBER[kind] in handled

    # Late joiners get the same annotations from the retained scene.
    replay = encode_command_list(gui.full_state_commands(), KeyCodes())
    replay_kinds = [k for k, _ in decode_command_list(replay)]
    for expected in ("set_object_tooltip", "set_object_warning",
                     "enable_drag", "enable_edit_tooltip",
                     "set_span_warning", "set_frames_per_second"):
        assert expected in replay_kinds, expected
