"""Motion Analysis Cortex SDK wire protocol: codec + UDP client/server.

Reference parity: dart/biomechanics/CortexStreaming.{hpp,cpp} (and the
packet layout of dart/external/cortex/cortex_intern.h). The reference
speaks the Cortex SDK's UDP protocol — a 4-byte packet header
(uint16 iCommand, uint16 nBytes, both little-endian) followed by a
C-struct payload — over two sockets: a multicast data stream
(FRAME_OF_DATA / BODYDEFS broadcasts, port 1001) and a request/response
channel (port 1510). This module implements the same byte-level format in
pure Python:

  * `encode_*` / `parse_*` — the codec, byte-compatible with
    CortexStreaming.cpp createBodyDefsPacket:516 /
    createFrameOfDataPacket:615 / parseBodyDefs:1053 /
    parseFrameOfData:1330 / parseAnalogData:1598;
  * `CortexClient` — connect()/initialize() + frame-handler callbacks
    (CortexStreaming::connect/setFrameHandler parity);
  * `CortexMockServer` — the reference's startMockServer()/
    mockServerSetData() testing server, answering HELLO_WORLD with
    HERE_I_AM, REQUEST_BODYDEFS with BODYDEFS, REQUEST_FRAME with
    FRAME_OF_DATA, and multicasting frames.

Missing markers travel as XEMPTY (9999999.0f, cortex.h:60) and are
surfaced as NaN, exactly like the reference.
"""

from __future__ import annotations

import dataclasses
import socket
import struct
import threading
from typing import Callable, List, Optional, Tuple

import numpy as np

# Packet commands (dart/external/cortex/cortex_intern.h:25-43).
PKT2_HELLO_WORLD = 0
PKT2_ARE_YOU_THERE = 1
PKT2_HERE_I_AM = 2
PKT2_COMMENT = 3
PKT2_REQUEST_BODYDEFS = 10
PKT2_BODYDEFS = 11
PKT2_REQUEST_FRAME = 12
PKT2_FRAME_OF_DATA = 13
PKT2_GENERAL_REQUEST = 14
PKT2_GENERAL_REPLY = 15
PKT2_UNRECOGNIZED_REQUEST = 16

XEMPTY = 9999999.0  # cortex.h:60 — "no data" marker coordinate

# ProgramID, Major, Minor, Bugfix (CortexStreaming.hpp:225-226).
VERSION_NUMBER = bytes((4, 1, 12, 0))


@dataclasses.dataclass
class CortexBodyDef:
    """One tracked body's definition (CortexStreaming.hpp:22-31)."""

    name: str
    marker_names: List[str] = dataclasses.field(default_factory=list)
    segment_names: List[str] = dataclasses.field(default_factory=list)
    segment_parents: List[int] = dataclasses.field(default_factory=list)
    dof_names: List[str] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class CortexBodyDefs:
    """The BODYDEFS payload (CortexStreaming.hpp:33-39)."""

    body_defs: List[CortexBodyDef] = dataclasses.field(default_factory=list)
    analog_channel_names: List[str] = dataclasses.field(default_factory=list)
    num_force_plates: int = 0


@dataclasses.dataclass
class CortexBodyData:
    """One body's data in a frame (CortexStreaming.hpp:41-62)."""

    name: str
    markers: np.ndarray  # (M, 3) float, NaN = unobserved
    marker_names: List[str] = dataclasses.field(default_factory=list)
    dofs: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )


@dataclasses.dataclass
class CortexAnalogData:
    """Analog + force-plate samples (CortexStreaming.hpp:64-78).

    plate_cop_torque_force rows follow the reference's 9-column layout
    [cop(3), moment(3), force(3)] with only moment-z on the wire
    (parseAnalogData, CortexStreaming.cpp:1664-1688)."""

    num_analog_samples_per_frame: int = 0
    analog_samples: List[np.ndarray] = dataclasses.field(
        default_factory=list
    )  # per channel, (num_samples,) int16
    num_force_plate_samples_per_frame: int = 0
    plate_cop_torque_force: List[np.ndarray] = dataclasses.field(
        default_factory=list
    )  # per plate, (num_samples, 9) float


@dataclasses.dataclass
class CortexFrameOfData:
    """One mocap frame (CortexStreaming.hpp:94-110)."""

    cortex_frame_number: int = 0
    body_data: List[CortexBodyData] = dataclasses.field(
        default_factory=list
    )
    unidentified_markers: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3))
    )
    analog_data: CortexAnalogData = dataclasses.field(
        default_factory=CortexAnalogData
    )
    cortex_tag: int = 0
    camera_to_host_delay_seconds: float = 0.0


# ---------------------------------------------------------------------------
# Codec
# ---------------------------------------------------------------------------


def _header(command: int, payload: bytes) -> bytes:
    """sPacket header: uint16 iCommand + uint16 nBytes, both LE
    (cortex_intern.h:70-71; x86 struct layout, no padding before the
    union)."""
    return struct.pack("<HH", command, len(payload)) + payload


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\0"


def _read_cstr(buf: bytes, i: int) -> Tuple[str, int]:
    end = buf.index(b"\0", i)
    return buf[i:end].decode("utf-8", errors="replace"), end + 1


def _me_payload(name: str) -> bytes:
    """sMe: char szName[128] + unsigned char Version[4]
    (cortex_intern.h:62-66)."""
    return name.encode("utf-8")[:127].ljust(128, b"\0") + VERSION_NUMBER


def encode_hello_world(name: str = "ClientTest") -> bytes:
    """createHelloWorldPacket (CortexStreaming.cpp:447-462)."""
    return _header(PKT2_HELLO_WORLD, _me_payload(name))


def encode_here_i_am(name: str = "MockServer") -> bytes:
    """createHereIAmPacket (CortexStreaming.cpp:466-480)."""
    return _header(PKT2_HERE_I_AM, _me_payload(name))


def encode_request_bodydefs() -> bytes:
    """createRequestBodyDefsPacket (CortexStreaming.cpp:484-496)."""
    return _header(PKT2_REQUEST_BODYDEFS, b"")


def encode_request_frame() -> bytes:
    """createRequestFramePacket (CortexStreaming.cpp:500-512)."""
    return _header(PKT2_REQUEST_FRAME, b"")


def encode_bodydefs(defs: CortexBodyDefs) -> bytes:
    """createBodyDefsPacket (CortexStreaming.cpp:516-611)."""
    out = bytearray()
    out += struct.pack("<i", len(defs.body_defs))
    for bd in defs.body_defs:
        out += _cstr(bd.name)
        out += struct.pack("<i", len(bd.marker_names))
        for m in bd.marker_names:
            out += _cstr(m)
        out += struct.pack("<i", len(bd.segment_names))
        for s, p in zip(bd.segment_names, bd.segment_parents):
            out += _cstr(s)
            out += struct.pack("<i", p)
        out += struct.pack("<i", len(bd.dof_names))
        for d in bd.dof_names:
            out += _cstr(d)
    out += struct.pack("<i", len(defs.analog_channel_names))
    for c in defs.analog_channel_names:
        out += _cstr(c)
    out += struct.pack("<i", defs.num_force_plates)
    return _header(PKT2_BODYDEFS, bytes(out))


def encode_frame_of_data(frame: CortexFrameOfData) -> bytes:
    """createFrameOfDataPacket (CortexStreaming.cpp:615-802)."""
    out = bytearray()
    out += struct.pack("<i", frame.cortex_frame_number)
    out += struct.pack("<i", len(frame.body_data))
    for bd in frame.body_data:
        out += _cstr(bd.name)
        mk = np.asarray(bd.markers, dtype=np.float64).reshape(-1, 3)
        out += struct.pack("<i", mk.shape[0])
        mk = np.where(np.isnan(mk), XEMPTY, mk)
        out += mk.astype("<f4").tobytes()
        out += struct.pack("<i", 0)  # segments: the reference writes 0
        dofs = np.asarray(bd.dofs, dtype=np.float64).reshape(-1)
        out += struct.pack("<i", dofs.size)
        out += dofs.astype("<f4").tobytes()
    um = np.asarray(
        frame.unidentified_markers, dtype=np.float64
    ).reshape(-1, 3)
    out += struct.pack("<i", um.shape[0])
    out += np.where(np.isnan(um), XEMPTY, um).astype("<f4").tobytes()
    ad = frame.analog_data
    out += struct.pack("<i", len(ad.analog_samples))
    out += struct.pack("<i", ad.num_analog_samples_per_frame)
    for ch in ad.analog_samples:
        out += (
            np.asarray(ch)
            .reshape(-1)[: ad.num_analog_samples_per_frame]
            .astype("<i2")
            .tobytes()
        )
    plates = ad.plate_cop_torque_force
    out += struct.pack("<i", len(plates))
    ns = ad.num_force_plate_samples_per_frame
    out += struct.pack("<i", ns)
    # Sample-major, per plate: cop(3f), force(3f), moment_z — rows are
    # 9-col [cop, moment, force] (CortexStreaming.cpp:738-786).
    for s in range(ns):
        for p in plates:
            row = np.asarray(p, dtype=np.float64).reshape(-1, 9)[s]
            vals = np.concatenate([row[0:3], row[6:9], row[5:6]])
            out += vals.astype("<f4").tobytes()
    out += struct.pack("<i", frame.cortex_tag)
    out += struct.pack("<f", frame.camera_to_host_delay_seconds)
    return _header(PKT2_FRAME_OF_DATA, bytes(out))


def parse_packet(data: bytes) -> Tuple[int, bytes]:
    """Split a raw UDP datagram into (iCommand, payload)."""
    if len(data) < 4:
        raise ValueError("Cortex packet shorter than its 4-byte header")
    command, nbytes = struct.unpack_from("<HH", data, 0)
    return command, data[4 : 4 + nbytes]


def parse_me(payload: bytes) -> Tuple[str, bytes]:
    """sMe payload -> (name, version[4])."""
    name = payload[:128].split(b"\0", 1)[0].decode(errors="replace")
    return name, payload[128:132]


def parse_bodydefs(payload: bytes) -> CortexBodyDefs:
    """parseBodyDefs + parseBodyDef + parseAnalogDefs
    (CortexStreaming.cpp:1053-1246)."""
    out = CortexBodyDefs()
    i = 0
    (n_bodies,) = struct.unpack_from("<i", payload, i)
    i += 4
    for _ in range(n_bodies):
        bd = CortexBodyDef(name="")
        bd.name, i = _read_cstr(payload, i)
        (nm,) = struct.unpack_from("<i", payload, i)
        i += 4
        for _ in range(nm):
            s, i = _read_cstr(payload, i)
            bd.marker_names.append(s)
        (nseg,) = struct.unpack_from("<i", payload, i)
        i += 4
        for _ in range(nseg):
            s, i = _read_cstr(payload, i)
            bd.segment_names.append(s)
            (p,) = struct.unpack_from("<i", payload, i)
            i += 4
            bd.segment_parents.append(p)
        (nd,) = struct.unpack_from("<i", payload, i)
        i += 4
        for _ in range(nd):
            s, i = _read_cstr(payload, i)
            bd.dof_names.append(s)
        out.body_defs.append(bd)
    (nch,) = struct.unpack_from("<i", payload, i)
    i += 4
    for _ in range(nch):
        s, i = _read_cstr(payload, i)
        out.analog_channel_names.append(s)
    (out.num_force_plates,) = struct.unpack_from("<i", payload, i)
    return out


def parse_frame_of_data(
    payload: bytes, body_defs: Optional[CortexBodyDefs] = None
) -> CortexFrameOfData:
    """parseFrameOfData + parseBodyData + parseAnalogData
    (CortexStreaming.cpp:1330-1695). Marker names come from the session's
    body defs when available, else "MKR_<i>" (cpp:1540-1548)."""
    frame = CortexFrameOfData()
    i = 0
    (frame.cortex_frame_number,) = struct.unpack_from("<i", payload, i)
    i += 4
    (n_bodies,) = struct.unpack_from("<i", payload, i)
    i += 4
    for ib in range(n_bodies):
        name, i = _read_cstr(payload, i)
        (nm,) = struct.unpack_from("<i", payload, i)
        i += 4
        mk = (
            np.frombuffer(payload, dtype="<f4", count=3 * nm, offset=i)
            .reshape(nm, 3)
            .astype(np.float64)
        )
        i += 12 * nm
        mk = np.where(mk[:, :1] == XEMPTY, np.nan, mk)
        names = [f"MKR_{k}" for k in range(nm)]
        if body_defs is not None and ib < len(body_defs.body_defs):
            ref = body_defs.body_defs[ib].marker_names
            names = [
                ref[k] if k < len(ref) else names[k] for k in range(nm)
            ]
        (nseg,) = struct.unpack_from("<i", payload, i)
        i += 4
        # tSegmentData = double[7]; the reference skips segments
        # (CortexStreaming.cpp:1563-1571).
        i += nseg * 7 * 8
        (nd,) = struct.unpack_from("<i", payload, i)
        i += 4
        dofs = np.frombuffer(
            payload, dtype="<f4", count=nd, offset=i
        ).astype(np.float64)
        i += 4 * nd
        frame.body_data.append(
            CortexBodyData(
                name=name, markers=mk, marker_names=names, dofs=dofs
            )
        )
    (num,) = struct.unpack_from("<i", payload, i)
    i += 4
    um = (
        np.frombuffer(payload, dtype="<f4", count=3 * num, offset=i)
        .reshape(num, 3)
        .astype(np.float64)
    )
    i += 12 * num
    frame.unidentified_markers = np.where(
        um[:, :1] == XEMPTY, np.nan, um
    ) if num else um
    ad = frame.analog_data
    (nch,) = struct.unpack_from("<i", payload, i)
    i += 4
    (ns,) = struct.unpack_from("<i", payload, i)
    i += 4
    ad.num_analog_samples_per_frame = ns
    for _ in range(nch):
        ad.analog_samples.append(
            np.frombuffer(payload, dtype="<i2", count=ns, offset=i).astype(
                np.int64
            )
        )
        i += 2 * ns
    (nplates,) = struct.unpack_from("<i", payload, i)
    i += 4
    (nfs,) = struct.unpack_from("<i", payload, i)
    i += 4
    ad.num_force_plate_samples_per_frame = nfs
    ad.plate_cop_torque_force = [np.zeros((nfs, 9)) for _ in range(nplates)]
    for s in range(nfs):
        for p in range(nplates):
            raw = np.frombuffer(payload, dtype="<f4", count=7, offset=i)
            i += 28
            ad.plate_cop_torque_force[p][s, 0:3] = raw[0:3]  # cop
            ad.plate_cop_torque_force[p][s, 5] = raw[6]  # moment z
            ad.plate_cop_torque_force[p][s, 6:9] = raw[3:6]  # force
    (frame.cortex_tag,) = struct.unpack_from("<i", payload, i)
    i += 4
    (frame.camera_to_host_delay_seconds,) = struct.unpack_from(
        "<f", payload, i
    )
    return frame


# ---------------------------------------------------------------------------
# Transport: client + mock server (loopback-capable)
# ---------------------------------------------------------------------------


class CortexClient:
    """Receives Cortex frames over UDP and dispatches them to a handler.

    Reference parity: CortexStreaming::connect/initialize/setFrameHandler
    (CortexStreaming.cpp:200-290, 821-900). The handler receives
    (marker_names, markers (M, 3), plate_cop_torque_force) aggregated
    over all bodies + unidentified markers, exactly like the reference's
    parseAndHandleFrameOfData (cpp:1250-1290)."""

    def __init__(self, host: str = "127.0.0.1", data_port: int = 1001,
                 requests_port: int = 1510):
        self.host = host
        self.data_port = data_port
        self.requests_port = requests_port
        self.body_defs: Optional[CortexBodyDefs] = None
        self._handler: Optional[Callable] = None
        self._sock: Optional[socket.socket] = None
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self.frames_received = 0

    def set_frame_handler(self, handler: Callable) -> None:
        self._handler = handler

    setFrameHandler = set_frame_handler

    def handle_datagram(self, data: bytes) -> None:
        """Feed one raw packet (live socket or replayed fixture)."""
        command, payload = parse_packet(data)
        if command == PKT2_BODYDEFS:
            self.body_defs = parse_bodydefs(payload)
        elif command == PKT2_FRAME_OF_DATA:
            frame = parse_frame_of_data(payload, self.body_defs)
            self.frames_received += 1
            if self._handler is not None:
                names: List[str] = []
                pts: List[np.ndarray] = []
                for bd in frame.body_data:
                    names += bd.marker_names
                    pts.append(bd.markers)
                if len(frame.unidentified_markers):
                    names += [
                        f"UNIDENTIFIED_{k}"
                        for k in range(len(frame.unidentified_markers))
                    ]
                    pts.append(frame.unidentified_markers)
                markers = (
                    np.concatenate(pts, axis=0)
                    if pts
                    else np.zeros((0, 3))
                )
                self._handler(
                    names, markers,
                    frame.analog_data.plate_cop_torque_force,
                )

    def initialize(self) -> None:
        """Request the body defs + one frame over the requests port."""
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
            s.settimeout(2.0)
            addr = (self.host, self.requests_port)
            s.sendto(encode_hello_world(), addr)
            cmd, payload = parse_packet(s.recvfrom(0x10010)[0])
            assert cmd == PKT2_HERE_I_AM, cmd
            self.server_name = parse_me(payload)[0]
            s.sendto(encode_request_bodydefs(), addr)
            self.handle_datagram(s.recvfrom(0x10010)[0])
            s.sendto(encode_request_frame(), addr)
            self.handle_datagram(s.recvfrom(0x10010)[0])

    def connect(self) -> None:
        """Listen for frame datagrams on the data port."""
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((self.host, self.data_port))
        self.data_port = self._sock.getsockname()[1]
        self._sock.settimeout(0.2)
        self._running = True

        def loop():
            while self._running:
                try:
                    data, _ = self._sock.recvfrom(0x10010)
                except socket.timeout:
                    continue
                except OSError:
                    break
                try:
                    self.handle_datagram(data)
                except Exception:
                    pass

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def disconnect(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        if self._sock is not None:
            self._sock.close()


class CortexMockServer:
    """The reference's mock Cortex API server (startMockServer /
    mockServerParseCortexPacket, CortexStreaming.cpp:330-1049): answers
    HELLO_WORLD with HERE_I_AM, REQUEST_BODYDEFS with BODYDEFS,
    REQUEST_FRAME with FRAME_OF_DATA, and can push frames to a data
    port (the multicast analog, loopback-unicast here)."""

    def __init__(self, host: str = "127.0.0.1", requests_port: int = 0):
        self.host = host
        self.body_defs = CortexBodyDefs()
        self.frame = CortexFrameOfData()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, requests_port))
        self.requests_port = self._sock.getsockname()[1]
        self._sock.settimeout(0.2)
        self._running = False
        self._thread: Optional[threading.Thread] = None

    def mock_server_set_data(
        self, marker_names, markers, cop_torque_forces,
        body_name: str = "Subject",
    ) -> None:
        """mockServerSetData parity (CortexStreaming.cpp:150-190): one
        body holding the given labeled markers + plate data."""
        self.body_defs = CortexBodyDefs(
            body_defs=[
                CortexBodyDef(
                    name=body_name, marker_names=list(marker_names)
                )
            ],
            num_force_plates=len(cop_torque_forces),
        )
        self.frame = CortexFrameOfData(
            body_data=[
                CortexBodyData(
                    name=body_name,
                    markers=np.asarray(markers, dtype=np.float64),
                    marker_names=list(marker_names),
                )
            ],
            analog_data=CortexAnalogData(
                num_force_plate_samples_per_frame=(
                    np.asarray(cop_torque_forces[0]).reshape(-1, 9).shape[0]
                    if len(cop_torque_forces)
                    else 0
                ),
                plate_cop_torque_force=[
                    np.asarray(p, dtype=np.float64).reshape(-1, 9)
                    for p in cop_torque_forces
                ],
            ),
        )

    mockServerSetData = mock_server_set_data

    def start(self) -> None:
        self._running = True

        def loop():
            while self._running:
                try:
                    data, addr = self._sock.recvfrom(0x10010)
                except socket.timeout:
                    continue
                except OSError:
                    break
                try:
                    cmd, _ = parse_packet(data)
                except ValueError:
                    continue
                if cmd == PKT2_HELLO_WORLD:
                    self._sock.sendto(encode_here_i_am(), addr)
                elif cmd == PKT2_REQUEST_BODYDEFS:
                    self._sock.sendto(
                        encode_bodydefs(self.body_defs), addr
                    )
                elif cmd == PKT2_REQUEST_FRAME:
                    self._sock.sendto(
                        encode_frame_of_data(self.frame), addr
                    )

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    startMockServer = start

    def send_frame_to(self, host: str, port: int) -> None:
        """mockServerSendFrameMulticast parity (cpp:940-979) — unicast to
        the client's data socket (no multicast routing needed on
        loopback)."""
        self._sock.sendto(encode_frame_of_data(self.frame), (host, port))

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        self._sock.close()
