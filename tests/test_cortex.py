"""Motion Analysis Cortex SDK wire protocol (VERDICT r3 #9).

Reference: dart/biomechanics/CortexStreaming.{hpp,cpp} + the packet
layout of dart/external/cortex/cortex_intern.h — byte-level codec
round-trips, the mock-server request/response flow over real loopback
UDP, and StreamingIK consuming REPLAYED Cortex packets.
"""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from nimblephysics_tpu.biomechanics.cortex import (
    PKT2_BODYDEFS,
    PKT2_FRAME_OF_DATA,
    PKT2_HELLO_WORLD,
    PKT2_HERE_I_AM,
    CortexAnalogData,
    CortexBodyData,
    CortexBodyDef,
    CortexBodyDefs,
    CortexClient,
    CortexFrameOfData,
    CortexMockServer,
    encode_bodydefs,
    encode_frame_of_data,
    encode_hello_world,
    parse_bodydefs,
    parse_frame_of_data,
    parse_me,
    parse_packet,
)


def _defs():
    return CortexBodyDefs(
        body_defs=[
            CortexBodyDef(
                name="Subject01",
                marker_names=["LASI", "RASI", "C7"],
                segment_names=["pelvis", "torso"],
                segment_parents=[-1, 0],
                dof_names=["pelvis_tx", "pelvis_ty"],
            ),
            CortexBodyDef(name="Wand", marker_names=["W1"]),
        ],
        analog_channel_names=["EMG1", "EMG2"],
        num_force_plates=2,
    )


def _frame():
    rng = np.random.RandomState(0)
    markers = rng.randn(3, 3)
    markers[1] = np.nan  # dropped marker -> XEMPTY on the wire
    plates = [rng.randn(4, 9), rng.randn(4, 9)]
    # Only cop (0:3), moment-z (5), force (6:9) survive the 7-float wire
    # format; zero the rest so round-trip compares exactly.
    for p in plates:
        p[:, 3:5] = 0.0
    return CortexFrameOfData(
        cortex_frame_number=1234,
        body_data=[
            CortexBodyData(
                name="Subject01",
                markers=markers,
                marker_names=["LASI", "RASI", "C7"],
                dofs=np.array([0.25, -0.5], dtype=np.float64),
            )
        ],
        unidentified_markers=rng.randn(2, 3),
        analog_data=CortexAnalogData(
            num_analog_samples_per_frame=5,
            analog_samples=[
                rng.randint(-500, 500, 5),
                rng.randint(-500, 500, 5),
            ],
            num_force_plate_samples_per_frame=4,
            plate_cop_torque_force=plates,
        ),
        cortex_tag=7,
        camera_to_host_delay_seconds=0.0125,
    )


def test_bodydefs_roundtrip():
    pkt = encode_bodydefs(_defs())
    cmd, payload = parse_packet(pkt)
    assert cmd == PKT2_BODYDEFS
    out = parse_bodydefs(payload)
    assert [b.name for b in out.body_defs] == ["Subject01", "Wand"]
    assert out.body_defs[0].marker_names == ["LASI", "RASI", "C7"]
    assert out.body_defs[0].segment_names == ["pelvis", "torso"]
    assert out.body_defs[0].segment_parents == [-1, 0]
    assert out.body_defs[0].dof_names == ["pelvis_tx", "pelvis_ty"]
    assert out.analog_channel_names == ["EMG1", "EMG2"]
    assert out.num_force_plates == 2


def test_frame_of_data_roundtrip():
    f = _frame()
    pkt = encode_frame_of_data(f)
    cmd, payload = parse_packet(pkt)
    assert cmd == PKT2_FRAME_OF_DATA
    out = parse_frame_of_data(payload, _defs())
    assert out.cortex_frame_number == 1234
    bd = out.body_data[0]
    assert bd.name == "Subject01"
    assert bd.marker_names == ["LASI", "RASI", "C7"]
    # NaN markers travel as XEMPTY and come back as NaN.
    assert np.isnan(bd.markers[1]).all()
    np.testing.assert_allclose(
        bd.markers[[0, 2]], f.body_data[0].markers[[0, 2]], atol=1e-6
    )
    np.testing.assert_allclose(bd.dofs, [0.25, -0.5], atol=1e-7)
    np.testing.assert_allclose(
        out.unidentified_markers, f.unidentified_markers, atol=1e-6
    )
    ad = out.analog_data
    assert ad.num_analog_samples_per_frame == 5
    for got, want in zip(ad.analog_samples, f.analog_data.analog_samples):
        np.testing.assert_array_equal(got, want)
    assert ad.num_force_plate_samples_per_frame == 4
    for got, want in zip(
        ad.plate_cop_torque_force, f.analog_data.plate_cop_torque_force
    ):
        np.testing.assert_allclose(got, want, atol=1e-5)
    assert out.cortex_tag == 7
    assert out.camera_to_host_delay_seconds == pytest.approx(
        0.0125, abs=1e-6
    )


def test_hello_world_packet_layout():
    """Header layout pinned byte-for-byte: uint16 LE command, uint16 LE
    nBytes, sMe = 128-byte name + 4-byte version (cortex_intern.h)."""
    pkt = encode_hello_world("ClientTest")
    assert pkt[0:2] == bytes((PKT2_HELLO_WORLD, 0))
    assert int.from_bytes(pkt[2:4], "little") == 132
    assert len(pkt) == 4 + 132
    assert pkt[4:14] == b"ClientTest"
    assert pkt[132:136] == bytes((4, 1, 12, 0))  # VERSION_NUMBER
    name, version = parse_me(pkt[4:])
    assert name == "ClientTest" and version == bytes((4, 1, 12, 0))


def test_mock_server_loopback():
    """Full SDK flow over real UDP: HELLO_WORLD -> HERE_I_AM,
    REQUEST_BODYDEFS -> BODYDEFS, REQUEST_FRAME -> FRAME_OF_DATA, then
    pushed data frames on the client's data socket
    (CortexStreaming::initialize + connect parity)."""
    server = CortexMockServer()
    rng = np.random.RandomState(1)
    names = ["A", "B", "C", "D"]
    markers = rng.randn(4, 3)
    plates = [np.zeros((1, 9))]
    server.mock_server_set_data(names, markers, plates)
    server.start()

    got = []
    client = CortexClient(
        data_port=0, requests_port=server.requests_port
    )
    client.set_frame_handler(
        lambda n, m, p: got.append((list(n), np.array(m)))
    )
    try:
        client.initialize()
        assert client.server_name == "MockServer"
        assert client.body_defs is not None
        assert client.body_defs.body_defs[0].marker_names == names
        assert len(got) == 1  # the initialize() frame request
        client.connect()
        for _ in range(3):
            server.send_frame_to("127.0.0.1", client.data_port)
        deadline = time.time() + 5
        while len(got) < 4 and time.time() < deadline:
            time.sleep(0.02)
    finally:
        client.disconnect()
        server.stop()
    assert len(got) >= 4
    frame_names, frame_markers = got[-1]
    assert frame_names == names
    np.testing.assert_allclose(frame_markers, markers, atol=1e-6)


def test_streaming_ik_consumes_replayed_cortex_packets():
    """VERDICT r3 #9 'done' criterion: StreamingIK consumes replayed
    Cortex packets. A recorded packet stream (BODYDEFS + FRAME_OF_DATA
    datagrams, encoded by the mock-side codec exactly as Cortex would
    emit them) is replayed through CortexClient.handle_datagram into
    StreamingMocapLab's IK, which recovers the true pose."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_biomech_pipeline import _marker_chain

    from nimblephysics_tpu.biomechanics.scaled_fk import (
        marker_table,
        marker_world_positions,
    )
    from nimblephysics_tpu.biomechanics.streaming import StreamingMocapLab

    sk = _marker_chain()
    names, bodies, offsets, _ = marker_table(sk)
    q_true = np.asarray([0.2, 0.1, -0.1, 0.15, 0.05, 0.1])[: sk.num_dofs]
    mk = np.asarray(
        marker_world_positions(
            sk, jnp.asarray(q_true), bodies, jnp.asarray(offsets)
        )
    )

    # "Record" a packet stream: one BODYDEFS broadcast + 6 data frames.
    recorded = [
        encode_bodydefs(
            CortexBodyDefs(
                body_defs=[
                    CortexBodyDef(name="Chain", marker_names=list(names))
                ]
            )
        )
    ]
    for t in range(6):
        recorded.append(
            encode_frame_of_data(
                CortexFrameOfData(
                    cortex_frame_number=t,
                    body_data=[
                        CortexBodyData(
                            name="Chain", markers=mk,
                            marker_names=list(names),
                        )
                    ],
                )
            )
        )

    lab = StreamingMocapLab(sk, gn_steps=4)
    poses = []
    lab.ik.register_pose_listener(lambda t, q: poses.append(q.copy()))
    client = lab.listen_to_cortex(data_port=None)  # replay mode
    try:
        for pkt in recorded:
            client.handle_datagram(pkt)
        deadline = time.time() + 30
        while lab.ik.frames_solved < 6 and time.time() < deadline:
            time.sleep(0.05)
    finally:
        lab.stop()
    assert client.frames_received == 6
    assert lab.ik.frames_solved >= 6
    assert np.abs(poses[-1] - q_true).max() < 0.05
