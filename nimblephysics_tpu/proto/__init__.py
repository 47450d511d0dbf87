"""Wire schemas (proto3) for reference-compatible remoting.

Message/field layout matches the reference's dart/proto/*.proto (field
numbers are the wire contract — same technique as biomechanics/b3d_writer
and server/gui_proto). Compiled at first use with protoc into a
descriptor set; message classes come from the official protobuf runtime.
"""

import os

PROTO_DIR = os.path.dirname(os.path.abspath(__file__))
