"""Visualization server (reference: dart/server, SURVEY.md 2.7)."""

from nimblephysics_tpu.server.gui_server import GUIRecording, NimbleGUI
from nimblephysics_tpu.server.offline_renderer import OfflineRenderer
from nimblephysics_tpu.server.state_machine import GUIStateMachine
from nimblephysics_tpu.server.websocket_server import GUIWebsocketServer
